package graft.util

/** The one keying helper for every planted write-once layout under
  * tmp (bucketed tables, media BLOBs, format twins, backfill events,
  * navgraph, snapshot tables): 4-byte MD5 hex of a key string. The
  * key must include EVERYTHING the layout's bytes depend on — the
  * sfDir always, plus an algorithm/parameter version token whenever
  * the layout is derived (not copied) data, so that changing the
  * derivation re-keys the layout instead of silently reusing a stale
  * one (the navgraph one-round/two-round incident this helper was
  * hoisted for). Previously four private copies; a keying-scheme
  * change now has one home.
  */
object Digests {
  def short(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
}

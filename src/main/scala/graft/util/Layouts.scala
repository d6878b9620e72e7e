package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for WRITE-ONCE derived layouts under tmp (the
  * navgraph / curation-flags cost model: an artifact that is a
  * deterministic function of a corpus is built once and amortized over
  * every query).
  *
  * Two disciplines, both learned the hard way:
  *
  *  - **Corpus-stamped keys** ([[tableStamp]]): a layout keyed on the
  *    source DIRECTORY alone serves STALE bytes after the corpus is
  *    rewritten in place (OrganicGen/ScaleStress rebuild fixture dirs
  *    under the same path as a matter of course — the round-14 BPE
  *    memo incident, re-flagged for the flags layout in round 17).
  *    The stamp is one driver-side listStatus of the table's parquet
  *    directory (name + byte length + mtime per file), so ANY rewrite
  *    re-keys the layout. Metadata-sized, no Spark job.
  *  - **Staged-then-rename publish** ([[writeOnce]]): two JVMs (the
  *    bench host + a verify twin) racing `write.mode(overwrite)` into
  *    the SAME layout path can tear each other's files mid-read. Each
  *    builder stages under a unique hidden sibling and RENAMES into
  *    place — the rename is the commit point; losers delete their
  *    stage and read the winner's layout (the builds are
  *    deterministic, so any winner is byte-equivalent).
  */
object Layouts {

  /** Cheap corpus fingerprint of `dir/table.parquet`: the file listing
    * (name, byte length, modification time), order-normalized. Usable
    * without a SparkSession (the layout-key call sites predate one). */
  def tableStamp(dir: String, table: String): String = {
    val p = new Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) s"$dir#absent"
    else fs.listStatus(p).toSeq
      .map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(s"$dir#", ";", "")
  }

  /** Build-if-absent with an atomic publish: if `root/_SUCCESS` is
    * missing, materialize `build` under a unique staged sibling and
    * rename it into place; always return a reader over `root`. A torn
    * previous write (dir present, no _SUCCESS) is swept before the
    * rename; a lost race discards the stage and reads the winner. */
  def writeOnce(s: SparkSession, rootDir: String)
      (build: => DataFrame): DataFrame = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val ok = new Path(root, "_SUCCESS")
    if (!fs.exists(ok)) {
      val stage = new Path(root.getParent,
        s".${root.getName}.stage-${java.util.UUID.randomUUID()}")
      build.write.mode("overwrite").parquet(stage.toString)
      if (fs.exists(ok)) fs.delete(stage, true)
      else {
        if (fs.exists(root)) fs.delete(root, true)
        if (!fs.rename(stage, root)) fs.delete(stage, true)
      }
    }
    s.read.parquet(root.toString)
  }
}

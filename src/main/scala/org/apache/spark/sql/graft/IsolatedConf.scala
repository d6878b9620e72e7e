// Hosted under org.apache.spark.sql because cloneSession() and
// Dataset.ofRows are private[sql] — the standard packaging pattern for
// third-party session plumbing (same as the native expressions here).
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Conf-isolated subcomputation support for the iterative engines.
  *
  * The propagation loop ([[graft.dedup.DedupQueries.componentLabelsOf]])
  * compiles its per-batch plans under a narrowed shuffle width with AQE
  * off — the right conf for dup-graph-sized frames, the WRONG conf for
  * any other query that happens to be compiling on the same session at
  * the same time. Mutating the shared session conf (the pre-round-10
  * implementation, set + finally-restore) leaks that window to
  * concurrent callers: two queries on one session are a normal serving
  * pattern, and a plain aggregate compiled inside the window silently
  * loses AQE and its configured width.
  *
  * The fix: run the loop on a CLONED session. `cloneSession()` shares
  * the SparkContext, cache manager and catalog (cached/checkpointed
  * blocks and temp views stay visible) but deep-copies the session
  * state, so conf mutations on the clone are invisible to the original.
  * Plans transfer between sessions by re-rooting the analyzed logical
  * plan — leaves (file relations, LogicalRDD from localCheckpoint) are
  * session-agnostic, so this is metadata-only, never a data copy.
  */
object IsolatedConf {

  /** A clone of `df`'s session with `confs` applied on top of the
    * copied session conf. Mutations on the clone never surface on the
    * original session.
    *
    * Clones are cached PER THREAD per caller session (weakly keyed, so
    * a stopped session's clone is collectable): cloning rebuilds the
    * session state (~150 ms of analyzer/catalog re-init measured on
    * the loop family), which would tax every propagation-loop call —
    * and a thread-local clone is exactly as isolated as a fresh one,
    * because a thread runs one loop at a time (the concurrent-caller
    * hazard this object exists to prevent is CROSS-thread). `confs`
    * are re-applied on every fetch, so per-call values (the measured
    * loop width) always win over a previous call's. */
  // The VALUE is held through a WeakReference: a clone strongly
  // references its parent (parentSessionState), so a strong value
  // would pin the weak KEY forever (the classic WeakHashMap
  // value→key leak) and stopped sessions would never collect. A
  // cleared reference just costs one re-clone.
  private val cache = ThreadLocal.withInitial[
    java.util.WeakHashMap[SparkSession, java.lang.ref.WeakReference[SparkSession]]](
    () => new java.util.WeakHashMap())

  def sessionFor(
      df: DataFrame,
      confs: Map[String, String]): org.apache.spark.sql.SparkSession = {
    val caller = df.sparkSession.asInstanceOf[SparkSession]
    val perThread = cache.get()
    var s = Option(perThread.get(caller)).map(_.get).orNull
    if (s == null) {
      s = caller.cloneSession()
      perThread.put(caller, new java.lang.ref.WeakReference(s))
    }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Re-root `df`'s analyzed plan in `session`, so operators composed
    * on the result compile under THAT session's conf. */
  def reRoot(
      session: org.apache.spark.sql.SparkSession, df: DataFrame): DataFrame =
    Dataset.ofRows(
      session.asInstanceOf[SparkSession], df.queryExecution.analyzed)
}

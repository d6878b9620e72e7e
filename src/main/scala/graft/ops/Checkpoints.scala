package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage-cut strategy for the iterative/pair machinery, config-gated
  * for fault tolerance.
  *
  * Every propagation loop, pair generator and two-phase packer in this
  * engine cuts lineage between rounds (a must: iterative plans grow
  * exponentially otherwise). `localCheckpoint` is the right local-mode
  * default — no external storage, no replication cost — but its blocks
  * live on the executors that computed them, so losing an executor
  * mid-loop fails the job (fail-loud, not fault-tolerant; documented at
  * [[graft.text.PackSequences]]). On a real cluster, set
  * [[Checkpoints.DirKey]] (`graft.checkpoint.dir`) to a reliable
  * filesystem path (HDFS/object store) and every cut becomes a RELIABLE
  * checkpoint: blocks are written to the shared store and survive
  * executor loss, at the price of one write+read per cut. The default
  * (key unset) preserves local behavior exactly.
  */
object Checkpoints {

  /** Session conf key: when set to a durable filesystem path, lineage
    * cuts use reliable `checkpoint` into that directory instead of
    * executor-local `localCheckpoint`. */
  val DirKey = "graft.checkpoint.dir"

  /** Cut lineage on `ds`. `eager` has `localCheckpoint`'s semantics in
    * both modes: eager cuts materialize now, lazy cuts materialize
    * inside the first consuming job while still cutting lineage. */
  def cut[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val ss = ds.sparkSession
    val dir = ss.conf.get(DirKey, "")
    if (dir.isEmpty) ds.localCheckpoint(eager)
    else {
      val sc = ss.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — set once
      // per session (first configured dir wins; changing the key
      // mid-session is not a supported pattern).
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      ds.checkpoint(eager)
    }
  }

  /** Extension syntax so call sites read like the `localCheckpoint`
    * they replace: `frame.cut()` / `frame.cut(false)`. */
  implicit class CheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cut(eager: Boolean = true): Dataset[T] = Checkpoints.cut(ds, eager)
  }
}

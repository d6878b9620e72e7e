package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Date-range gap replay over [[Sinks.overwritePartitions]] — the
  * operational knob the reference pipeline's `catchup=False`
  * declaration leaves to the operator (bpi_etl_bigquery.py:27-29: an
  * hourly DAG that does NOT backfill missed ticks automatically; when
  * an outage ends, someone replays the hole). This driver makes that
  * replay a convergent operation:
  *
  *  - the PLAN is derived from storage, not from run history: a
  *    partition either exists under the table dir or it doesn't, so
  *    the gap list is one metadata listing (no state file to drift);
  *  - each gap partition is recomputed and landed via dynamic
  *    partition overwrite — the idempotent write. A crash mid-replay
  *    leaves completed partitions in place; the NEXT run's plan
  *    simply no longer contains them, so re-running converges on the
  *    same final table (proved in BackfillSpec with a planted crash);
  *  - late-data corrections use `force`: named partitions are
  *    recomputed even though they exist, swapping exactly those
  *    directories (the [[Sinks.overwritePartitions]] contract).
  *
  * Scale: the driver touches partition METADATA only (one listing +
  * one write per gap); each recompute is whatever the caller's
  * `compute` plan costs, one partition at a time — the shape an
  * hourly 100 TB warehouse replays with (bounded blast radius per
  * partition, no full-table rewrite).
  */
object Backfill {

  /** What a run did: replayed gap partitions (in order), forced
    * recomputes, partitions skipped because they already exist, and
    * expected partitions whose recompute produced zero rows (recorded,
    * NOT written — an empty write cannot "fill" a partition, so these
    * stay on every future plan until data shows up; surfacing them
    * beats silently looping). */
  final case class Report(
      replayed: Seq[String], forced: Seq[String],
      skipped: Seq[String], empty: Seq[String])

  /** Partition values present under `tableDir` for `partitionCol` —
    * one FS listing of `partitionCol=value` child dirs. */
  def existingPartitions(
      spark: SparkSession, tableDir: String,
      partitionCol: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(partitionCol + "="))
      // Directory names carry Spark's partition-path escaping (':' in
      // hour stamps becomes %3A, etc.); the plan compares against RAW
      // values, so unescape — otherwise an escaped partition looks
      // like a permanent gap and is rewritten on every run.
      .map(n => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(n.stripPrefix(partitionCol + "=")))
      .toSet
  }

  /** The replay plan for `expected` over the current table state. */
  def missingPartitions(
      spark: SparkSession, tableDir: String, partitionCol: String,
      expected: Seq[String]): Seq[String] = {
    val have = existingPartitions(spark, tableDir, partitionCol)
    expected.filterNot(have)
  }

  /** Fill every gap in `expected` (and recompute every `force`d
    * partition) by calling `compute(spark, partitionValue)` and
    * landing the result via dynamic partition overwrite.
    *
    * `compute` must return rows belonging to EXACTLY the requested
    * partition (the frame carries `partitionCol`); a frame straying
    * into other partition values is refused before anything writes —
    * dynamic overwrite would otherwise clobber partitions the plan
    * never named. */
  def run(
      spark: SparkSession, tableDir: String, partitionCol: String,
      expected: Seq[String], force: Seq[String] = Nil)(
      compute: (SparkSession, String) => DataFrame): Report = {
    val have = existingPartitions(spark, tableDir, partitionCol)
    val gaps = expected.filterNot(have)
    // A force value that neither exists nor is expected is an operator
    // mistake (typo'd hour, wrong table): surfacing it beats silently
    // dropping an explicit request.
    val unknown = force.filterNot(p => have(p) || expected.contains(p))
    require(unknown.isEmpty,
      s"force partitions ${unknown.mkString(", ")} neither exist under " +
        s"$tableDir nor appear in the expected range — nothing to recompute")
    val forced = force.filter(have)
    var replayed = Vector.empty[String]
    var emptied = Vector.empty[String]
    for (p <- gaps ++ forced) {
      // Pinned: the guard below and the write must see the SAME rows
      // (an unpinned nondeterministic recompute could pass the guard
      // and then write different partitions), and the recompute plan
      // runs once, not once per consumer.
      val df = compute(spark, p).localCheckpoint(true)
      // The guard is one distinct over the recompute (partition-sized).
      val vals = df.select(col(partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq
      require(vals.forall(_ == p),
        s"backfill compute for $partitionCol=$p produced rows for " +
          s"partitions ${vals.filterNot(_ == p).mkString(", ")} — refusing " +
          "to write outside the planned partition")
      if (vals.isEmpty) emptied :+= p
      else {
        Sinks.overwritePartitions(df, tableDir, partitionCol)
        replayed :+= p
      }
    }
    Report(
      replayed = replayed.filterNot(forced.contains),
      forced = replayed.filter(forced.contains),
      skipped = expected.filter(have).filterNot(forced.contains),
      empty = emptied)
  }
}

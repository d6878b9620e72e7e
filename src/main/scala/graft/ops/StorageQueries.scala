package graft.ops

import org.apache.spark.sql.functions._
import graft.util.Det
import graft.{Q, Tables}

/** Storage-layout operators, declared as oracle-checked queries: the
  * two features that matter most at 100 TB — bucket-aligned joins (no
  * shuffle) and partition pruning (no scan) — exercised end-to-end
  * through a real write + read-back, not just a spec.
  *
  * The reference's analog is its BigQuery partitioning/clustering
  * advice (slides p.21): lay data out at write time so the warehouse
  * skips work at read time. Here the engine is the warehouse, so the
  * layout is bucketed managed tables and hive-style date partitions.
  *
  * Layout setup is per-(session, sfDir) and idempotent: the first
  * invocation writes the layout, later ones (e.g. the bench's second
  * pass) only read it — which is the honest cost model, since at scale
  * a layout is written once and amortized over every query against it.
  * Results are layout-independent, so the DuckDB oracle runs the same
  * logical query against the ORIGINAL parquet — proving the relayout
  * changed the plan, not the answer.
  */
object StorageQueries {

  /** Stable per-sfDir suffix so layouts from different scale factors
    * (or test fixtures) never collide in the shared warehouse/tmp. */
  private def digest(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString

  // ---------------------------------------------------------------
  // join_bucketed: lineitem ⋈ orders with both sides bucketed on the
  // join key at write time → sort-merge join with NO Exchange on
  // either side. A Sort remains above each scan on Spark 3+ (one
  // bucket = many files, so sortBy order is per-file, not per-bucket
  // — see bucketedJoin / Bucketing.writeBucketed); eliminating the
  // two Exchanges is what matters at 100 TB, where shuffle of the
  // fact table dominates every recurring large-large join.
  // ---------------------------------------------------------------

  private val Buckets = 16

  /** Create (once) the bucketed twins of lineitem/orders and return
    * their catalog names. */
  private[ops] def bucketedTables(t: Tables): (String, String) = {
    val d = digest(t.sfDir)
    val li = s"graft_bkt_lineitem_$d"
    val os = s"graft_bkt_orders_$d"
    if (!t.spark.catalog.tableExists(li))
      Bucketing.writeBucketed(t.lineitem, li, "l_orderkey", Buckets)
    if (!t.spark.catalog.tableExists(os))
      Bucketing.writeBucketed(t.orders, os, "o_orderkey", Buckets)
    (li, os)
  }

  /** The bucketed join itself, exposed for the plan-shape spec. The
    * merge hint pins sort-merge (at tiny SF the broadcast threshold
    * would otherwise pick BHJ and hide the bucket alignment being
    * demonstrated); with bucket-aligned sides SMJ plans with zero
    * Exchange. A Sort remains above each scan — Spark 3+ no longer
    * propagates the written per-bucket sort order (see
    * [[Bucketing.writeBucketed]]); eliminating the Exchange is the
    * at-scale win being demonstrated. */
  private[ops] def bucketedJoin(t: Tables): org.apache.spark.sql.DataFrame = {
    val (li, os) = bucketedTables(t)
    t.spark.table(li).hint("merge")
      .join(t.spark.table(os), col("l_orderkey") === col("o_orderkey"))
  }

  private val joinBucketed = Q(
    "join_bucketed",
    s"""SELECT o_orderpriority,
       |       count(*) AS n_items,
       |       ${Det.sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    bucketedJoin(Tables(s, dir))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------
  // partition_prune: events re-laid-out as hive-style date partitions
  // (write.partitionBy(event_date)); a query filtering one day shows
  // PartitionFilters in the scan and reads 1/30th of the files. At
  // 100 TB this is the difference between scanning a day and a fleet
  // scanning a history.
  // ---------------------------------------------------------------

  /** Create (once) the date-partitioned twin of events; returns its
    * root path. Existence is checked through the Hadoop FileSystem of
    * the path (not java.io.File), so the layout root could just as well
    * be an hdfs:// or object-store URI — the write and the pruned read
    * already go through the same abstraction. */
  private[ops] def partitionedEvents(t: Tables): String = {
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_part_events_${digest(t.sfDir)}")
    val fs = root.getFileSystem(t.spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      t.events
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
        .write.partitionBy("event_date").mode("overwrite")
        .parquet(root.toString)
    }
    root.toString
  }

  /** The pruned scan, exposed for the plan-shape spec. */
  private[ops] def prunedDay(t: Tables, day: String): org.apache.spark.sql.DataFrame =
    t.spark.read.parquet(partitionedEvents(t))
      .filter(col("event_date") === lit(day))

  private val PruneDay = "2024-01-15"

  private val partitionPrune = Q(
    "partition_prune",
    s"""SELECT event_type,
       |       count(*) AS n_events,
       |       ${Det.sqlDsum("value")} AS sum_value
       |FROM events
       |WHERE strftime(ts, '%Y-%m-%d') = '$PruneDay'
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    prunedDay(Tables(s, dir), PruneDay)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Build both storage layouts if absent (idempotent). Bench calls
    * this in warmup so the one-time layout write — amortized over every
    * later query in a real deployment — is not billed to the first
    * timed run of join_bucketed / partition_prune (round-3 driver bench
    * read 13.9 s for join_bucketed; ~1.3 s of it was the query). */
  def ensureLayouts(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val t = Tables(s, dir)
    bucketedTables(t)
    partitionedEvents(t)
    ()
  }

  val queries: Seq[Q] = Seq(joinBucketed, partitionPrune)
}

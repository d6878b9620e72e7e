package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps
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
  private def digest(dir: String): String = graft.util.Digests.short(dir)

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

  // ---------------------------------------------------------------
  // storage_zorder: Morton (z-order) interleave of two clustering
  // dimensions — THE multi-dimensional layout key. Sorting files by
  // zval keeps BOTH dimensions locally dense, so parquet min/max
  // footer stats prune scans filtered on either column; a plain sort
  // by x clusters x perfectly and leaves y's per-file range at the
  // full domain. The query declares the interleave math (10 bits per
  // dimension, pure integer shifts — bit-identical on any engine);
  // the clustering property itself is asserted by StorageSpec over
  // contiguous z-range chunks.
  // ---------------------------------------------------------------

  /** Morton code of two 10-bit values as a Column — built from
    * shiftleft/shiftright/& only, so it stays inside whole-stage
    * codegen. */
  private[ops] def morton10(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 10).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private val storageZorder = Q(
    "storage_zorder", {
      val zterms = (0 until 10).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CAST(l_partkey % 1024 AS BIGINT) AS x,
         |         CAST(l_suppkey % 1024 AS BIGINT) AS y
         |  FROM lineitem
         |)
         |SELECT l_orderkey, l_linenumber, x, y, CAST($zterms AS BIGINT) AS zval
         |FROM b ORDER BY zval, l_orderkey, l_linenumber""".stripMargin
    }) { (s, dir) =>
    Tables(s, dir).lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 1024).cast("long").as("x"),
        (col("l_suppkey") % 1024).cast("long").as("y"))
      .withColumn("zval", morton10(col("x"), col("y")))
      .orderBy("zval", "l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------
  // table_profile: ANALYZE-style column statistics in ONE fact pass —
  // row count, null count, exact distinct count, and e6-scaled
  // min/max per profiled column, reshaped to one row per column. At
  // 100 TB the distinct counts would switch to HLL sketches
  // (approx_count_distinct) and everything else stays identical; the
  // exact form is declared here because the oracle can replay it.
  // ---------------------------------------------------------------

  private val profiledCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val tableProfile = Q(
    "table_profile",
    profiledCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       CAST(floor(min($c) * 1000000 + 0.5) AS BIGINT) AS min_e6,
         |       CAST(floor(max($c) * 1000000 + 0.5) AS BIGINT) AS max_e6
         |FROM lineitem""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    val aggs = count(lit(1)).as("n") +: profiledCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        floor(min(col(c)) * 1000000 + lit(0.5)).cast("long").as(s"${c}_min"),
        floor(max(col(c)) * 1000000 + lit(0.5)).cast("long").as(s"${c}_max"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(profiledCols.map { c =>
        struct(
          lit(c).as("col_name"), col("n"),
          (col("n") - col(s"${c}_nn")).as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          col(s"${c}_min").as("min_e6"),
          col(s"${c}_max").as("max_e6"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  // ---------------------------------------------------------------
  // csv_roundtrip / orc_roundtrip: source-format fidelity as declared
  // queries. Spark writes the documents table to a CSV / ORC twin
  // (once, idempotent like the other layouts), reads it back through
  // the format's full parse path (CSV with explicit schema + FAILFAST,
  // ORC with its native vectorized reader), and reduces to per-source
  // counts + an md5-derived content checksum. The oracle computes the
  // same aggregates from the ORIGINAL parquet — a hash match proves
  // the format encode→decode roundtrip preserved every row and every
  // text byte, the same construction as the PNG/WAV codec proofs.
  // ---------------------------------------------------------------

  private def formatTwin(t: Tables, fmt: String): String = {
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_${fmt}_documents_${digest(t.sfDir)}")
    val fs = root.getFileSystem(t.spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      val w = t.documents.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w)
        .format(fmt).save(root.toString)
    }
    root.toString
  }

  /** documents schema for the CSV read-back — CSV carries no types, so
    * the scan declares them (FAILFAST: a mis-parse aborts, never
    * silently nulls). */
  private val docsDdl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  private def roundtripAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(graft.util.Hashes.tokHash(col("text"))).cast("long").as("checksum"))
      .orderBy("source")

  private val roundtripOracle: String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(${graft.util.Hashes.sqlTokHash("text")}) AS BIGINT) AS checksum
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  private val csvRoundtrip = Q("csv_roundtrip", roundtripOracle) { (s, dir) =>
    val t = Tables(s, dir)
    roundtripAgg(s.read
      .schema(docsDdl)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(formatTwin(t, "csv")))
  }

  private val orcRoundtrip = Q("orc_roundtrip", roundtripOracle) { (s, dir) =>
    roundtripAgg(s.read.orc(formatTwin(Tables(s, dir), "orc")))
  }

  /** Two-generation parquet layout for [[schemaEvolution]]: generation
    * v1 (even doc_ids) wrote (doc_id, text, source) before a `lang`
    * column existed; generation v2 (odd doc_ids) carries it. Both land
    * under one table root, the standard shape of a long-lived dataset
    * whose schema grew mid-life. Idempotent like the other layouts. */
  private def evolutionTwin(t: Tables): String = {
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_evolution_documents_${digest(t.sfDir)}")
    val fs = root.getFileSystem(t.spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "v2/_SUCCESS"))) {
      t.documents.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("source"))
        .write.mode("overwrite").parquet(s"$root/v1")
      t.documents.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$root/v2")
    }
    root.toString
  }

  /** Schema-evolution read: scan both generations through ONE
    * `mergeSchema` parquet read (v1 rows surface `lang` as NULL) and
    * reduce per source — row counts split by generation, a content
    * checksum over text, and the observed langs of the v2 rows. The
    * oracle recomputes every figure from the ORIGINAL documents table
    * (v1/v2 are deterministic doc_id-parity projections), so a hash
    * match proves the merged scan preserved every row, filled the
    * missing column with NULL exactly where the old generation wrote
    * no such column, and kept v2's values — the roundtrip-proof
    * construction applied to schema drift. At 100 TB this is the
    * default posture: schema changes append new files, readers merge
    * footers; no table rewrite. */
  private val schemaEvolution = Q(
    "schema_evolution",
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN doc_id % 2 = 0 OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1_null_lang,
       |       CAST(sum(${graft.util.Hashes.sqlTokHash("text")}) AS BIGINT) AS checksum,
       |       coalesce(string_agg(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END, ','
       |                           ORDER BY CASE WHEN doc_id % 2 = 1 THEN lang END),
       |                '') AS langs
       |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
    (s, dir) =>
    val root = evolutionTwin(Tables(s, dir))
    val merged = s.read.option("mergeSchema", "true")
      .parquet(s"$root/v1", s"$root/v2")
    merged.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_v1_null_lang"),
        sum(graft.util.Hashes.tokHash(col("text"))).cast("long").as("checksum"),
        coalesce(array_join(sort_array(collect_set(col("lang"))), ","), lit(""))
          .as("langs"))
      .orderBy("source")
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
    formatTwin(t, "csv")
    formatTwin(t, "orc")
    evolutionTwin(t)
    graft.mm.Multimodal.mediaLayout(s, dir)
    ()
  }

  /** The 100-TB form of [[tableProfile]] as declared code, not a
    * comment: the same one-pass reshape with every `countDistinct`
    * swapped for an HLL++ sketch (`approx_count_distinct`, 2% rsd) —
    * the swap documented above made real. The exact twin keeps the
    * oracle; this runs no-oracle with TableProfileHllSpec bounding
    * each estimate against the exact query's `n_distinct`, the
    * `approx_distinct` pattern. One map-side-combining aggregate, no
    * shuffle wider than the sketch bytes per column. */
  private val tableProfileHll = Q.noOracle("table_profile_hll") { (s, dir) =>
    val li = Tables(s, dir).lineitem
    val aggs = count(lit(1)).as("n") +: profiledCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nn"),
        approx_count_distinct(col(c), 0.02).as(s"${c}_nd"),
        floor(min(col(c)) * 1000000 + lit(0.5)).cast("long").as(s"${c}_min"),
        floor(max(col(c)) * 1000000 + lit(0.5)).cast("long").as(s"${c}_max"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(profiledCols.map { c =>
        struct(
          lit(c).as("col_name"), col("n"),
          (col("n") - col(s"${c}_nn")).as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          col(s"${c}_min").as("min_e6"),
          col(s"${c}_max").as("max_e6"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Join-key skew diagnosis — the report a pipeline owner reads
    * BEFORE reaching for [[Salting]] or an AQE skew-join: per analyzed
    * key, cardinality, the heaviest key's row count, and the skew
    * ratio (max/avg) in exact ppm (`max·n_keys·1e6 div n_rows`). One
    * map-side-combining count per key column plus metadata-sized
    * reductions; the hot-key lookup joins the counts frame against
    * its own 1-row max (broadcast), never re-scanning the fact. At
    * 100 TB this is one shuffle of (key, partial count) pairs per
    * analyzed column — the cheapest possible question to ask before
    * an expensive join. */
  private val tableSkewReport = Q(
    "table_skew_report", {
      def part(name: String, table: String, key: String) =
        s"""SELECT '$name' AS key_name, n_rows, n_keys, max_cnt, hot_key,
           |       max_cnt * 1000000 // greatest(n_rows // n_keys, 1) AS skew_ppm
           |FROM (
           |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           |         CAST(count(*) AS BIGINT) AS n_keys,
           |         CAST(max(cnt) AS BIGINT) AS max_cnt,
           |         CAST(min(key) FILTER (cnt = (SELECT max(cnt) FROM (
           |             SELECT count(*) AS cnt FROM $table GROUP BY $key))) AS BIGINT) AS hot_key
           |  FROM (SELECT $key AS key, count(*) AS cnt FROM $table GROUP BY $key))""".stripMargin
      s"""SELECT key_name, n_rows, n_keys, max_cnt, hot_key, skew_ppm FROM (
         |${part("l_partkey", "lineitem", "l_partkey")}
         |UNION ALL
         |${part("o_custkey", "orders", "o_custkey")}
         |) ORDER BY key_name""".stripMargin
    }) { (s, dir) =>
    val t = Tables(s, dir)
    def part(name: String, df: org.apache.spark.sql.DataFrame, key: String) = {
      val cnts = df.groupBy(col(key).as("key"))
        .agg(count(lit(1)).as("cnt"))
        .cut(false) // consumed by the stats agg AND hot-key probe
      val stats = cnts.agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      cnts.crossJoin(broadcast(stats))
        .filter(col("cnt") === col("max_cnt"))
        .agg(
          first(col("n_rows")).as("n_rows"),
          first(col("n_keys")).as("n_keys"),
          first(col("max_cnt")).as("max_cnt"),
          min(col("key")).cast("long").as("hot_key"))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_cnt"),
          col("hot_key"),
          // Staged division (hot-count vs mean-count), never the raw
          // max_cnt*n_keys*1e6 product: that intermediate exceeds int64
          // on large high-cardinality tables (n_rows ~1e9, skew ~1e4 →
          // ~1e19), where Spark ANSI-off wraps silently while DuckDB
          // raises. Staged, the only product is max_cnt*1e6 — safe
          // until a single key holds ~9.2e12 rows. Mirrored verbatim
          // in the oracle so both engines floor identically.
          expr("max_cnt * 1000000 DIV greatest(n_rows DIV n_keys, 1)")
            .as("skew_ppm"))
    }
    part("l_partkey", t.lineitem, "l_partkey")
      .union(part("o_custkey", t.orders, "o_custkey"))
      .orderBy("key_name")
  }

  /** Shuffle-free aggregation on the bucketed layout — the aggregation
    * half of the bucketing story (`join_bucketed` shows the join half):
    * the expensive per-orderkey rollup reads the lineitem twin bucketed
    * on `l_orderkey`, whose HashPartitioning already satisfies the
    * aggregate's clustering requirement, so the ONE corpus-sized
    * aggregation runs with NO Exchange — at 100 TB this turns every
    * recurring per-key rollup on the table's bucket key into a scan +
    * local aggregate. The second groupBy (the lines-per-order
    * histogram, the Q13 tail shape) reorganizes one row per order —
    * already reduced data. PlanShapeSpec pins zero shuffles above the
    * bucketed scan. */
  private val aggBucketed = Q(
    "agg_bucketed",
    """WITH pl AS (
      |  SELECT l_orderkey, count(*) AS n_lines
      |  FROM lineitem GROUP BY l_orderkey
      |)
      |SELECT n_lines, count(*) AS n_orders
      |FROM pl GROUP BY n_lines ORDER BY n_lines""".stripMargin) { (s, dir) =>
    val (li, _) = bucketedTables(Tables(s, dir))
    s.table(li)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("n_lines")
  }

  /** Snapshot-isolated TIME TRAVEL as a declared query — the
    * [[graft.etl.SnapshotTable]] format driven end-to-end through its
    * real commit protocol and checked against a relational oracle. A
    * snapshot table of `orders` is planted once per sfDir with three
    * commits: overwrite(even keys) → append(odd keys) → compact — so
    * its history IS derivable from the source table, and the query
    * reads EVERY snapshot through the pinned-manifest path and
    * aggregates each (row count + cents-exact price sum). The oracle
    * replays the same history relationally: snapshot 0 = the even
    * half, snapshots 1 and 2 = the full table (compaction rewrites
    * files, never rows — the hash match IS the isolation proof, since
    * a torn or mutated snapshot would shift a sum). Scale: each
    * time-travel read is a manifest-pinned scan of exactly that
    * snapshot's files; the plant is write-once and amortized like the
    * other layouts. */
  private val snapshotTimeTravel = Q(
    "snapshot_time_travel", {
      val cents = Det.sqlUnits("o_totalprice", 100L)
      s"""WITH evens AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum($cents) AS BIGINT) AS sum_cents
         |  FROM orders WHERE o_orderkey % 2 = 0
         |), alls AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum($cents) AS BIGINT) AS sum_cents
         |  FROM orders
         |)
         |SELECT CAST(0 AS BIGINT) AS snap_seq, n_rows, sum_cents FROM evens
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), n_rows, sum_cents FROM alls
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), n_rows, sum_cents FROM alls
         |ORDER BY snap_seq""".stripMargin
    }) { (s, dir) =>
    import graft.etl.SnapshotTable
    val t = Tables(s, dir)
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_snaptable_orders_${digest(dir)}").toString
    if (SnapshotTable.snapshots(s, root).length < 3) {
      // Half-planted leftovers (a killed earlier run) re-plant from
      // scratch — the snapshot history must be exactly the 3 commits
      // the oracle replays.
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      SnapshotTable.overwrite(
        t.orders.filter(col("o_orderkey") % 2 === 0), root)
      SnapshotTable.append(
        t.orders.filter(col("o_orderkey") % 2 === 1), root)
      SnapshotTable.compact(s, root, numFiles = 2)
    }
    SnapshotTable.snapshots(s, root).take(3).zipWithIndex
      .map { case (m, i) =>
        SnapshotTable.read(s, root, Some(m.id))
          .agg(count(lit(1)).as("n_rows"),
            sum(Det.toUnits(col("o_totalprice"), 100L)).cast("long")
              .as("sum_cents"))
          .select(lit(i.toLong).as("snap_seq"),
            col("n_rows"), col("sum_cents"))
      }
      .reduce(_.unionByName(_))
      .orderBy("snap_seq")
  }

  /** Compaction plan — the declared form of [[Compaction]]'s decision
    * step: which partitions fold into which rewrite bin. The partition
    * histogram (rows per partition of a planted orderkey % 17 layout)
    * feeds a NEXT-FIT-DECREASING pack: partitions sorted by
    * (size desc, key), bin = prefix-sum-before DIV capacity — whole
    * partitions never split, each bin overfills by at most one
    * partition, and unlike greedy first-fit (inherently sequential)
    * the assignment is ONE window over the metadata-sized histogram,
    * so the plan costs the same at 100 TB where the histogram comes
    * from table file statistics. Oracle replays the identical prefix
    * algebra. */
  private val compactionPlan = Q(
    "compaction_plan",
    """WITH p AS (
      |  SELECT o_orderkey % 17 AS part,
      |         CAST(count(*) AS BIGINT) AS n_rows
      |  FROM orders GROUP BY 1
      |), o AS (
      |  SELECT part, n_rows,
      |         CAST(coalesce(sum(n_rows) OVER (
      |           ORDER BY n_rows DESC, part
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS cum_before
      |  FROM p
      |)
      |SELECT part, n_rows, cum_before,
      |       cum_before // 2000 AS bin
      |FROM o ORDER BY bin, n_rows DESC, part""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("n_rows").desc, col("part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir).orders
      .groupBy((col("o_orderkey") % 17).as("part"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("cum_before",
        coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .select(
        col("part"), col("n_rows"), col("cum_before"),
        expr("cum_before div 2000").as("bin"))
      .orderBy(col("bin"), col("n_rows").desc, col("part"))
  }

  val queries: Seq[Q] =
    Seq(joinBucketed, partitionPrune, storageZorder, tableProfile,
      tableProfileHll, csvRoundtrip, orcRoundtrip, schemaEvolution,
      tableSkewReport, aggBucketed, snapshotTimeTravel, compactionPlan)
}

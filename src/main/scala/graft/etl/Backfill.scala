package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.hadoop.fs.Path

/** Date-range gap replay landing through [[SnapshotTable]] commits —
  * the operational knob the reference pipeline's `catchup=False`
  * declaration leaves to the operator (bpi_etl_bigquery.py:27-29: an
  * hourly DAG that does NOT backfill missed ticks automatically; when
  * an outage ends, someone replays the hole). This driver makes that
  * replay a convergent operation:
  *
  *  - the PLAN is derived from storage, not from run history: a
  *    partition either holds data under the table dir or it doesn't,
  *    so the gap list is one metadata listing (no state file to
  *    drift);
  *  - each gap partition is recomputed and landed as a SNAPSHOT
  *    COMMIT of that partition's own [[SnapshotTable]] (the table is
  *    a directory of per-partition snapshot tables). The earlier
  *    directory-swap landing (dynamic partition overwrite) replaced
  *    files in place, so a reader racing a backfill could read a torn
  *    mix of old and new files — exactly the race the snapshot format
  *    was built to close. A manifest commit is atomic
  *    (create-if-absent) and old files stay until [[SnapshotTable
  *    .expire]], so a racing reader keeps its pinned view
  *    (BackfillSpec plants that reader). A crash mid-replay leaves
  *    completed partitions committed; the NEXT run's plan simply no
  *    longer contains them, so re-running converges on the same final
  *    table;
  *  - late-data corrections use `force`: named partitions are
  *    recomputed even though they exist, published as the partition's
  *    next snapshot — the prior state stays readable through the
  *    grace window (a plain pre-format partition is ADOPTED as
  *    snapshot 0 first, which also keeps its files
  *    manifest-referenced and therefore safe from expire's
  *    unreferenced-file sweep; [[land]] documents the crash states of
  *    the two-commit sequence and [[readTable]] reads every one of
  *    them correctly).
  *
  * Plain (pre-format) partition directories remain first-class: the
  * plan counts them as existing, and [[readTable]] reads them as-is —
  * a table migrates to snapshot isolation one touched partition at a
  * time, never via a stop-the-world rewrite.
  *
  * Scale: the driver touches partition METADATA only (one listing +
  * one manifest read/commit per gap); each recompute is whatever the
  * caller's `compute` plan costs, one partition at a time — the shape
  * an hourly 100 TB warehouse replays with (bounded blast radius per
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

  /** The `partitionCol=value` child dir for a raw partition value,
    * escaped the way Spark's own partitioned writes escape (':' in
    * hour stamps becomes %3A, etc.) so snapshot-landed and
    * directory-swap-landed partitions share one naming scheme. */
  private def partitionDir(
      tableDir: String, partitionCol: String, value: String): String =
    s"$tableDir/$partitionCol=${ExternalCatalogUtils.escapePathName(value)}"

  /** One partition's readable state: its head manifest if a snapshot
    * is committed, else whether plain top-level parquet files (the
    * pre-format layout) are present. A dir holding only torn
    * manifests or stage leftovers has neither: nothing committed
    * means nothing landed. */
  private final case class PartitionState(
      value: String, head: Option[SnapshotTable.Manifest], plain: Boolean) {
    def hasData: Boolean = head.nonEmpty || plain
  }

  /** Top-level parquet files directly under a dir — the plain
    * pre-format layout probe (shared by planning and landing). */
  private def hasPlainFiles(spark: SparkSession, pdir: String): Boolean = {
    val p = new Path(pdir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Every `partitionCol=value` child dir's state, manifests resolved
    * ONCE — planning and reading share this pass, so the per-table
    * metadata cost really is one listing + one manifest read per
    * partition. */
  private def partitionStates(
      spark: SparkSession, tableDir: String,
      partitionCol: String): Seq[PartitionState] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(partitionCol + "="))
      // Dir names carry Spark's partition-path escaping; the plan
      // compares against RAW values, so unescape — otherwise an
      // escaped partition looks like a permanent gap and is rewritten
      // on every run.
      .map(n => ExternalCatalogUtils
        .unescapePathName(n.stripPrefix(partitionCol + "=")))
      .sorted
      .map { v =>
        val pdir = partitionDir(tableDir, partitionCol, v)
        val head = SnapshotTable.currentSnapshot(spark, pdir)
        PartitionState(v, head,
          head.isEmpty && hasPlainFiles(spark, pdir))
      }
  }

  /** Partition values present under `tableDir` for `partitionCol` —
    * one FS listing of `partitionCol=value` child dirs, each checked
    * for committed (or plain pre-format) data. */
  def existingPartitions(
      spark: SparkSession, tableDir: String,
      partitionCol: String): Set[String] =
    partitionStates(spark, tableDir, partitionCol)
      .filter(_.hasData).map(_.value).toSet

  /** The replay plan for `expected` over the current table state. */
  def missingPartitions(
      spark: SparkSession, tableDir: String, partitionCol: String,
      expected: Seq[String]): Seq[String] = {
    val have = existingPartitions(spark, tableDir, partitionCol)
    expected.filterNot(have)
  }

  /** Read the whole table at the snapshots current NOW: each
    * partition resolves its head manifest once (plain pre-format
    * partitions read their files directly, with the partition value
    * attached from the dir name when the files don't carry the
    * column), and the returned plan reads exactly those files — a
    * backfill or compaction committing underneath cannot change or
    * tear the result. Metadata cost: one listing + one manifest read
    * per partition — and ONE scan relation for every snapshot-landed
    * partition: their data files always carry the partition column
    * (the landing writes the guarded compute frame verbatim), so the
    * resolved file lists concatenate into a single multi-path read
    * instead of a per-partition union (which at a 10k-partition
    * warehouse table would be a 10k-relation plan). Only legacy plain
    * partitions, whose files lack the column, read per-partition with
    * the value attached from the dir name. */
  def readTable(
      spark: SparkSession, tableDir: String,
      partitionCol: String): DataFrame = {
    val parts = partitionStates(spark, tableDir, partitionCol)
      .filter(_.hasData)
    require(parts.nonEmpty, s"$tableDir has no partitions to read")
    // Three partition classes, discriminated without opening a single
    // data file:
    //  - STAGED snapshot heads (every manifest entry under _data/):
    //    written from guarded compute frames, so they carry the
    //    partition column — all of them concatenate into ONE
    //    multi-path scan relation;
    //  - ADOPTED snapshot heads (bare top-level names): pre-format
    //    files captured as snapshot 0 whose files lack the column —
    //    read per partition, value attached (the crash-between-adopt-
    //    and-overwrite state reads correctly, and converges when the
    //    operator re-forces);
    //  - PLAIN pre-format partitions (no snapshot): read per
    //    partition via the directory, value attached. Torn staged
    //    files can never leak into this read: _data is
    //    underscore-hidden from directory listings.
    val (staged, attached) = parts.partition(p =>
      p.head.exists(_.files.forall(SnapshotTable.isStagedPath)))
    val snapFiles = staged.flatMap(p => p.head.toSeq.flatMap(_.files
      .map(f => s"${partitionDir(tableDir, partitionCol, p.value)}/$f")))
    val snapFrame =
      if (snapFiles.isEmpty) None
      else Some(spark.read.parquet(snapFiles: _*))
    // Attached partitions take the dir-derived value, CAST to the
    // staged partitions' column type when one exists — a mixed table
    // must not silently widen the partition column to string (and
    // flip type again once the last plain partition migrates). An
    // unparseable value fails LOUD instead of becoming a silent NULL.
    val litType = snapFrame.map(_.schema(partitionCol).dataType)
    val plainFrames = attached.map { p =>
      val pdir = partitionDir(tableDir, partitionCol, p.value)
      val value = litType.map { t =>
        val cast = lit(p.value).cast(t)
        require(!spark.range(1).select(cast).head.isNullAt(0),
          s"partition value '${p.value}' of $pdir does not parse as " +
            s"the table's $partitionCol type $t — refusing to read it " +
            "as NULL")
        cast
      }.getOrElse(lit(p.value))
      val df = p.head match {
        case Some(m) => SnapshotTable.read(spark, pdir, Some(m.id))
        case None => spark.read.parquet(pdir)
      }
      if (df.columns.contains(partitionCol)) df
      else df.withColumn(partitionCol, value)
    }
    val frames = snapFrame.toSeq ++ plainFrames
    // Every surviving partition can hold a committed-but-EMPTY head
    // (files=0 manifests: hasData is true, yet no frame contributes) —
    // a bare reduce would throw empty.reduceLeft. Schema cannot be
    // conjured from zero files, so fail with the state named instead
    // of an unhelpful reduce error.
    require(frames.nonEmpty,
      s"$tableDir: every partition's head snapshot is empty (committed " +
        "manifests listing zero files) — nothing to read; recompute or " +
        "force the partitions to land data")
    frames.reduce(_.unionByName(_))
  }

  /** Land one recomputed partition as a snapshot commit. A plain
    * pre-format partition is first ADOPTED (its current files become
    * snapshot 0 — one metadata commit, zero data movement), so the
    * pre-correction state stays manifest-referenced: pinned-readable
    * through the grace window, and protected from
    * [[SnapshotTable.expire]]'s unreferenced-file sweep until the
    * window passes it by. The two commits are individually atomic but
    * not jointly: a crash BETWEEN them leaves the adopted snapshot as
    * the head — whose files, being pre-format partitioned writes,
    * lack the partition column. [[readTable]] handles exactly that
    * state (adopted heads are identified by their bare manifest paths
    * and read with the dir-derived value attached), and the operator's
    * re-run of the same force converges. A crash BEFORE the overwrite
    * commit on a gap partition leaves only _data orphans, invisible
    * to every reader (underscore-hidden) and swept by expire once the
    * partition has a committed snapshot. */
  private def land(
      df: DataFrame, tableDir: String, partitionCol: String,
      value: String): Unit = {
    val pdir = partitionDir(tableDir, partitionCol, value)
    val spark = df.sparkSession
    if (SnapshotTable.currentSnapshot(spark, pdir).isEmpty &&
        hasPlainFiles(spark, pdir))
      SnapshotTable.adopt(spark, pdir)
    SnapshotTable.overwrite(df, pdir)
  }

  /** Fill every gap in `expected` (and recompute every `force`d
    * partition) by calling `compute(spark, partitionValue)` and
    * landing the result as that partition's next snapshot commit.
    *
    * `compute` must return rows belonging to EXACTLY the requested
    * partition (the frame carries `partitionCol`); a frame straying
    * into other partition values is refused before anything writes —
    * a stray frame would otherwise silently land foreign rows inside
    * a partition the plan never named. */
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
        land(df, tableDir, partitionCol, p)
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

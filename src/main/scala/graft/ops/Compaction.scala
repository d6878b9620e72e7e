package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for partitioned parquet tables — the
  * maintenance job every long-lived 100 TB table needs: streaming
  * appends and fine-grained partitioning accumulate files far below the
  * row-group sweet spot, and scan cost becomes file-open cost (driver
  * listing, footer reads, task-per-file scheduling) instead of byte
  * cost. The reference's analog is BigQuery doing this invisibly after
  * WRITE_APPEND loads; engine-side it must be explicit.
  *
  * All listing/rename/delete goes through `org.apache.hadoop.fs.
  * FileSystem` resolved from the session's Hadoop conf, so the same
  * code runs against file://, hdfs://, or an object store — where a
  * 100 TB table actually lives. (Object-store caveat: rename is a
  * copy+delete on S3-style stores and atomic only per object; a
  * production deployment there would commit via a manifest/table format
  * instead. The staging protocol below keeps the data safe either way —
  * see the crash-window notes.)
  *
  * Per partition directory: if it holds more than `targetFiles` data
  * files, rewrite it to exactly `targetFiles` via a coalesce(n) write to
  * a dot-prefixed sibling staging dir (invisible to parquet readers),
  * then swap via two renames. Partitions already compact are left
  * byte-identical (no rewrite amplification). Content is preserved
  * exactly — compaction only changes file boundaries.
  *
  * Crash safety: a crash between the two renames leaves the partition's
  * data only in `.old-<part>` (readers see the partition missing, never
  * half-written). [[recoverStaging]] — run automatically at the start of
  * every compaction — repairs that window: an orphaned `.old-` dir whose
  * partition is missing is renamed back; stale `.old-`/`.compact-` dirs
  * whose partition exists are discarded (they are, respectively, an
  * already-swapped original and a restartable rewrite).
  */
object Compaction {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(fs: FileSystem, dir: Path): Array[Path] =
    fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)

  private val StagePrefix = ".compact-"
  private val OldPrefix = ".old-"

  /** Repair staging state left by a crashed compaction (idempotent). */
  private[ops] def recoverStaging(hfs: FileSystem, root: Path): Unit = {
    if (!hfs.exists(root)) return
    hfs.listStatus(root).map(_.getPath).foreach { p =>
      if (p.getName.startsWith(OldPrefix)) {
        val orig = new Path(root, p.getName.stripPrefix(OldPrefix))
        if (!hfs.exists(orig)) {
          // Crashed between the two renames: the .old- dir IS the data.
          require(hfs.rename(p, orig), s"could not recover ${p.getName}")
        } else {
          // Crashed after the swap, before cleanup: stale original.
          hfs.delete(p, true)
        }
      } else if (p.getName.startsWith(StagePrefix)) {
        // A half-written (or fully written but unswapped) rewrite; the
        // original partition still has the data — restart from scratch.
        hfs.delete(p, true)
      }
    }
  }

  /** Compact every `key=value` partition under `root`. Returns the
    * number of partitions rewritten.
    *
    * Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS of the
    * partitions being rewritten. The two-rename swap is crash-safe for
    * the writer (recoverStaging reconstructs either way) but leaves a
    * window where a reader listing the root sees the partition absent
    * and silently returns partial results. Serving readers during
    * compaction requires a manifest/table-format commit (Iceberg/Delta
    * style) instead of directory renames — the same caveat as the
    * object-store note above. */
  def compactPartitions(
      spark: SparkSession, root: String, targetFiles: Int = 1): Int = {
    val rootPath = new Path(root)
    val hfs = fs(spark, rootPath)
    // A not-yet-written table is vacuously compact (callers monitor
    // roots before first load) — never a listing error.
    if (!hfs.exists(rootPath)) return 0
    recoverStaging(hfs, rootPath)
    val parts = hfs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath)
    var rewritten = 0
    parts.foreach { p =>
      if (dataFiles(hfs, p).length > targetFiles) {
        val tmp = new Path(rootPath, s"$StagePrefix${p.getName}")
        spark.read.parquet(p.toString)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = new Path(rootPath, s"$OldPrefix${p.getName}")
        require(hfs.rename(p, old), s"could not stage ${p.getName}")
        require(hfs.rename(tmp, p), s"could not swap ${p.getName}")
        hfs.delete(old, true)
        rewritten += 1
      }
    }
    // The relation-handle cache resolves a path's file listing eagerly;
    // rewritten partitions would serve stale (now-deleted) splits.
    if (rewritten > 0) graft.Tables.invalidate()
    rewritten
  }

  /** File count per partition (audit surface for specs/monitoring). */
  def fileCounts(spark: SparkSession, root: String): Map[String, Int] = {
    val rootPath = new Path(root)
    val hfs = fs(spark, rootPath)
    if (!hfs.exists(rootPath)) return Map.empty
    hfs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(st => st.getPath.getName -> dataFiles(hfs, st.getPath).length)
      .toMap
  }
}

package graft.ops

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
  * Per partition directory: if it holds more than `targetFiles` data
  * files, rewrite it to exactly `targetFiles` via a coalesce(n) write to
  * a sibling temp dir, then atomically swap. Partitions already compact
  * are left byte-identical (no rewrite amplification). Content is
  * preserved exactly — compaction only changes file boundaries.
  */
object Compaction {

  private def dataFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Compact every `key=value` partition under `root`. Returns the
    * number of partitions rewritten. */
  def compactPartitions(
      spark: SparkSession, root: String, targetFiles: Int = 1): Int = {
    val rootDir = new java.io.File(root)
    val parts = Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("="))
    var rewritten = 0
    parts.foreach { p =>
      if (dataFiles(p).length > targetFiles) {
        val tmp = new java.io.File(rootDir, s".compact-${p.getName}")
        spark.read.parquet(p.getAbsolutePath)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
        // Atomic-enough swap on a real object store this would be a
        // rename-then-delete manifest commit; locally: replace the dir.
        val old = new java.io.File(rootDir, s".old-${p.getName}")
        require(p.renameTo(old), s"could not stage ${p.getName}")
        require(tmp.renameTo(p), s"could not swap ${p.getName}")
        delete(old)
        rewritten += 1
      }
    }
    rewritten
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(delete)
    f.delete(): Unit
  }

  /** File count per partition (audit surface for specs/monitoring). */
  def fileCounts(root: String): Map[String, Int] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("="))
      .map(d => d.getName -> dataFiles(d).length)
      .toMap
}

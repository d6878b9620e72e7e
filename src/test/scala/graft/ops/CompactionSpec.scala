package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction contract: file counts drop to the target, content is
  * exactly preserved, already-compact partitions are not rewritten. */
class CompactionSpec extends SparkSpec {

  test("compacts fragmented partitions, preserves content, skips compact ones") {
    import spark.implicits._
    val root = tmpDir("compact") + "/t"
    // day=a fragmented into 8 files; day=b already a single file.
    (1 to 80).map(i => (i.toLong, "a")).toDF("v", "day")
      .repartition(8).write.partitionBy("day").mode("overwrite").parquet(root)
    (81 to 90).map(i => (i.toLong, "b")).toDF("v", "day")
      .coalesce(1).write.partitionBy("day").mode("append").parquet(root)

    val before = Compaction.fileCounts(spark, root)
    assert(before("day=a") == 8 && before("day=b") == 1)
    val bSig = new java.io.File(s"$root/day=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toSeq

    val rewritten = Compaction.compactPartitions(spark, root, targetFiles = 1)
    assert(rewritten == 1)
    val after = Compaction.fileCounts(spark, root)
    assert(after("day=a") == 1 && after("day=b") == 1)
    // Untouched partition is byte-identical; compacted one preserves rows.
    val bAfter = new java.io.File(s"$root/day=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toSeq
    assert(bAfter == bSig)
    val rows = spark.read.parquet(root)
    assert(rows.count() == 90)
    assert(rows.agg(sum("v")).head().getLong(0) == (1L to 90L).sum)
  }

  test("recovers crashed staging state: orphaned .old- restored, stale dirs discarded") {
    import spark.implicits._
    val root = tmpDir("compact-crash") + "/t"
    (1 to 40).map(i => (i.toLong, "a")).toDF("v", "day")
      .repartition(4).write.partitionBy("day").mode("overwrite").parquet(root)
    (41 to 50).map(i => (i.toLong, "b")).toDF("v", "day")
      .coalesce(1).write.partitionBy("day").mode("append").parquet(root)

    val rootDir = new java.io.File(root)
    // Simulate a crash between the two swap renames: day=a exists only
    // as .old-day=a, with a fully-written .compact-day=a beside it.
    assert(new java.io.File(rootDir, "day=a")
      .renameTo(new java.io.File(rootDir, ".old-day=a")))
    new java.io.File(rootDir, ".compact-day=a").mkdirs()
    // And a stale original left after a swap that crashed pre-cleanup.
    new java.io.File(rootDir, ".old-day=b").mkdirs()

    // Recovery runs implicitly; day=a (4 files) is then re-compacted.
    val rewritten = Compaction.compactPartitions(spark, root, targetFiles = 1)
    assert(rewritten == 1)
    assert(rootDir.listFiles().forall(f =>
      !f.getName.startsWith(".old-") && !f.getName.startsWith(".compact-")))
    val rows = spark.read.parquet(root)
    assert(rows.count() == 50)
    assert(rows.agg(sum("v")).head().getLong(0) == (1L to 50L).sum)
  }
}

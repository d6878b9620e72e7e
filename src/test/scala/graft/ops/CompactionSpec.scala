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

    val before = Compaction.fileCounts(root)
    assert(before("day=a") == 8 && before("day=b") == 1)
    val bSig = new java.io.File(s"$root/day=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toSeq

    val rewritten = Compaction.compactPartitions(spark, root, targetFiles = 1)
    assert(rewritten == 1)
    val after = Compaction.fileCounts(root)
    assert(after("day=a") == 1 && after("day=b") == 1)
    // Untouched partition is byte-identical; compacted one preserves rows.
    val bAfter = new java.io.File(s"$root/day=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toSeq
    assert(bAfter == bSig)
    val rows = spark.read.parquet(root)
    assert(rows.count() == 90)
    assert(rows.agg(sum("v")).head().getLong(0) == (1L to 90L).sum)
  }
}

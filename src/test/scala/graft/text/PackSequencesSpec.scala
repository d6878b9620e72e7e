package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared `pack_sequences` runs the two-phase prefix-sum packer
  * (fully parallel); this spec proves it row-identical to the obvious
  * single-task-per-split windowed form — the independent reference
  * implementation kept HERE, not in the engine — and does so for ANY
  * partition count, since the base-offset correction makes the result
  * independent of where range boundaries fall. It also pins the plan:
  * the declared query must never regress to a Window over `split`
  * (3 distinct values = 3 tasks at 100 TB). */
class PackSequencesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val SeqLen = 2048

  private def docsWithSplit = {
    val bucket = pmod(
      graft.util.Hashes.tokHash(col("doc_id").cast("string")), lit(100L))
    graft.Tables(spark, sf).documents.select(
      col("doc_id"),
      when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
  }

  /** Reference: the textbook ordered-window prefix sum. Correct at any
    * scale DuckDB reaches; the funnel it creates at cluster scale is
    * exactly why the engine declares the two-phase form instead. */
  private def windowedReference = {
    val w = Window.partitionBy(col("split")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsWithSplit
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"), col("split"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / SeqLen).cast("long").as("seq_first"),
        floor((col("start_offset") + col("n_tokens") - 1) / SeqLen)
          .cast("long").as("seq_last"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
  }

  test("two-phase packer equals the windowed reference at several partition counts") {
    val expected = windowedReference
    for (p <- Seq(1, 7, 32)) {
      val got = PackSequences.twoPhase(spark, docsWithSplit, SeqLen, p)
        .select("doc_id", "split", "n_tokens", "start_offset",
          "seq_first", "seq_last")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == expected, s"two-phase (p=$p) diverged from windowed reference")
    }
  }

  test("declared pack_sequences equals the windowed reference") {
    val got = SparkEntry.queries("pack_sequences")(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == windowedReference)
  }

  test("declared pack_sequences plans no Window node") {
    val plan = SparkEntry.queries("pack_sequences")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"pack_sequences regressed to a windowed plan:\n$plan")
  }
}

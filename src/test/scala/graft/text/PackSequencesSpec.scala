package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The two-phase prefix-sum packer must equal the declared windowed
  * query row-for-row — and must do so for ANY partition count, since
  * the base-offset correction makes the result independent of where
  * range boundaries fall. */
class PackSequencesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def windowed = SparkEntry.queries("pack_sequences")(spark, sf)
    .orderBy("doc_id").collect().map(_.toSeq).toSeq

  private def docsWithSplit = {
    val bucket = pmod(
      graft.util.Hashes.tokHash(col("doc_id").cast("string")), lit(100L))
    graft.Tables(spark, sf).documents.select(
      col("doc_id"),
      when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
  }

  test("two-phase packer equals the windowed query at several partition counts") {
    val expected = windowed
    for (p <- Seq(1, 7, 32)) {
      val got = PackSequences.twoPhase(spark, docsWithSplit, 2048, p)
        .select("doc_id", "split", "n_tokens", "start_offset",
          "seq_first", "seq_last")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == expected, s"two-phase (p=$p) diverged from windowed")
    }
  }
}

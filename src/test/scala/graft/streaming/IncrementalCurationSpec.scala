package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming curation: the 3-epoch funnel (summed partials + read-time
  * stage-6 fold) must equal the batch `corpus_curation_pipeline` on
  * the union corpus BIT FOR BIT, and the standing survivor set must
  * equal the batch survivor frame — under range epochs (the loop's
  * insert-only monotone-id contract) and frozen standing planes.
  * Plus: replays no-op, epoch gaps refuse. */
class IncrementalCurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("3-epoch standing funnel and survivors are bit-equal to the " +
      "batch pipeline on the union corpus; replay no-ops; gaps refuse") {
    val docs = Tables(spark, sf).documents
    val scratch = tmpDir("curation-loop")
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    // Frozen standing planes, seeded from the union corpus exactly as
    // production trains them upstream of the gate.
    IncrementalQuality.processBatch(
      docs, s"$scratch/qcounts", s"$scratch/qscores", 0L)
    IncrementalCuration.seedVerdicts(docs, s"$scratch/dver")
    for (b <- 0L to 2L) {
      val lo = (maxId + 1) * b / 3
      val hi = if (b == 2L) maxId + 1 else (maxId + 1) * (b + 1) / 3
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      IncrementalDedup.processBatch(
        batch.select("doc_id", "text"),
        s"$scratch/index", s"$scratch/pairs", b)
      IncrementalCuration.processBatch(
        batch, s"$scratch/urls", s"$scratch/a5", s"$scratch/funnel",
        s"$scratch/qcounts", s"$scratch/dver", b)
    }
    val standing = IncrementalCuration.standingFunnel(
      spark, s"$scratch/funnel", s"$scratch/a5", s"$scratch/pairs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batchFunnel = SparkEntry
      .queries("corpus_curation_pipeline")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(standing == batchFunnel,
      s"standing funnel drifted from batch:\n$standing\nvs\n$batchFunnel")
    val standingSurv = IncrementalCuration
      .standingSurvivors(spark, s"$scratch/a5", s"$scratch/pairs")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("tk"))).toSet
    val batchSurv = graft.text.CurationQueries.survivorsFrame(
      spark, sf, graft.text.CurationQueries.flagsFrame(spark, sf))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("tk"))).toSet
    assert(standingSurv == batchSurv,
      "standing survivor set drifted from the batch pipeline")
    // Replay of the last epoch: no state table grows.
    val before = Seq("urls", "a5", "funnel")
      .map(t => readStateTable(s"$scratch/$t").count())
    val lo2 = (maxId + 1) * 2 / 3
    IncrementalCuration.processBatch(
      docs.filter(col("doc_id") >= lo2), s"$scratch/urls",
      s"$scratch/a5", s"$scratch/funnel", s"$scratch/qcounts",
      s"$scratch/dver", 2L)
    val after = Seq("urls", "a5", "funnel")
      .map(t => readStateTable(s"$scratch/$t").count())
    assert(before == after, s"replay must no-op: $before -> $after")
    // An epoch gap refuses loud.
    val ex = intercept[IllegalArgumentException] {
      IncrementalCuration.processBatch(
        docs.limit(5), s"$scratch/urls", s"$scratch/a5",
        s"$scratch/funnel", s"$scratch/qcounts", s"$scratch/dver", 7L)
    }
    assert(ex.getMessage.contains("epoch gap"))
  }

  test("a canonical-URL duplicate arriving in a LATER epoch is gated " +
      "out by the standing URL table (first-seen-wins)") {
    import spark.implicits._
    val scratch = tmpDir("curation-url")
    // Find a real colliding canonical URL in the corpus and land its
    // min-id doc in epoch 0, a later duplicate in epoch 1 — the
    // standing URL table must gate the second one out.
    val docs = Tables(spark, sf).documents
    IncrementalQuality.processBatch(
      docs, s"$scratch/qcounts", s"$scratch/qscores", 0L)
    IncrementalCuration.seedVerdicts(docs, s"$scratch/dver")
    val urls = graft.text.CurationQueries.narrowFlags(docs)
      .select(col("doc_id"), col("canonical_url"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val dupUrl = urls.groupBy(_._2).values.filter(_.length > 1)
      .maxBy(_.length).sortBy(_._1)
    assert(dupUrl.length > 1, "fixture needs a colliding canonical URL")
    val first = dupUrl.head._1
    val later = dupUrl.last._1
    IncrementalCuration.processBatch(
      docs.filter(col("doc_id") === first), s"$scratch/urls",
      s"$scratch/a5", s"$scratch/funnel", s"$scratch/qcounts",
      s"$scratch/dver", 0L)
    IncrementalCuration.processBatch(
      docs.filter(col("doc_id") === later), s"$scratch/urls",
      s"$scratch/a5", s"$scratch/funnel", s"$scratch/qcounts",
      s"$scratch/dver", 1L)
    val partials = readStateTable(s"$scratch/funnel")
      .orderBy("batch_id").collect()
    assert(partials(0).getAs[Long]("n1") == 1L,
      "the first-seen doc must pass the URL gate")
    assert(partials(1).getAs[Long]("n1") == 0L,
      "a later-epoch canonical duplicate must be gated out")
  }
}

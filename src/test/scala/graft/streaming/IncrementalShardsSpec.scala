package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming training shards: the N-epoch standing manifest (frozen
  * rates plane, epoch-local pack shifted onto standing split tails)
  * must be BIT-EQUAL to the batch `training_shards` on the union
  * corpus under the monotone-id contract, and the standing accounting
  * to `training_shards_accounting`. Plus replay no-op and epoch-gap
  * refusal. */
class IncrementalShardsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("3-epoch standing shards and accounting are bit-equal to the " +
      "batch queries on the union corpus; replay no-ops; gaps refuse " +
      "(r17 verdict missing item 3)") {
    val docs = Tables(spark, sf).documents
    val scratch = tmpDir("shards-loop")
    val (ratesDir, shardsDir) = (s"$scratch/rates", s"$scratch/shards")
    val surv = graft.text.CurationQueries.survivorsFrame(
      spark, sf, graft.text.CurationQueries.flagsFrame(spark, sf))
    // The rates plane is refreshed on its own cadence; the equality
    // pin is taken at the aligned point (rates derived from the same
    // curated corpus the batch chain sees).
    IncrementalShards.refreshRates(surv, ratesDir)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    for (b <- 0L to 2L) {
      val lo = (maxId + 1) * b / 3
      val hi = if (b == 2L) maxId + 1 else (maxId + 1) * (b + 1) / 3
      IncrementalShards.processBatch(
        surv.filter(col("doc_id") >= lo && col("doc_id") < hi),
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        ratesDir, shardsDir, b)
    }
    val standing = IncrementalShards.standingShards(spark, shardsDir)
      .orderBy("doc_id").collect().map(_.toSeq.toVector.toSeq).toSeq
    val batch = SparkEntry.queries("training_shards")(spark, sf)
      .collect().map(_.toSeq.toVector.toSeq).toSeq
    assert(standing == batch,
      s"standing manifest drifted from batch training_shards " +
        s"(${standing.length} vs ${batch.length} rows)")
    val standingAcct = IncrementalShards
      .standingAccounting(spark, ratesDir, shardsDir)
      .orderBy("source", "split")
      .collect().map(_.toSeq.toVector.toSeq).toSeq
    val batchAcct = SparkEntry
      .queries("training_shards_accounting")(spark, sf)
      .collect().map(_.toSeq.toVector.toSeq).toSeq
    assert(standingAcct == batchAcct,
      "standing accounting drifted from batch training_shards_accounting")
    // Replay no-op.
    val before = readStateTable(shardsDir).count()
    val lo2 = (maxId + 1) * 2 / 3
    IncrementalShards.processBatch(
      surv.filter(col("doc_id") >= lo2),
      docs.filter(col("doc_id") >= lo2), ratesDir, shardsDir, 2L)
    assert(readStateTable(shardsDir).count() == before,
      "a replayed epoch must not append shard rows")
    // Gap refusal.
    val ex = intercept[IllegalArgumentException] {
      IncrementalShards.processBatch(
        surv.limit(5), docs.limit(5), ratesDir, shardsDir, 9L)
    }
    assert(ex.getMessage.contains("epoch gap"))
  }

  test("each epoch packs onto the standing split tails: offsets tile " +
      "every split contiguously from zero across epoch boundaries") {
    val docs = Tables(spark, sf).documents
    val scratch = tmpDir("shards-tails")
    val (ratesDir, shardsDir) = (s"$scratch/rates", s"$scratch/shards")
    val surv = graft.text.CurationQueries.survivorsFrame(
      spark, sf, graft.text.CurationQueries.flagsFrame(spark, sf))
    IncrementalShards.refreshRates(surv, ratesDir)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    for (b <- 0L to 2L) {
      val lo = (maxId + 1) * b / 3
      val hi = if (b == 2L) maxId + 1 else (maxId + 1) * (b + 1) / 3
      IncrementalShards.processBatch(
        surv.filter(col("doc_id") >= lo && col("doc_id") < hi),
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        ratesDir, shardsDir, b)
    }
    IncrementalShards.standingShards(spark, shardsDir).collect()
      .groupBy(_.getAs[String]("split")).foreach { case (split, rows) =>
        var off = 0L
        rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("start_offset") == off,
            s"$split doc ${r.getAs[Long]("doc_id")} offset gap")
          val n = r.getAs[Long]("n_tokens")
          assert(r.getAs[Long]("seq_first") == off / 2048)
          assert(r.getAs[Long]("seq_last") == (off + n - 1) / 2048)
          off += n
        }
      }
  }
}

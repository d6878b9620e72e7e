package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The training-shard composition's contract: the accounting's curated
  * baseline is bit-equal to `corpus_curation_accounting` (the funnel
  * reconciliation), the temperature gate flattens heads (rates
  * anti-monotone in curated tokens, never above 1e6), every manifest
  * doc is a hash-gated curated survivor with the leakage-safe split of
  * its near-dup component, and the packed offsets tile each split
  * contiguously from zero. */
class TrainingShardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("accounting: curated baseline bit-equal to the curation " +
      "accounting; rates capped and anti-monotone in source size") {
    val acct = SparkEntry.queries("training_shards_accounting")(spark, sf)
      .collect()
    val curated = acct.map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("curated_docs"), r.getAs[Long]("curated_tokens"),
        r.getAs[Long]("rate_e6")))).toMap
    val funnelAcct = SparkEntry
      .queries("corpus_curation_accounting")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(curated.keySet == funnelAcct.keySet,
      "accounting must cover exactly the curated sources")
    curated.foreach { case (src, (d, t, _)) =>
      assert((d, t) == funnelAcct(src),
        s"$src curated baseline drifted from the curation accounting")
    }
    // Temperature flattening: a bigger source never keeps at a HIGHER
    // rate than a smaller one, and every rate is a valid e6 fraction.
    val bySize = curated.values.toSeq.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Seq((_, tA, rA), (_, tB, rB)) if tA < tB =>
        assert(rA >= rB, s"rate must fall with source size: " +
          s"$tA tokens at $rA vs $tB tokens at $rB")
      case _ =>
    }
    curated.values.foreach { case (_, _, r) =>
      assert(r > 0L && r <= 1000000L, s"rate_e6 $r outside (0, 1e6]")
    }
    // The kept bill never exceeds the curated baseline, and a source
    // whose docs ALL failed the gate still bills a zero row (split
    // 'none') — the provenance covers every curated source.
    acct.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val keptDocs = rows.map(_.getAs[Long]("n_docs")).sum
      val keptWs = rows.map(_.getAs[Long]("n_tokens_ws")).sum
      assert(keptDocs <= curated(src)._1 && keptWs <= curated(src)._2,
        s"$src kept more than it curated")
      if (keptDocs == 0L) {
        assert(rows.length == 1 &&
          rows.head.getAs[String]("split") == "none" &&
          rows.head.getAs[Long]("n_tokens_bpe") == 0L,
          s"$src zero-kept row malformed")
      }
    }
  }

  test("manifest: hash-gated curated survivors only, leakage-safe " +
      "splits, offsets tile each split contiguously from zero") {
    val manifest = SparkEntry.queries("training_shards")(spark, sf)
      .collect()
    val surv = CurationQueries.survivorsFrame(
      spark, sf, CurationQueries.flagsFrame(spark, sf))
      .select(col("doc_id"), col("source"), col("component"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[String]("source"),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(manifest.nonEmpty, "the mixture gate must keep some docs")
    assert(manifest.length < surv.size,
      "the half-budget mixture must drop part of the curated corpus")
    // Every manifest doc is a curated survivor, and its split is the
    // hash rule applied to its component representative (leakage-safe
    // by construction — split_assign_dedup's rule).
    val splitOfDf = spark.range(0, 1).sparkSession
    manifest.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(surv.contains(id), s"doc $id in shards but not curated")
    }
    import spark.implicits._
    val expSplit = manifest.map(_.getAs[Long]("doc_id")).toSeq
      .map(id => id -> surv(id)._2.getOrElse(id))
      .toDF("doc_id", "rep")
      .select(col("doc_id"), graft.util.Hashes.splitOf(col("rep"))
        .as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    manifest.foreach { r =>
      assert(r.getAs[String]("split")
        == expSplit(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} split is not the component rule")
    }
    // Packing: within each split, doc_id order, contiguous offsets
    // from zero, and the sequence span arithmetic.
    manifest.groupBy(_.getAs[String]("split")).foreach {
      case (split, rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
        var off = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("start_offset") == off,
            s"$split doc ${r.getAs[Long]("doc_id")} offset gap")
          val n = r.getAs[Long]("n_tokens")
          assert(r.getAs[Long]("seq_first") == off / 2048)
          assert(r.getAs[Long]("seq_last") == (off + n - 1) / 2048)
          off += n
        }
    }
    // The manifest reconciles with the accounting's doc total.
    val billed = SparkEntry
      .queries("training_shards_accounting")(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(manifest.length.toLong == billed,
      s"manifest ${manifest.length} != accounting $billed")
  }

  test("materializeTrainingShards lands split-partitioned payloads " +
      "with a reconciling accounting as provenance") {
    val out = tmpDir("shards-out")
    val n = graft.etl.Sinks.materializeTrainingShards(spark, sf, out)
    val manifest = SparkEntry.queries("training_shards")(spark, sf)
    assert(n == manifest.count())
    val shards = spark.read.parquet(s"$out/shards")
    assert(shards.columns.toSet == Set("doc_id", "text", "source",
      "split", "n_tokens", "start_offset", "seq_first", "seq_last"))
    // Split partitioning: a trainer reads exactly its split's dir.
    val splits = shards.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    splits.foreach(s =>
      assert(new java.io.File(s"$out/shards/split=$s").isDirectory))
    val acct = spark.read.parquet(s"$out/_accounting")
    assert(acct.agg(sum(col("n_docs"))).collect()(0).getLong(0) == n)
  }
}

package graft.sim

import graft.{SparkSpec, SparkEntry}

/** Behavioral tests for similarity search: the probe vector must rank
  * itself first with cosine 1.0; the LSH bucket must contain the probe;
  * ANN results must be a subset of the brute-force ranking's candidate
  * universe with consistent scores. */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k ranks the probe vector first at cosine 1.0") {
    val rows = SparkEntry.queries("similarity_topk")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Long]("sim_e6") == 1000000L)
    // Scores are non-increasing (top-k really is ordered)
    val sims = rows.map(_.getAs[Long]("sim_e6")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("LSH ANN returns the probe's bucket, probe included, scores matching brute force") {
    val ann = SparkEntry.queries("similarity_ann_lsh")(spark, sf).collect()
    assert(ann.nonEmpty)
    assert(ann.map(_.getAs[Long]("vec_id")).contains(0L))
    assert(ann.map(_.getAs[Long]("bucket")).distinct.length == 1)
    val brute = SparkEntry.queries("similarity_topk")(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sim_e6")).toMap
    ann.foreach { r =>
      brute.get(r.getAs[Long]("vec_id"))
        .foreach(s => assert(s == r.getAs[Long]("sim_e6")))
    }
  }

  test("near-dup pairs are symmetric-free (a < b) and above threshold") {
    val rows = SparkEntry.queries("embedding_near_dup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Long]("sim_e6") >= 150000L)
    }
  }

  test("int8 top-k: probe ranks first, high recall vs the exact top-k") {
    val exact = SparkEntry.queries("similarity_topk")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val coarse = SparkEntry.queries("similarity_topk_int8")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id"))
    // The probe is its own nearest neighbor even after quantization.
    assert(coarse.head == SparkEntry.queries("similarity_topk")(spark, sf)
      .collect().head.getAs[Long]("vec_id"))
    // int8 scores are ~2 decimal digits of the f32 dot: recall@20
    // should stay high (≥ 60% overlap on the tiny sf0.001 corpus).
    val overlap = coarse.count(exact.contains)
    assert(overlap >= (exact.size * 6) / 10,
      s"int8 recall too low: $overlap of ${exact.size}")
  }
}

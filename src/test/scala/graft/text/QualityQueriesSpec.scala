package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioral invariants for the trained quality classifier — the
  * semantics the DuckDB oracle (which replays the training algebra
  * bit-for-bit) cannot express: that the model actually LEARNS the
  * planted rule, that the signal lands where the feature hashing says
  * it must, and that the selected operating point obeys its argmax
  * contract. */
class QualityQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("quality_train: 65-row model; the planted function words carry " +
      "the two most negative weights in their pinned hash buckets") {
    val m = SparkEntry.queries("quality_train")(spark, sf).collect()
    assert(m.length == 65, "64 buckets + the prior row")
    assert(m.map(_.getAs[Long]("bucket")).toSeq ==
      (-1L to 63L), "full bucket domain, prior at -1, ordered")
    // md5-hash placement: 'a' -> bucket 57, 'the' -> bucket 45. The
    // planted rule penalizes exactly those tokens, so NB training must
    // put the corpus's most negative LLR weights there.
    val w = m.filter(_.getAs[Long]("bucket") >= 0)
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w_fx")).toMap
    val twoLowest = w.toSeq.sortBy(_._2).take(2).map(_._1).toSet
    assert(twoLowest == Set(57L, 45L),
      s"function-word buckets must carry the most negative weights: $w")
    // Good docs are token-poorer in function words, token-richer in
    // everything else: the non-signal weights sit above the signal
    // ones and length-compensate (the fixed-point resolution the
    // whole-bit quantization lacked).
    assert(w(57L) < -300 && w(45L) < -300,
      "signal weights must be clearly negative (sub -0.3 bit)")
  }

  test("quality_score: the trained scorer recovers the planted rule " +
      "well above chance, on held-out splits too") {
    val s = SparkEntry.queries("quality_score")(spark, sf)
    val acc = s.agg(
      avg((col("label") === col("pred")).cast("double")).as("acc"))
      .head.getDouble(0)
    assert(acc > 0.75, s"MAP accuracy $acc — the planted rule is " +
      "learnable (sf0.001 measured 0.81); at chance the training " +
      "algebra regressed")
    // Scores must separate the classes in the mean — the planted
    // signal direction, not an artifact of one threshold.
    val bycls = s.groupBy(col("label"))
      .agg(avg(col("score_fx")).as("mu")).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("mu")).toMap
    assert(bycls(1L) > bycls(0L),
      s"good docs must score higher on average: $bycls")
  }

  test("quality_threshold_select: exactly one chosen row, at the " +
      "max-F1 (min-tau tie-break) operating point") {
    val rows = SparkEntry.queries("quality_threshold_select")(spark, sf)
      .collect()
    assert(rows.length <= 17 && rows.nonEmpty)
    val chosen = rows.filter(_.getAs[Long]("chosen") == 1L)
    assert(chosen.length == 1, "exactly one operating point is chosen")
    val bestF1 = rows.map(_.getAs[Long]("f1_e6")).max
    assert(chosen.head.getAs[Long]("f1_e6") == bestF1)
    assert(rows.filter(_.getAs[Long]("f1_e6") == bestF1)
      .map(_.getAs[Long]("tau_fx")).min ==
      chosen.head.getAs[Long]("tau_fx"), "ties break to the smallest tau")
    // Confusion counts are a partition of the val split at every tau.
    val n = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn")).distinct
    assert(n.length == 1, s"every row sweeps the same val docs: $n")
  }

  test("quality_uncertainty_sample: 50 boundary docs via " +
      "TakeOrderedAndProject — no global sort; scores straddle zero") {
    val q = SparkEntry.queries("quality_uncertainty_sample")(spark, sf)
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "the top-k cut must be per-partition + k-merge, not a global sort")
    val rows = q.collect()
    assert(rows.length == 50)
    val abses = rows.map(_.getAs[Long]("abs_fx"))
    assert(abses.sameElements(abses.sorted),
      "ordered by distance to the boundary")
    // The boundary batch mixes both predicted classes — that is what
    // makes it the informative label purchase.
    assert(rows.map(r => r.getAs[Long]("score_fx") > 0).distinct.length == 2,
      "boundary docs must straddle the decision boundary")
  }

  test("the trained gate composes: filtering at the chosen threshold " +
      "yields a survivor pool cleaner than the rejects") {
    val scored = SparkEntry.queries("quality_score")(spark, sf)
    val tau = SparkEntry.queries("quality_threshold_select")(spark, sf)
      .filter(col("chosen") === 1L).head.getAs[Long]("tau_fx")
    // The production composition: the scorer's output gates the corpus
    // (what corpus_filter_report's rule stack does with hand-set
    // rules), and the gate must actually sort by the planted quality
    // signal — survivors carry a higher good-fraction than rejects.
    val frac = scored
      .withColumn("keep", (col("score_fx") > tau).cast("long"))
      .groupBy(col("keep")).agg(avg(col("label")).as("good_frac"))
      .collect().map(r => r.getAs[Long]("keep") ->
        r.getAs[Double]("good_frac")).toMap
    assert(frac(1L) > frac(0L) + 0.2,
      s"the gate must enrich good docs decisively: $frac")
  }
}

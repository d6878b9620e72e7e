package graft.text

import graft.{SparkEntry, SparkSpec}

/** Behavioral invariants for the round-4 training-data-prep operators:
  * repetition filtering, stratified sampling, sequence packing, and
  * benchmark decontamination. (Value-level correctness is the DuckDB
  * oracle's job; these pin the semantic contracts.) */
class TrainingPrepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_repetition: ratio in [0,1], consistent with its own counts") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val d = r.getAs[Long]("n_distinct")
      val ratio = r.getAs[Double]("dup_ratio")
      assert(d <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - (n - d).toDouble / math.max(n, 1L)) < 1e-12)
      assert((r.getAs[Int]("repetition_flag") == 1) == (ratio > 0.2))
    }
  }

  test("sample_stratified: deterministic, within-rate, independent of other rows") {
    val a = SparkEntry.queries("sample_stratified")(spark, sf).collect()
    val b = SparkEntry.queries("sample_stratified")(spark, sf).collect()
    // Same corpus -> identical sample, row for row.
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // Every kept row's bucket respects its stratum's rate.
    a.foreach { r =>
      val rate = r.getAs[String]("source") match {
        case "src0" | "src1" => 90
        case "src2" | "src3" | "src4" => 50
        case _ => 20
      }
      assert(r.getAs[Long]("bucket") < rate)
    }
  }

  test("pack_sequences: offsets are contiguous per split and sequences cover each doc") {
    val rows = SparkEntry.queries("pack_sequences")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("split")).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("start_offset") == expect)
        expect += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("seq_first") == r.getAs[Long]("start_offset") / 2048)
        assert(r.getAs[Long]("seq_last") ==
          (r.getAs[Long]("start_offset") + r.getAs[Long]("n_tokens") - 1) / 2048)
      }
    }
  }

  test("text_decontaminate: no benchmark docs in output, counts positive") {
    import org.apache.spark.sql.functions._
    val flagged = SparkEntry.queries("text_decontaminate")(spark, sf).collect()
    val benchIds = graft.Tables(spark, sf).documents
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    flagged.foreach { r =>
      assert(!benchIds.contains(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_shared") >= 1)
    }
  }

  test("sample_domain_mix: thresholds follow the derived mixture math, sample deterministic") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("sample_domain_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Recompute the per-source thresholds independently.
    val docs = graft.Tables(spark, sf).documents
    val hist = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val wt = hist.keys.map { s =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString, 16)
      s -> (1L + h % 5)
    }.toMap
    val n = hist.values.sum
    val w = wt.values.sum
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val expect = math.min(1000000L, wt(s) * n * 1000000L / (w * hist(s)))
      assert(r.getAs[Long]("thresh") == expect,
        s"source $s: thresh ${r.getAs[Long]("thresh")} != $expect")
    }
    // Deterministic: re-running yields the identical sample.
    val again = SparkEntry.queries("sample_domain_mix")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("text_collocations: top-50 by lift, scores internally consistent") {
    val rows = SparkEntry.queries("text_collocations")(spark, sf).collect()
    assert(rows.length == 50)
    val lifts = rows.map(_.getAs[Long]("lift_e6")).toSeq
    assert(lifts == lifts.sorted.reverse) // ranked by lift
    rows.foreach { r =>
      assert(r.getAs[Long]("cxy") >= 1)
      assert(r.getAs[Long]("lift_e6") > 0)
      assert(r.getAs[String]("w1").nonEmpty && r.getAs[String]("w2").nonEmpty)
    }
  }
}

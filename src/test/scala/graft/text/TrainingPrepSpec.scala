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
}

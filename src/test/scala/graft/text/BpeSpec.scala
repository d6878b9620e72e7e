package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The pinned-merges BPE tokenizer: hand-computed tokenizations pin
  * the rank-order merge semantics ([[Bpe]]'s "apply in rank order,
  * twice per rule" execution of the classic min-rank loop), and the
  * declared queries bill with it end to end. */
class BpeSpec extends SparkSpec {

  private def countsOf(texts: String*): Seq[Long] = {
    import spark.implicits._
    texts.toDF("text")
      .select(Bpe.tokenCount(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("hand-computed tokenizations under the pinned merges") {
    // Fully merged vocabulary words collapse to ONE token each:
    //   window: i+n, o+w, d+ow, in+dow, w+indow
    //   column: l+u, c+o, co+lu, colu+m, colum+n
    //   order:  e+r, o+r, d+er, or+der
    //   part:   a+r, p+ar, par+t
    //   value:  l+u, a+lu, alu+e, v+alue
    //   scan:   a+n, c+an, s+can
    assert(countsOf("window", "column", "order", "part", "value", "scan")
      == Seq(1L, 1L, 1L, 1L, 1L, 1L))
    // Out-of-vocabulary words fall back toward characters: no rule
    // touches t+h or h+e, so "the" stays 3 chars = 3 tokens.
    assert(countsOf("the") == Seq(3L))
    // Partial merges: "line" = l + ine (i+n at rank 3, in+e at rank 32).
    assert(countsOf("line") == Seq(2L))
    // Multi-word text sums per-word counts; separators never bill.
    assert(countsOf("the window order") == Seq(5L))
    // Degenerate inputs.
    assert(countsOf("", "a  b") == Seq(0L, 2L))
  }

  test("adjacent overlapping occurrences merge exactly (the two-pass rule)") {
    // "erer" = e r e r: left-to-right greedy BPE on rule (e,r) gives
    // [er, er]. A single left-to-right replace pass would consume the
    // shared delimiter and leave [er, e, r] — the second pass per rule
    // completes the skipped occurrence.
    assert(countsOf("erer") == Seq(2L))
    assert(countsOf("ererer") == Seq(3L))
    // "rere": only the middle (e,r) merges → [r, er, e].
    assert(countsOf("rere") == Seq(3L))
  }

  test("token_count_bpe query: exact counts beat the whitespace estimate's grain") {
    val sf = "/root/testdata/sf0.001"
    val bpe = graft.SparkEntry.queries("token_count_bpe")(spark, sf)
    val rows = bpe.collect()
    assert(rows.length == 500)
    val est = graft.SparkEntry.queries("token_count")(spark, sf)
      .select(col("doc_id"), col("n_ws_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      // BPE tokens are at least the word count (no merge crosses a
      // boundary) and at most the character count.
      assert(n >= est(id), s"doc $id: $n < word count ${est(id)}")
    }
    // The merges genuinely compress: corpus-wide BPE mass sits well
    // under the per-character ceiling.
    val totalBpe = rows.map(_.getLong(1)).sum
    val totalChars = graft.Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("text"))))
      .collect()(0).getLong(0)
    // (totalChars counts separators too, which never bill.)
    assert(totalBpe < totalChars * 2 / 3,
      s"expected real compression, got $totalBpe tokens over $totalChars chars")
  }

  test("bpe packer packs the bpe counts, not the estimates") {
    val sf = "/root/testdata/sf0.001"
    val packed =
      graft.SparkEntry.queries("pack_sequences_bpe")(spark, sf).collect()
    val counts = graft.SparkEntry.queries("token_count_bpe")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.length == 500)
    packed.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == counts(r.getLong(0)))
    }
    // Offsets are a per-split prefix sum of those counts.
    packed.groupBy(_.getAs[String]("split")).foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getAs[Long]("start_offset") == off)
        off += r.getAs[Long]("n_tokens")
      }
    }
  }
}

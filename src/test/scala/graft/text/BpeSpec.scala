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

  // ---- The native min-rank kernel (BpeTokenCount) ----

  private def nativeCountsOf(texts: String*): Seq[Long] = {
    import spark.implicits._
    texts.toDF("text")
      .select(Bpe.tokenCountNative(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("native kernel: bit-parity with the replace chain on the pinned table") {
    // Hand cases first (cheap failure localization)...
    val cases = Seq(
      "window", "column", "order", "part", "value", "scan", "the",
      "line", "the window order", "", "a  b", "erer", "ererer", "rere",
      "windowwindow", "partpart", "scancolumnorder", "zzz qqq",
      "valuevaluevalue", "inine inein", "x", " ", "  ", "a", "er",
      "sortsort", "aggagg upup", "colucolu mm nn")
    assert(nativeCountsOf(cases: _*) == countsOf(cases: _*))
    // ...then the whole sf0.001 corpus, row for row.
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf).documents
    val diff = docs.select(
      Bpe.tokenCountNative(col("text")).as("native"),
      Bpe.tokenCount(col("text")).as("chain"))
      .filter(col("native") =!= col("chain"))
    assert(diff.count() == 0L)
  }

  test("native kernel: identical-pair rules run exactly (the chain's excluded case)") {
    import org.apache.spark.sql.graft.ColumnOps
    import spark.implicits._
    def countsUnder(merges: Seq[(String, String)], texts: String*): Seq[Long] =
      texts.toDF("text")
        .select(ColumnOps.bpeTokenCount(col("text"), merges).as("n"))
        .collect().map(_.getLong(0)).toSeq
    // Rule (a,a): GPT-2-style left-to-right merge of the min-rank pair —
    // "aaaaa" → [aa, aa, a] (3), the case where a replace chain diverges.
    val aa = Seq("a" -> "a")
    assert(countsUnder(aa, "aa", "aaa", "aaaa", "aaaaa", "aaaaaa")
      == Seq(1L, 2L, 2L, 3L, 3L))
    // Stacked identical-pair rules: (a,a) then (aa,aa).
    val aaaa = Seq("a" -> "a", "aa" -> "aa")
    assert(countsUnder(aaaa, "aaaa", "aaaaa", "aaaaaaaa")
      == Seq(1L, 2L, 2L))
    // Rank order beats position: with (b,c) ranked above (a,b), "abc"
    // merges b+c first → [a, bc], not [ab, c].
    assert(countsUnder(Seq("b" -> "c", "a" -> "b"), "abc", "ab") == Seq(2L, 1L))
  }

  test("native kernel: ~50k-rule table prices like the 32-rule one (scan-bound)") {
    import org.apache.spark.sql.graft.ColumnOps
    // A released-size merges table: the pinned 32 rules first (same
    // semantics on this corpus), then ~50k deterministic filler rules
    // over synthetic symbols no document can produce — exactly the
    // shape of a real tokenizer's table, where on any given word
    // almost no rule fires. Cost must depend on the TEXT, not the
    // table: the chain formulation would be ~1500× slower here.
    val filler = (0 until 50000).map { i =>
      s"#${i % 223}#" -> s"#${i / 223}#"
    }
    val big = Bpe.Merges ++ filler
    assert(big.length > 50000)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf).documents.cache()
    docs.count()
    def sumUnder(merges: Seq[(String, String)]): (Long, Double) = {
      val t0 = System.nanoTime()
      val s = docs.select(org.apache.spark.sql.functions.sum(
        ColumnOps.bpeTokenCount(col("text"), merges)).as("s"))
        .collect()(0).getLong(0)
      (s, (System.nanoTime() - t0) / 1e9)
    }
    sumUnder(Bpe.Merges) // JIT warm-up
    val (sumSmall, tSmall) = sumUnder(Bpe.Merges)
    val (sumBig, tBig) = sumUnder(big)
    docs.unpersist()
    // Same function (filler never fires)...
    assert(sumBig == sumSmall)
    // ...at the same cost order. The bound is deliberately loose (host
    // variance, one-off table compile) — the failure mode it guards is
    // cost LINEAR in merge count, which would blow past 100×.
    assert(tBig < tSmall * 10 + 1.0,
      s"50k-rule table cost $tBig s vs 32-rule $tSmall s — not scan-bound")
  }

  test("native kernel: SQL registration under the pinned table") {
    assert(spark.sql("SELECT graft_bpe_count('the window order') AS n")
      .head().getLong(0) == 5L)
    assert(spark.sql("SELECT graft_bpe_count(NULL) AS n").head().isNullAt(0))
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

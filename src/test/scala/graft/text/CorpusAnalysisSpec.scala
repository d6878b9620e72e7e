package graft.text

import graft.{SparkEntry, SparkSpec}

/** Behavioral invariants for the round-5 corpus-analysis operators:
  * cross-document boilerplate removal, tf-idf term salience, and
  * vocabulary coverage. (Value-level correctness is the DuckDB oracle's
  * job; these pin the semantic contracts the oracle can't express.) */
class CorpusAnalysisSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lang_id: planted texts score and argmax under the pinned n-gram model") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "the thing and more things"), // en markers: the/and/ing
      (2L, "der schein und ich"), // de markers: der/sch/ein/und/ich
      (3L, "les valeurs que le meilleur"), // fr: les/ le /que/eur
      (4L, "los ganado parante parara"), // es: los/ado/nte/ara
      (5L, "zz qq xx")) // no n-gram hits anywhere -> en tie-break
      .toDF("doc_id", "text")
    val scored = TextQueries.langScored(df).collect()
    val got = scored.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("pred_lang")).toMap
    // Hand-check one score: doc 1 "the thing and more things" —
    // "the" 1x (w4), "and" 1x (w3), "ing" 2x (w3 each): s_en = 13.
    val r1 = scored.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.getAs[Long]("s_en") == 13L,
      s"hand-computed en score mismatch: ${r1.getAs[Long]("s_en")}")
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr",
      4L -> "es", 5L -> "en"))
  }

  test("split_drift_report: identical distributions drift zero; real corpus stays bounded") {
    import org.apache.spark.sql.functions._
    // Every doc carries the SAME text → every split's hashed-unigram
    // distribution is proportional → total variation is exactly 0.
    val dir = tmpDir("drift-zero")
    spark.range(300).select(
      col("id").as("doc_id"),
      lit("alpha beta gamma delta").as("text"),
      lit("en").as("lang"), lit("src0").as("source"),
      lit(22L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val zero = SparkEntry.queries("split_drift_report")(spark, dir).collect()
    assert(zero.map(_.getAs[String]("split")).toSeq == Seq("test", "val"))
    zero.foreach(r => assert(r.getAs[Double]("tv") == 0.0,
      s"identical distributions must not drift: $r"))
    // The driver corpus: TV is a distance in [0, 1], and the uniform
    // synthetic vocabulary should keep splits representative (low
    // drift), not degenerate.
    val real = SparkEntry.queries("split_drift_report")(spark, sf).collect()
    real.foreach { r =>
      val tv = r.getAs[Double]("tv")
      assert(tv >= 0.0 && tv <= 1.0)
      assert(tv < 0.2, s"synthetic splits should be representative: $r")
    }
  }

  test("text_line_dedup: survivors are an in-order segment subsequence; boilerplate actually drops") {
    val rows = SparkEntry.queries("text_line_dedup")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    var totalSegs = 0L
    var totalKept = 0L
    rows.foreach { r =>
      val nSegs = r.getAs[Long]("n_segs")
      val nKept = r.getAs[Long]("n_kept")
      assert(nKept >= 0 && nKept <= nSegs)
      totalSegs += nSegs; totalKept += nKept
      // Reassembly preserves order: clean_text must be the original
      // segment sequence with zero or more segments excised.
      val orig = docs(r.getAs[Long]("doc_id")).split(" ")
      val origSegs = orig.grouped(5).map(_.mkString(" ")).toList
      assert(origSegs.length == nSegs)
      val clean = r.getAs[String]("clean_text")
      val keptSegs =
        if (clean.isEmpty) List.empty[String]
        else {
          // Segments are 5 tokens except a possibly-short final one —
          // recover them by walking the original segment list.
          var rest = clean
          origSegs.filter { seg =>
            val hit = rest == seg || rest.startsWith(seg + " ")
            if (hit) rest = rest.stripPrefix(seg).stripPrefix(" ")
            hit
          }
        }
      assert(keptSegs.length == nKept,
        s"doc ${r.getAs[Long]("doc_id")}: clean_text is not an in-order segment subsequence")
    }
    // The fixture corpus must actually exercise the drop path.
    assert(totalKept < totalSegs, "no boilerplate dropped — threshold dead")
  }

  test("text_tfidf: per-doc top-3 with exact integer scores, non-increasing") {
    val rows = SparkEntry.queries("text_tfidf")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("score_ppm") ==
        r.getAs[Long]("tf") * 1000000L / r.getAs[Long]("df"))
    }
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.length <= 3)
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Long]("score_ppm")).toSeq
      assert(scores == scores.sorted.reverse, "scores must be non-increasing")
    }
  }

  test("text_vocab: consecutive ranks, exact running sum, coverage ends at 1.0") {
    val rows = SparkEntry.queries("text_vocab")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq ==
      (1L to rows.length).toSeq)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.toSeq == ns.sorted.reverse.toSeq, "counts must be non-increasing")
    var cum = 0L
    val total = ns.sum
    rows.foreach { r =>
      cum += r.getAs[Long]("n")
      assert(r.getAs[Long]("cum_n") == cum)
      assert(math.abs(r.getAs[Double]("coverage") - cum.toDouble / total) == 0.0)
    }
    assert(rows.last.getAs[Double]("coverage") == 1.0)
  }

  test("text_vocab: over-cap corpus is bounded to MaxVocab, exact top-N, full-corpus coverage") {
    import org.apache.spark.sql.functions._
    // 2500 distinct terms (> MaxVocab = 1000) with varying frequencies:
    // doc i's text is "t<i> u<i%40>", so u-terms are frequent and the
    // t-terms form a long singleton tail past the cap.
    val dir = tmpDir("vocab-overcap")
    spark.range(2500).select(
      col("id").as("doc_id"),
      concat(lit("t"), col("id"), lit(" u"), col("id") % 40).as("text"),
      lit("en").as("lang"), lit("src0").as("source"),
      length(concat(lit("t"), col("id"), lit(" u"), col("id") % 40)).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = graft.SparkEntry.queries("text_vocab")(spark, dir)
    val rows = df.collect()
    assert(rows.length == TextQueries.MaxVocab,
      s"expected MaxVocab=${TextQueries.MaxVocab} rows, got ${rows.length}")
    // Brute-force top-N over the same corpus.
    val counts = (0 until 2500).flatMap(i => Seq(s"t$i", s"u${i % 40}"))
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextQueries.MaxVocab)
    assert(rows.map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq == top)
    // Coverage is over ALL 5000 tokens, not the pruned frame — so the
    // capped table's last coverage is strictly < 1.0.
    val totalTokens = 5000.0
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n")
      assert(r.getAs[Double]("coverage") == cum / totalTokens)
    }
    assert(rows.last.getAs[Double]("coverage") < 1.0)
    // Plan shape: a bucket-partitioned Window + local-rank Filter must
    // sit BELOW the global (empty-partition) rank window, so the
    // single-task window's input is bounded before it runs.
    val plan = df.queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window [")
    assert(plan.contains("bucket"), "two-level pre-rank missing from plan")
    assert(winIdx >= 0 && plan.indexOf("bucket", winIdx) >= 0,
      "global window does not sit above the bucket-ranked prune")
  }

  test("text_html_extract: extraction exactly recovers the planted main " +
      "content — the text family composes on the output unchanged") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("text_html_extract")(spark, sf)
    // The planted twin's main div holds '<h1>source doc_id</h1><p>text</p>':
    // a correct strip+squeeze recovers exactly those words, nothing of
    // the script/style/nav/footer chrome.
    val expected = graft.Tables(spark, sf).documents
      .select(col("doc_id"),
        concat(col("source"), lit(" "), col("doc_id").cast("string"),
          lit(" "), col("text")).as("expect"))
    val diverging = out.join(expected, "doc_id")
      .filter(col("main_text") =!= col("expect")).count()
    assert(diverging == 0,
      "main-content extraction must recover the planted text verbatim")
    // No chrome word survives into any extracted text.
    assert(out.filter(col("main_text").contains("docId") ||
        col("main_text").contains("margin") ||
        col("main_text").contains("home") ||
        col("main_text").contains("corpus")).count() == 0,
      "script/style/nav/footer content must be dropped, not just untagged")
    // markup_frac is a genuine fraction: the wrap always adds chrome,
    // never swallows the whole document.
    val fr = out.agg(min(col("markup_frac")), max(col("markup_frac"))).head
    assert(fr.getDouble(0) > 0.0 && fr.getDouble(1) < 1.0)
    // char accounting is internally consistent
    assert(out.filter(
      col("text_chars") =!= length(col("main_text")) ||
        col("text_chars") >= col("html_chars")).count() == 0)
  }

  test("text_html_links: every doc contributes exactly its three planted " +
      "links; chrome targets reach full in-degree") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("text_html_links")(spark, sf).collect()
    val nDocs = graft.Tables(spark, sf).documents.count()
    assert(out.map(_.getLong(1)).sum == 3 * nDocs,
      "3 hrefs per doc, so total in-degree = 3x corpus")
    val chrome = out.filter(r => Set("/home", "/about")(r.getString(0)))
    assert(chrome.length == 2 && chrome.forall(_.getLong(1) == nDocs),
      "chrome links are referenced by every document")
    out.filter(_.getString(0).startsWith("/d/")).foreach { r =>
      val k = r.getString(0).stripPrefix("/d/").toLong
      assert(k >= 0 && k < 101, s"planted target out of range: $r")
    }
  }

  test("text_url_canonicalize: raw variants genuinely collapse and " +
      "nothing is lost or double-counted") {
    val out = SparkEntry.queries("text_url_canonicalize")(spark, sf)
      .collect()
    val nDocs = graft.Tables(spark, sf).documents.count()
    assert(out.map(_.getLong(1)).sum == nDocs,
      "every document's URL lands in exactly one canonical group")
    assert(out.length < nDocs / 2,
      "the planted variants must actually collapse (dedup volume real)")
    // The collisions are REAL canonicalization work, not accidental
    // byte-equality: some group must merge several distinct raw forms.
    assert(out.exists(_.getLong(2) > 1),
      "at least one canonical group merges distinct raw forms")
    out.foreach { r =>
      val url = r.getString(0)
      assert(url.startsWith("https://example.com/"), s"bad canonical: $url")
      assert(!url.contains("utm_") && !url.contains("#") &&
        !url.contains(":443") && !url.contains("www."),
        s"canonicalization left tracking/port/fragment residue: $url")
      assert(r.getLong(2) <= r.getLong(1),
        "distinct raw forms cannot exceed member docs")
    }
  }

  test("corpus_dedup_funnel: stages chain and reconcile with the " +
      "canonical-URL table") {
    val rows = SparkEntry.queries("corpus_dedup_funnel")(spark, sf)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_url_exact", "2_content_exact"))
    val Array(urlStage, contentStage) = rows
    val nDocs = graft.Tables(spark, sf).documents.count()
    val nCanon = SparkEntry.queries("text_url_canonicalize")(spark, sf)
      .count()
    assert(urlStage.getLong(1) == nDocs,
      "stage 1 consumes the whole corpus")
    assert(urlStage.getLong(2) == nCanon,
      "stage 1 output = the canonical-URL table's cardinality")
    assert(contentStage.getLong(1) == urlStage.getLong(2),
      "stage 2 consumes exactly stage 1's survivors")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2) && r.getLong(3) >= 0)
    }
  }

  test("lang_id_confusion: marginals reconcile with the corpus; the " +
      "unknown label (zh) can never score a hit") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("lang_id_confusion")(spark, sf).collect()
    val byLang = graft.Tables(spark, sf).documents
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val marginals = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(marginals == byLang,
      "per-true-lang row sums must equal the corpus label counts")
    out.filter(_.getString(0) == "zh").foreach(r =>
      assert(r.getInt(3) == 0, "the 4-lang model cannot predict zh"))
    out.foreach(r => assert(
      (r.getInt(3) == 1) == (r.getString(0) == r.getString(1)),
      s"hit flag must equal the diagonal test: $r"))
  }
}

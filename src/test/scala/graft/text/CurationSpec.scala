package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The curation pipeline's contract: the six-stage funnel reconciles
  * EXACTLY (stage k+1 n_in = stage k n_out, n_removed = n_in − n_out),
  * the accounting bills exactly the final survivors, and — on a
  * planted corpus mirroring tools/curation_corpus.py — EVERY stage
  * fires (the driver corpora leave stages 2/5/6 structurally inert:
  * no boilerplate-dominated page, all primary domains clean, no
  * near-dup pair among gate survivors). */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def funnel(dir: String): Seq[(String, Long, Long, Long)] =
    SparkEntry.queries("corpus_curation_pipeline")(spark, dir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out"), r.getAs[Long]("n_removed"))).toSeq

  private def assertReconciles(
      rows: Seq[(String, Long, Long, Long)]): Unit = {
    assert(rows.map(_._1) == Seq("1_url_canonical", "2_html_extract",
      "3_lang_gate", "4_quality_gate", "5_domain_gate", "6_near_dedup"))
    rows.foreach { case (st, in, out, rm) =>
      assert(rm == in - out, s"$st: removed $rm != $in - $out")
      assert(out >= 0 && out <= in, s"$st: out $out outside [0, $in]")
    }
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 == a._3,
        s"${b._1} n_in ${b._2} != ${a._1} n_out ${a._3}")
    case _ =>
    }
  }

  /** The Scala mirror of tools/curation_corpus.py — 12 docs, one
    * planted removal per stage (two at the domain gate). Keep the two
    * generators in sync. */
  private def plantedCorpus(dir: String): Unit = {
    val goodWords = ("running sorting merging finding working grouping " +
      "linking parsing caching joining scanning mapping folding " +
      "batching packing splitting hashing ranking mixing sampling " +
      "counting tracking loading saving pruning probing seeking " +
      "testing binding framing closing opening reading writing " +
      "sharing holding making taking looking and doing").split(" ")
    def goodText(tag: Long): String =
      (0 until 40).map(i => s"${goodWords(i % goodWords.length)}$tag")
        .mkString(" ")
    val nearDup = {
      val base = goodText(12)
      base.substring(0, base.lastIndexOf(" ")) + " changed"
    }
    val rows = Seq(
      (1L, goodText(0), "en", "src0"),
      (16L, goodText(3), "en", "src0"),
      (21L, goodText(6), "en", "src0"),
      (33L, "ok go", "en", "src0"), // stage 2: boilerplate-dominated
      (141L, goodText(9), "en", "src0"), // stage 1: canonical dup of 21
      (7L, goodText(12), "en", "src1"),
      (12L, goodText(15), "zh", "src1"), // stage 3: lang-ID disagrees
      (18L, Seq.fill(20)("the mess").mkString(" "), "en", "src1"), // stage 4
      (29L, goodText(18), "en", "src1"),
      (47L, nearDup, "en", "src1"), // stage 6: near-dup of doc 7
      (121L, goodText(6), "en", "src3"), // stage 5: site-3 all
      (136L, goodText(3), "en", "src3")) //   non-canonical -> blocked
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("driver corpus: the funnel reconciles end to end and the " +
      "survivor set is exactly stage 6's n_out") {
    val rows = funnel(sf)
    assertReconciles(rows)
    assert(rows.head._2 == 500L, "stage 1 n_in must be the corpus size")
    val surv = CurationQueries.survivorsFrame(
      spark, sf, CurationQueries.flagsFrame(spark, sf))
    assert(surv.count() == rows.last._3)
    // Accounting bills exactly the survivors, source by source.
    val acct = SparkEntry.queries("corpus_curation_accounting")(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(acct.values.map(_._1).sum == rows.last._3)
    val bySource = surv.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("tk")).as("t")).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("t")))).toMap
    assert(acct == bySource)
  }

  test("planted corpus: every stage fires, with exactly the planted " +
      "removals") {
    val dir = tmpDir("curation-planted")
    plantedCorpus(dir)
    val rows = funnel(dir)
    assertReconciles(rows)
    assert(rows == Seq(
      ("1_url_canonical", 12L, 11L, 1L), // doc 141 = canonical dup of 21
      ("2_html_extract", 11L, 10L, 1L), // doc 33's page is ~all chrome
      ("3_lang_gate", 10L, 9L, 1L), // doc 12: pinned LID can't say zh
      ("4_quality_gate", 9L, 8L, 1L), // doc 18: the-stuffed, MAP-bad
      ("5_domain_gate", 8L, 6L, 2L), // docs 121/136: site-3 blocked
      ("6_near_dedup", 6L, 5L, 1L)), // doc 47 folds into doc 7
      s"planted funnel drifted: $rows")
    val surv = CurationQueries.survivorsFrame(
      spark, dir, CurationQueries.flagsFrame(spark, dir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 16L, 21L, 7L, 29L),
      s"planted survivor set drifted: $surv")
  }

  test("the write-once flags layout is bit-equal to a fresh build " +
      "(the four chain cells and a fresh run are interchangeable)") {
    val freshDf = CurationQueries.flagsFrame(spark, sf)
    val cols = freshDf.columns.toIndexedSeq
      .map(org.apache.spark.sql.functions.col)
    val fresh = freshDf.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val layout = CurationQueries.flagsLayout(spark, sf)
      .select(cols: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(layout == fresh, "flags layout drifted from a fresh build")
  }

  test("a corpus REWRITTEN in place re-keys the flags layout: the " +
      "write-once artifact follows the corpus stamp, never serves " +
      "stale flags (the BPE-memo contract, r17 verdict item 2)") {
    val dir = tmpDir("curation-restamp")
    plantedCorpus(dir)
    assert(CurationQueries.flagsLayout(spark, dir).count() == 12L)
    // Rewrite the SAME path with a smaller corpus — OrganicGen and
    // ScaleStress do exactly this on a version/scale bump.
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta epsilon zeta", "en", "src0"),
      (2L, "one two three four five six seven", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.Tables.invalidate() // the fixture-rewrite discipline
    val after = CurationQueries.flagsLayout(spark, dir)
    assert(after.count() == 2L,
      "the flags layout served the stale pre-rewrite corpus")
    // And the re-keyed layout is still bit-equal to a fresh build.
    val fresh = CurationQueries.flagsFrame(spark, dir)
    val cols = fresh.columns.toIndexedSeq
      .map(org.apache.spark.sql.functions.col)
    assert(after.select(cols: _*).orderBy("doc_id").collect().map(_.toSeq)
      .toSeq == fresh.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("materializeCuratedCorpus lands the survivors partitioned by " +
      "source with a reconciling funnel as provenance") {
    val dir = tmpDir("curation-sink")
    plantedCorpus(dir)
    val out = tmpDir("curation-out")
    val n = graft.etl.Sinks.materializeCuratedCorpus(spark, dir, out)
    assert(n == 5L)
    val docs = spark.read.parquet(s"$out/docs")
    assert(docs.count() == 5L)
    assert(docs.columns.toSet ==
      Set("doc_id", "text", "lang", "source", "n_chars", "tk", "component"))
    // Source partitioning: a single-source read prunes at the listing.
    assert(spark.read.parquet(s"$out/docs").filter(col("source") === "src0")
      .count() == 3L)
    assert(new java.io.File(s"$out/docs/source=src1").isDirectory)
    val prov = spark.read.parquet(s"$out/_funnel").collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out"), r.getAs[Long]("n_removed"))).toSeq
      .sortBy(_._1)
    assertReconciles(prov)
    assert(prov.last._3 == 5L)
  }
}

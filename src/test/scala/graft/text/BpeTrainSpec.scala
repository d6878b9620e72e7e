package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE training: bit-parity with a plain driver-side
  * reference trainer (including identical-pair rules, the case literal
  * replace cannot express), exhaustion behavior, determinism, and the
  * trainer→kernel billing-chain parity. */
class BpeTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The reference trainer — Sennrich's learn_bpe loop in plain Scala,
    * no Spark: the ground truth the distributed rounds must match. */
  private def referenceTrain(
      wordCounts: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        stats((syms(i), syms(i + 1))) =
          stats.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (stats.isEmpty) done = true
      else {
        val ((a, b), c) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        learned += ((a, b, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        r += 1
      }
    }
    learned.toSeq
  }

  private def docsOf(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def countsOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("fixture parity with the reference trainer — identical-pair " +
      "rules and odd runs included") {
    // 'ooo'/'oooo' runs force (o,o) merges where greedy left-to-right
    // differs from naive replace (the Bpe a != b guard's exact case);
    // weights break ties deterministically.
    val texts = Seq(
      "loooong loooong book book boot",
      "oooo ooo oo boot book loot",
      "loot loom loom boom boom boom")
    val fixture = docsOf(texts)
    val k = 12
    val (learned, vocab) = BpeTrain.train(fixture, k)
    val ref = referenceTrain(countsOf(texts), k)
    assert(learned.map(l => (l.a, l.b, l.pairCount)) == ref,
      "distributed rounds must replay the reference trainer exactly")
    assert(learned.exists(l => l.a == l.b),
      "the fixture must actually exercise an identical-pair rule")
    // the final vocab's token counts equal the reference encoder's
    val refEnc = {
      var v: Map[String, Vector[String]] =
        countsOf(texts).keys.map(w => w -> w.map(_.toString).toVector).toMap
      for ((a, b, _) <- ref) {
        v = v.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
      v
    }
    vocab.select(col("word"), col("syms")).collect().foreach { r =>
      assert(r.getSeq[String](1) == refEnc(r.getString(0)),
        s"encoded symbols diverge for ${r.getString(0)}")
    }
  }

  test("training is deterministic and exhausts to single-symbol words") {
    val texts = Seq("ab ab abc", "abc abd abd")
    val fixture = docsOf(texts)
    val (l1, _) = BpeTrain.train(fixture, 1000)
    val (l2, v2) = BpeTrain.train(fixture, 1000)
    assert(l1 == l2, "same corpus, same rounds, same rules")
    assert(l1.nonEmpty && l1.size < 1000,
      "the pair space must exhaust before the round budget")
    assert(v2.filter(size(col("syms")) > 1).count() == 0,
      "at exhaustion every distinct word is one symbol")
  }

  test("sample-trained merges replay the reference trainer over the " +
      "sampled documents; the drift audit's flags are consistent") {
    val docs = Tables(spark, sf).documents
    // replicate the declared 25% md5-rank sample rule in plain Scala
    def hex1(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val sampledTexts = docs.select("doc_id", "text").collect()
      .filter(r => hex1(r.getLong(0)) < '4')
      .map(_.getString(1)).toSeq
    val wordCounts = sampledTexts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val ref = referenceTrain(wordCounts, BpeTrain.DeclaredRounds)
    val got = graft.SparkEntry.queries("bpe_train_sampled")(spark, sf)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == ref,
      "sampled training must replay the reference trainer over the sample")
    // drift audit consistency: in_sample <=> a positive sample rank,
    // and every flagged pair really is in the sampled table
    val sampSet = got.map(g => (g._1, g._2)).toSet
    val drift = graft.SparkEntry.queries("bpe_train_sample_drift")(spark, sf)
      .collect()
    drift.foreach { r =>
      val (a, b, sr, flag) =
        (r.getString(1), r.getString(2), r.getLong(3), r.getInt(4))
      assert((flag == 1) == (sr > 0))
      assert((flag == 1) == sampSet.contains((a, b)), s"flag mismatch: $r")
    }
    assert(drift.count(_.getInt(4) == 1) >= 1,
      "a 25% sample of a 31-word corpus must recover at least the top merge")
  }

  test("the segmentation kernel handles identical-pair tables the " +
      "replace chain rejects, and matches the chain where both apply") {
    import org.apache.spark.sql.graft.ColumnOps
    val texts = Seq(
      "loooong loooong book book boot",
      "oooo ooo oo boot book loot",
      "loot loom loom boom boom boom")
    val (learned, vocab) = BpeTrain.train(docsOf(texts), 12)
    val merges = learned.map(l => (l.a, l.b))
    assert(merges.exists(p => p._1 == p._2),
      "the fixture must train an identical-pair rule")
    intercept[IllegalArgumentException] {
      Bpe.mergedSymbolsWith(lit("x"), merges)
    }
    // kernel segmentation per doc == the trainer's own per-word
    // encoding joined in document order — min-rank inference agrees
    // with rank-order training encoding THROUGH the (a,a) rules
    val enc = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val norm = trim(regexp_replace(col("text"), " +", " "))
    docsOf(texts)
      .select(col("doc_id"), ColumnOps.bpeSegment(norm, merges).as("seg"))
      .collect().foreach { r =>
        val want = texts(r.getLong(0).toInt).split(" ").filter(_.nonEmpty)
          .map(w => enc(w).mkString(" ")).mkString(" | ")
        assert(r.getString(1) == want,
          s"kernel segmentation diverges for doc ${r.getLong(0)}")
      }
    // and on the (a≠b) corpus-trained table, kernel ≡ chain bit-exactly
    val corpusMerges = BpeTrain
      .train(Tables(spark, sf).documents, BpeTrain.DeclaredRounds)
      ._1.map(l => (l.a, l.b))
    val diverging = Tables(spark, sf).documents
      .select(
        trim(Bpe.mergedSymbolsWith(norm, corpusMerges)).as("chain"),
        ColumnOps.bpeSegment(norm, corpusMerges).as("kernel"))
      .filter(col("chain") =!= col("kernel"))
      .count()
    assert(diverging == 0,
      "chain and kernel segmentation must agree on every document")
  }

  test("bpe_segment's token counts equal the kernel's, corpus-wide — " +
      "chain segmentation, trainer encoding, and kernel counting agree") {
    val seg = graft.SparkEntry.queries("bpe_segment")(spark, sf)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = graft.SparkEntry.queries("token_count_bpe_trained")(
      spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg == kernel,
      "the segmentation's symbol counts must equal the min-rank " +
        "kernel's counts under the same trained table")
  }

  test("billing-chain parity: the min-rank kernel under the trained " +
      "table reproduces the trainer's own encoding, corpus-wide") {
    val docs = Tables(spark, sf).documents
    val (learned, vocab) = BpeTrain.train(docs, BpeTrain.DeclaredRounds)
    val merges = learned.map(l => (l.a, l.b))
    // per-word: kernel count == len(final syms) for every vocab word
    val diverging = vocab
      .select(col("word"), size(col("syms")).cast("long").as("trained"),
        org.apache.spark.sql.graft.ColumnOps
          .bpeTokenCount(col("word"), merges).as("kernel"))
      .filter(col("trained") =!= col("kernel"))
      .count()
    assert(diverging == 0,
      "rank-order training encoding and min-rank kernel must agree " +
        "on every vocabulary word")
    // and the learned prefix matches the pinned offline-trained table
    assert(merges == Bpe.Merges.take(BpeTrain.DeclaredRounds),
      "the pinned Bpe.Merges fixture must be reproducible from the corpus")
  }

  test("the training memo re-trains when the corpus under a dir is " +
      "rewritten in the same JVM") {
    // The ScaleStress replicate/overwrite pattern: same path, new
    // corpus. A dir-keyed memo would bill every later query against
    // the stale merges table with no error.
    val dir = tmpDir("bpe-memo")
    docsOf(Seq("aa aa aa bb", "aa bb bb"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = BpeTrain.trainedMerges(spark, dir, rounds = 1)
    assert(first.map(l => (l.a, l.b)) == Seq(("a", "a")))
    // Memo hit on the unchanged corpus: same object back.
    assert(BpeTrain.trainedMerges(spark, dir, rounds = 1) eq first)
    // Rewrite the corpus at the SAME path (different content and byte
    // length, so the listing fingerprint changes even within mtime
    // granularity) — the next call must train on the new corpus.
    docsOf(Seq("cc cc cc cc dd dd — a longer rewritten corpus row",
        "cc dd dd cc"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = BpeTrain.trainedMerges(spark, dir, rounds = 1)
    assert(second.map(l => (l.a, l.b)) == Seq(("c", "c")),
      "a rewritten corpus must re-train, not serve stale merges")
  }
}

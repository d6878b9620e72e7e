package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sessions

/** ORGANIC corpus generator for the sf1 stress leg (round-15 verdict
  * item 6): the 10×/30× replication legs preserve duplicate structure
  * BY CONSTRUCTION (each copy is a perturbed twin of an sf0.1 row), so
  * they measure scan/signature throughput but not how collision-driven
  * families grow on organic skew. This generator re-runs the test
  * corpus's own generative process at 10× sf0.1 — fresh draws, not
  * copies — so short-doc shingle collisions, LSH bucket occupancy, ER
  * block growth and near-dup pair volume all grow the way a real
  * corpus's would.
  *
  * The generative family is measured off sf0.1 itself: documents are
  * uniform draws over a 30-word vocab, lengths uniform 10..100
  * (observed deciles 10,19,…,100), langs ≈ 41/14/15/15/15
  * en/de/fr/es/zh, 20 uniform sources — and 5% of docs are
  * NEAR-DUP PLANTS exactly like the driver's (sf0.1 holds 250 docs
  * that are a copy of another doc with one rare `dup` token inserted
  * at a random position — verified by strip-and-match, 243/250
  * resolve to a parent), so the near-dup pair population grows
  * linearly with the corpus while the collision-driven CANDIDATE
  * volume grows organically; embeddings are unit-normalized
  * uniform 64-dim vectors with uniform labels 0..9; customers are
  * formatted sequential keys with uniform nation/segment and uniform
  * cent-rounded balances; events are a uniform 1500-user stream over
  * the same 30-day window with the observed 5-type mix (a denser feed
  * over the same window — how event volume actually grows). All draws
  * are md5-keyed by (table, id, field): deterministic, seedless,
  * regeneration-stable.
  *
  * Usage: runMain graft.tools.OrganicGen [outDir] [docScale]
  * — writes documents/embeddings/customer/events parquet under outDir
  * (default /tmp/graft_sf1, 10× sf0.1 row counts), then times the
  * collision-driven families at sf0.1 vs the organic corpus and
  * prints per-query (t_sf01, t_sf1, ratio) — the BASELINE.md sf1
  * table. Never touches /root/testdata.
  */
object OrganicGen {

  /** Uniform integer in [0, m) keyed by the md5 of `s` — the repo's
    * cross-run-stable draw (graft.util.Hashes.tokHash). */
  private def h(s: Column, m: Long): Column =
    pmod(graft.util.Hashes.tokHash(s), lit(m))

  private def key(parts: Column*): Column = concat_ws(":", parts: _*)

  def generate(spark: SparkSession, out: String, scale: Int = 10): Unit = {
    val nDocs = 5000L * scale
    val nVecs = 2000L * scale
    val nCust = 15000L * scale
    val nEvents = 100000L * scale

    val vocab = array(("spark window merge table column vector stream " +
      "value data small join filter big group hash customer sort order " +
      "slow line part fast the row agg key query a scan batch")
      .split(' ').map(lit).toIndexedSeq: _*)

    spark.range(nDocs).select(col("id").as("doc_id"))
      // 5% of docs are near-dup plants (sf0.1: 250 of 5000): the BASE
      // text is drawn with the parent's keys, then one `dup` marker
      // token is inserted at a drawn position — the driver corpus's
      // own planting scheme.
      .withColumn("isNear",
        h(key(lit("d"), col("doc_id"), lit("near")), 20L) === 0L &&
          col("doc_id") > 0)
      .withColumn("eff", when(col("isNear"),
        h(key(lit("d"), col("doc_id"), lit("par")), nDocs))
        .otherwise(col("doc_id")))
      .withColumn("len", h(key(lit("d"), col("eff"), lit("len")), 91L) + 10)
      .withColumn("toks",
        transform(sequence(lit(1L), col("len")), j =>
          element_at(vocab, (pmod(graft.util.Hashes.tokHash(
            key(lit("d"), col("eff"), lit("w"), j)), lit(30L)) + 1L)
            .cast("int"))))
      .withColumn("pos",
        pmod(graft.util.Hashes.tokHash(
          key(lit("d"), col("doc_id"), lit("pos"))),
          col("len").cast("long") + 1L).cast("int"))
      .withColumn("text", when(col("isNear"),
        array_join(concat(
          slice(col("toks"), lit(1), col("pos")),
          array(lit("dup")),
          slice(col("toks"), col("pos") + 1,
            size(col("toks")) - col("pos"))), " "))
        .otherwise(array_join(col("toks"), " ")))
      .withColumn("lang", {
        val l = h(key(lit("d"), col("doc_id"), lit("lang")), 100L)
        when(l < 41, "en").when(l < 55, "de").when(l < 70, "fr")
          .when(l < 85, "es").otherwise("zh")
      })
      .withColumn("source",
        concat(lit("src"), h(key(lit("d"), col("doc_id"), lit("src")), 20L)))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("raw", transform(sequence(lit(0), lit(63)), d =>
        (h(key(lit("v"), col("vec_id"), d), 100000L).cast("double")
          / 100000.0) - 0.5))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float"))
          .as("embedding"),
        h(key(lit("v"), col("vec_id"), lit("lbl")), 10L).cast("int")
          .as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    spark.range(nCust).select(col("id").as("c_custkey"))
      .select(
        col("c_custkey"),
        format_string("Customer#%09d", col("c_custkey")).as("c_name"),
        h(key(lit("c"), col("c_custkey"), lit("nat")), 25L).cast("int")
          .as("c_nationkey"),
        // cent-rounded uniform over the TPC-H acctbal range
        ((h(key(lit("c"), col("c_custkey"), lit("bal")), 1099999L)
          - 99999L).cast("double") / 100.0).as("c_acctbal"),
        element_at(
          array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
            lit("HOUSEHOLD"), lit("MACHINERY")),
          (h(key(lit("c"), col("c_custkey"), lit("seg")), 5L) + 1L)
            .cast("int")).as("c_mktsegment"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // The 30-day offset is COMPOSED from two draws (seconds + micros):
    // the md5 hash is 32-bit, so a single pmod by the 2.59e12-micro
    // window would never wrap and every event would land in the first
    // ~72 minutes (caught in round-15 review — the bars families would
    // measure ~2 distinct hours instead of ~720).
    val winSeconds = 30L * 86400L
    spark.range(nEvents).select(col("id").as("event_id"))
      .select(
        col("event_id"),
        timestamp_micros(lit(
          java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
          + h(key(lit("e"), col("event_id"), lit("tss")), winSeconds)
            * 1000000L
          + h(key(lit("e"), col("event_id"), lit("tsu")), 1000000L))
          .as("ts"),
        h(key(lit("e"), col("event_id"), lit("u")), 1500L).as("user_id"),
        element_at(
          array(lit("signup"), lit("purchase"), lit("view"),
            lit("click"), lit("error")),
          (h(key(lit("e"), col("event_id"), lit("t")), 5L) + 1L)
            .cast("int")).as("event_type"),
        (h(key(lit("e"), col("event_id"), lit("v")), 56021L)
          .cast("double") / 100.0).as("value"),
        format_string("{\"k\": %d}",
          h(key(lit("e"), col("event_id"), lit("k")), 100L)).as("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** The collision-driven families the organic leg measures — the
    * round-14 verdict's named suspects plus the round-15 additions
    * that price or gate them. */
  private val Families = Seq(
    "dedup_prefix_join", "dedup_minhash_lsh_multi", "dedup_policy_select",
    "dedup_incremental", "dedup_components",
    "er_incremental_scaled", "er_matches",
    "semdedup_threshold_select", "quality_train", "quality_score",
    "stream_dedup_loop", "stream_semdedup_loop", "stream_bars_loop",
    "stream_media_loop",
    // r15 additions: the domain plane (stats feed the filter; the
    // reputation graph's 101-page target universe is scale-invariant),
    // √-weighted dedup (rides the labels frame), and the quality loop.
    "domain_reputation", "domain_filter", "dedup_soft_weights",
    "stream_quality_loop", "domain_quality",
    // r17 additions: the full curation chain + its shard consumers
    // (flags-layout keyed per dir; min-of-2 prices the WARM serving
    // read — the build's growth is the sum of its composed singles,
    // each already growth-pinned above), the measured-depth HNSW pair
    // (the organic 10x corpus crosses a DEPTH BOUNDARY — 20k vectors
    // build five layers vs sf0.1's three, stressing the rule itself),
    // and the three new loops (fresh scratch per attempt — full cost).
    "corpus_curation_pipeline", "training_shards",
    "training_shards_accounting", "similarity_graph_search",
    "graph_search_recall_eval", "stream_ann_loop",
    "stream_curation_loop", "stream_domain_loop")

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    def once: Double =
      graft.BenchStreams.cells.find(_._1 == name) match {
        case Some(cell) =>
          val w = graft.BenchStreams.runCell(spark, dir, cell)
          // runCell swallows cell exceptions into -1: a broken cell
          // must fail the leg loudly, never print as a measurement.
          require(w >= 0, s"stream cell $name FAILED on $dir")
          w
        case None =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
      }
    math.min(once, once)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val scale = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.local(Sessions.cpusFromEnv)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // Reuse only a corpus generated at the SAME scale by the SAME
    // generator version — a stale or differently-scaled dir would
    // silently mislabel every timed row.
    val marker = new org.apache.hadoop.fs.Path(s"$out/_organic_scale")
    val want = s"v2:$scale"
    val have =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      }
    if (!have.contains(want)) {
      println(s"[organic] generating ${scale}x corpus under $out" +
        have.fold("")(h => s" (replacing stale '$h')"))
      fs.delete(new org.apache.hadoop.fs.Path(out), true): Unit
      generate(spark, out, scale)
      val w = fs.create(marker, true)
      try w.write(want.getBytes("UTF-8")) finally w.close()
    } else println(s"[organic] reusing ${scale}x corpus under $out")
    val filter = if (args.length > 2) args(2).split(',').toSet else Set.empty[String]
    for (q <- Families if filter.isEmpty || filter(q)) {
      val t1 = time(spark, q, "/root/testdata/sf0.1")
      val tk = time(spark, q, out)
      println(f"[organic] $q%-28s sf0.1 $t1%7.2f s  sf1 $tk%7.2f s  ratio ${tk / t1}%5.2f")
    }
    spark.stop()
  }
}

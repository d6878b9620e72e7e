package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}

/** 10× scale stress for the dedup / similarity / text families
  * (BASELINE.md scaling note): replicate the sf0.1 documents and
  * embeddings tables 10× under /tmp with per-copy perturbations, run
  * the corpus-bound queries at both scales, and print per-query
  * (t_1x, t_10x, ratio). Near-linear ratios (≈10× work on 10× data on
  * fixed cores) mean no super-linear term is hiding in the pipelines.
  *
  * Perturbation design: copies must NOT be near-dups of their original
  * (that would multiply the candidate-pair volume quadratically in the
  * copy count and measure an unrealistic 100%-dup corpus instead of
  * scan/signature throughput), so every 5th token is rewritten with a
  * copy-unique marker — shingle sets diverge, LSH buckets stay
  * realistic. Embeddings get a copy-scaled offset, keeping vector
  * geometry (and bucket occupancy) comparable.
  */
object ScaleStress {

  private val DocQueries = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_lsh_multi",
    "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_chunk_lsh", "dedup_chunk_doc_edges",
    "dedup_simhash_pairs", "token_count",
    "text_quality", "lang_id", "doc_fingerprint", "text_pii_redact",
    "text_tokens", "text_repetition", "sample_stratified",
    "pack_sequences", "text_decontaminate",
    "text_line_dedup", "text_tfidf", "text_vocab",
    "mm_image_phash", "mm_image_dedup",
    "text_normalize", "split_leakage", "mm_audio_decode",
    "dedup_jaccard_est", "dedup_incremental", "dedup_incremental_components",
    "mm_video_frames", "sample_domain_mix", "text_collocations",
    "snapshot_diff", "graph_triangles", "mm_audio_zcr",
    "mm_video_scene_cuts", "mm_image_resize", "dedup_component_stats",
    "dedup_substring", "dedup_substring_stats", "search_bm25",
    "mm_audio_fingerprint", "mm_audio_dedup", "mm_video_fingerprint",
    "mm_video_dedup", "mm_dedup_report",
    "dedup_chunk_survivors", "text_perplexity_bits", "text_bigram_bits",
    "dedup_recall_eval", "mixture_plan", "dedup_containment",
    "dsir_importance", "dedup_banding_tradeoff", "dedup_survivors_quality",
    "split_assign_dedup",
    // r11 additions (the stress dir holds documents+embeddings only,
    // so the TPC-H-table skew pair is stressed by its own spec instead)
    "token_count_bpe", "mixture_plan_bpe", "pack_sequences_bpe",
    "dedup_banding_select",
    // r12
    "text_decontaminate_fuzzy", "curriculum_order",
    // r13: the exact prefix-filtered tau-join (uncapped by definition —
    // this cell MEASURES the exactness price as the corpus grows)
    "dedup_prefix_join",
    // r14
    "text_html_extract", "text_html_links", "text_url_canonicalize",
    "lang_id_confusion", "corpus_dedup_funnel")
  private val EmbQueries = Seq(
    "similarity_topk", "similarity_ann_lsh", "similarity_ivf",
    "similarity_ivf_scaled",
    "embedding_near_dup", "embedding_near_dup_multi",
    "similarity_rerank", "ann_recall_eval",
    "sim_pq_adc", "similarity_knn_graph", "knn_label_consistency",
    "embedding_components",
    "embedding_dim_stats", "semdedup_pairs", "semdedup_cell_stats",
    "semdedup_survivors", "semdedup_threshold_select",
    "similarity_graph_search",
    "contrastive_triplets")

  /** Round-12 continuation: the market/CDC families read events/orders,
    * so the stress dir carries 10× twins of those too. ER joined the
    * stressed set in round 13, once its pairing ran through the
    * capped-bucket + star-edge machinery: the fixed-cardinality block
    * keys still grow blocks 10× on a 10× corpus, but the cap bounds
    * the per-block pair expansion at O(b) beyond the clique head, so
    * the measured ratio is the bounded growth law — not the uncapped
    * Σb(b−1)/2 quadratic the round-12 exclusion note worried about.
    * The complementary production knob stays documented in ErQueries:
    * widen the key (right-k) so block cardinality tracks O(n), the
    * dedup_banding_select discipline. */
  private val RelQueries = Seq(
    "timeseries_ohlc", "timeseries_ohlc_daily", "timeseries_vwap",
    "timeseries_drawdown", "timeseries_rsi",
    "timeseries_returns_corr", "timeseries_beta",
    "cdc_apply", "cdc_batch_stats", "cdc_scd2", "cdc_apply_idempotent",
    "join_point_in_time", "join_interval_overlap",
    "agg_mode", "agg_listagg", "compaction_plan",
    // r13: ER through the capped pairing path
    "er_candidates", "er_matches", "er_quality", "er_incremental",
    "er_incremental_scaled",
    "er_threshold_select", "customer_pareto", "regr_ols")

  /** 10× events/orders: fresh ids (event_id/o_orderkey re-keyed per
    * copy), prices perturbed a cent-granular step so integerized
    * aggregates vary per copy, timestamps kept — a denser feed over the
    * same 30-day window, which is how event volume actually grows. */
  private def replicateRel(
      spark: SparkSession, sfDir: String, out: String, copies: Int): Unit = {
    val k = explode(sequence(lit(0), lit(copies - 1))).as("k")
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("*"), k)
      .select(
        (col("event_id") * copies + col("k")).as("event_id"),
        col("ts"), col("user_id"), col("event_type"),
        (col("value") + col("k").cast("double") * lit(0.01)).as("value"),
        col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("*"), k)
      .select(
        (col("o_orderkey") * copies + col("k")).as("o_orderkey"),
        // re-keyed on the SAME copy index as customer below, so the
        // 10x corpus keeps referential integrity and the per-customer
        // order fan-in of the 1x shape (an orphaned o_custkey or 10x
        // fan-in would give joins a materially different distribution
        // than a true scale-up)
        (col("o_custkey") * copies + col("k")).as("o_custkey"),
        col("o_orderstatus"),
        (col("o_totalprice") + col("k").cast("double") * lit(0.01))
          .as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("*"), k)
      .select(
        // consistent with orders' o_orderkey re-key above — the same
        // copy index keeps line items attached to their order
        (col("l_orderkey") * copies + col("k")).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"),
        (col("l_extendedprice") + col("k").cast("double") * lit(0.01))
          .as("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("*"), k)
      .select(
        (col("c_custkey") * copies + col("k")).as("c_custkey"),
        // name rewritten FROM the new key so name-derived logic (the
        // ER perturbations, blocking suffixes) sees fresh entities,
        // not 10 byte-identical aliases
        format_string("Customer#%09d", col("c_custkey") * copies + col("k"))
          .as("c_name"),
        col("c_nationkey"),
        (col("c_acctbal") + col("k").cast("double") * lit(0.01))
          .as("c_acctbal"),
        col("c_mktsegment"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
  }

  private def replicate(spark: SparkSession, sfDir: String, out: String, copies: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = explode(sequence(lit(0), lit(copies - 1))).as("k")

    docs.select(col("*"), k)
      .select(
        (col("doc_id") * copies + col("k")).as("doc_id"),
        array_join(
          transform(split(col("text"), " "), (t, i) =>
            when(i % 5 === pmod(col("k"), lit(5)),
              concat(lit("v"), col("k"), t)).otherwise(t)),
          " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    emb.select(col("*"), k)
      .select(
        (col("vec_id") * copies + col("k")).as("vec_id"),
        transform(col("embedding"),
          x => x + col("k").cast("float") * lit(0.001f)).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** embedding_near_dup stresses the LIBRARY entry point (corpus-scaled
    * plane count via planesFor) rather than the declared query, whose
    * plane count is pinned for its static oracle — scaling the bucket
    * space with the corpus is exactly what keeps this query's 10×
    * ratio near-linear. */
  private val overrides: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "embedding_near_dup" -> graft.sim.SimilarityQueries.nearDupScaled,
      "semdedup_pairs" -> graft.sim.SimilarityQueries.semDedupScaled,
      // corpus-scaled block-key width (the declared query pins right-3
      // for its static oracle; production widens with er_key_select)
      "er_incremental" -> graft.er.ErQueries.incrementalScaled)

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    def once: Double = {
      val t0 = System.nanoTime()
      overrides.getOrElse(name, SparkEntry.queries(name))(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once, once)
  }

  def main(args: Array[String]): Unit = {
    // Optional args: [0] comma-separated query filter (iterate on one
    // family without re-timing all fourteen); [1] replication factor
    // (default 10 — pass 30 for the second-decade growth-law leg: one
    // decade shows sub-quadratic, two pin the exponent).
    val only: Option[Set[String]] = args.headOption.map(_.split(',').toSet)
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // v2 path: the round-13 o_custkey re-key fix changes the relational
    // twin's content, so dirs minted by earlier rounds must not satisfy
    // the _SUCCESS freshness check
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_stress${copies}x_v2"
    val spark = Sessions.local(Sessions.cpusFromEnv)
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists())
      replicate(spark, sfDir, out, copies)
    // customer is written LAST in replicateRel, so its _SUCCESS marks
    // the whole relational twin complete; the lineitem check upgrades
    // stress dirs minted before the lineitem twin was added (r13)
    if (!new java.io.File(s"$out/customer.parquet/_SUCCESS").exists() ||
        !new java.io.File(s"$out/lineitem.parquet/_SUCCESS").exists())
      replicateRel(spark, sfDir, out, copies)
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
    val nEmb = spark.read.parquet(s"$out/embeddings.parquet").count()
    val nEv = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[stress] corpus: $nDocs docs, $nEmb embeddings, $nEv events (${copies}x $sfDir)")

    (DocQueries ++ EmbQueries ++ RelQueries).filter(q => only.forall(_.contains(q))).foreach { q =>
      val t1 = time(spark, q, sfDir)
      val t10 = time(spark, q, out)
      println(f"[stress] $q%-22s 1x ${t1}%6.2f s   ${copies}x ${t10}%6.2f s   ratio ${t10 / t1}%5.1f")
    }

    // The three streaming loop cells (full 3-epoch lifecycle incl.
    // effectively-once appends + components/survivors consumers) at
    // both scales — the standing-index growth path stressed with
    // MEASUREMENT, not design argument: a super-linear ratio here
    // means the probe cost is not bounded by collision volume.
    graft.BenchStreams.cells
      .filter(c => only.forall(_.contains(c._1)))
      .foreach { cell =>
        // runCell returns -1 on failure — a bare min() would prefer
        // the sentinel over a real measurement and print a garbage
        // negative ratio; failed attempts are dropped, and a cell
        // with NO successful attempt fails the stress run loudly.
        def t(dir: String): Double = {
          val ok = Seq(
            graft.BenchStreams.runCell(spark, dir, cell),
            graft.BenchStreams.runCell(spark, dir, cell)).filter(_ >= 0)
          require(ok.nonEmpty, s"[stress] ${cell._1} failed both attempts at $dir")
          ok.min
        }
        val t1 = t(sfDir)
        val t10 = t(out)
        println(f"[stress] ${cell._1}%-22s 1x ${t1}%6.2f s   ${copies}x ${t10}%6.2f s   ratio ${t10 / t1}%5.1f")
      }
    spark.stop()
  }
}

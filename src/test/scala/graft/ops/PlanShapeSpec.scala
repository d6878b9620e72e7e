package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression specs for the flagship queries: the ANSWER is
  * pinned by the DuckDB oracle, but the 100 TB story lives in the plan,
  * and a refactor (or an AQE/statistics change) can silently degrade it
  * while every value still matches. At sf0.001 Catalyst auto-broadcasts
  * everything, which hides the intended shapes — so these specs disable
  * autoBroadcastJoinThreshold: explicit broadcast() hints survive (the
  * dimensions we INTEND to broadcast), while unhinted spine joins
  * revert to shuffled joins, reproducing the plan a 100 TB input would
  * produce where only the hinted sides fit in memory. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  private def planOf(query: String): String = {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try SparkEntry.queries(query)(spark, sf).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("q5_local_supplier_volume: exactly one shuffled join (the fact spine), all dims broadcast") {
    val plan = planOf("q5_local_supplier_volume")
    val shuffled =
      countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin")
    assert(shuffled == 1,
      s"expected exactly one shuffled join (lineitem ⋈ orders), got $shuffled:\n$plan")
    // 5 joins total: the spine + 4 broadcast (region→nation→supplier
    // chain collapses to 2 broadcasts feeding the asiaSuppliers frame,
    // plus asiaSuppliers and customer onto the spine).
    assert(countOf(plan, "BroadcastHashJoin") == 4,
      s"expected 4 broadcast joins:\n$plan")
    // The customer⋈supplier nation equality must ride the broadcast as
    // a residual, not become its own join.
    assert(plan.contains("c_nationkey"), s"nation residual missing:\n$plan")
  }

  test("join_salted: the salt is part of the join keys") {
    val plan = planOf("join_salted")
    assert(plan.contains("__salt"),
      s"salt column missing from the join plan:\n$plan")
    // The salt must appear in the equi-join keys themselves (spreading
    // a hot supplier key across reducers), not merely as a column.
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("__salt"))
    assert(joinLine.isDefined,
      s"expected a join keyed on (suppkey, __salt):\n$plan")
  }

  test("q17_small_quantity: decorrelated — one broadcast join back, no subquery, no shuffled join") {
    val plan = planOf("q17_small_quantity")
    assert(countOf(plan, "BroadcastHashJoin") == 1,
      s"expected exactly the aggregate-probe broadcast join:\n$plan")
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"q17 must not shuffle-join:\n$plan")
    assert(!plan.contains("Subquery"),
      s"q17 must be decorrelated, not a per-row subquery:\n$plan")
  }

  test("q18_large_orders: one fact shuffle (the group-by), both joins broadcast") {
    val plan = planOf("q18_large_orders")
    assert(countOf(plan, "BroadcastHashJoin") == 2,
      s"expected the HAVING-shrunk keys and customer to broadcast:\n$plan")
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"q18 must never shuffle-join the fact table:\n$plan")
  }

  test("window_moving_avg: both frames share one Window pass / one shuffle") {
    val plan = planOf("window_moving_avg")
    assert(countOf(plan, "Window") == 1,
      s"sliding + cumulative frames must fuse into one Window node:\n$plan")
    assert(countOf(plan, "hashpartitioning") == 1,
      s"expected exactly the user_id exchange:\n$plan")
  }

  test("agg_pivot: explicit values keep the pivot a pure aggregate pipeline") {
    val plan = planOf("agg_pivot")
    // Spark's pivot-with-explicit-values plan: two-phase agg on
    // (flag, status) feeding a two-phase pivotfirst agg on flag — four
    // HashAggregates, two exchanges, both map-side combined. What must
    // NOT appear: a distinct-values scan or any join/window (the cost
    // `pivot(col)` without values would add).
    assert(countOf(plan, "HashAggregate") == 4,
      s"expected the two-level two-phase pivot aggregate:\n$plan")
    assert(countOf(plan, "hashpartitioning") == 2,
      s"expected exactly two agg exchanges:\n$plan")
    assert(countOf(plan, "Join") == 0 && countOf(plan, "Window [") == 0,
      s"pivot must not add joins or windows:\n$plan")
  }

  test("merge_upsert: map-side WindowGroupLimit prune before the single merge-key shuffle") {
    val plan = planOf("merge_upsert")
    assert(countOf(plan, "Union") == 1, s"expected one union:\n$plan")
    assert(countOf(plan, "Window [") == 1, s"expected one window pass:\n$plan")
    assert(countOf(plan, "hashpartitioning(o_orderkey") == 1,
      s"expected exactly the merge-key exchange:\n$plan")
    // row_number()=1 must push a partial WindowGroupLimit below the
    // exchange: the shuffle then carries at most one row per
    // (key, map partition), not the whole base table.
    assert(plan.contains("row_number(), 1, Partial"),
      s"expected the map-side rank-limit prune below the shuffle:\n$plan")
  }

  test("similarity_rerank: candidate cut is TakeOrderedAndProject, rank window after the limit") {
    val plan = planOf("similarity_rerank")
    // Stage-2 cut: top-RerankCands by the coarse score must plan as
    // TakeOrderedAndProject (per-partition k-heaps), never a global
    // sort or a corpus-wide rank window.
    assert(countOf(plan, "TakeOrderedAndProject") >= 1,
      s"candidate cut lost its TakeOrderedAndProject:\n$plan")
    // The one unpartitioned Window (cand_rank) must sit ABOVE a limit,
    // i.e. see only the ~50 cut survivors: in the plan string the
    // window's child chain contains the TakeOrderedAndProject.
    val wIdx = plan.indexOf("Window [")
    assert(wIdx >= 0, s"cand_rank window missing:\n$plan")
    assert(plan.indexOf("TakeOrderedAndProject", wIdx) > wIdx,
      s"rank window runs below the cut (corpus-sized input):\n$plan")
  }

  test("embedding_near_dup: bucketing window computed once, branches read the checkpoint") {
    val plan = planOf("embedding_near_dup")
    // The ranked frame is localCheckpointed inside nearDupPairs, so the
    // final plan must contain NO Window node (the window ran exactly
    // once, in the checkpoint job) and multiple scans of the pinned RDD.
    assert(countOf(plan, "Window") == 0,
      s"bucketing window recomputed per join branch:\n$plan")
    assert(countOf(plan, "Scan ExistingRDD") >= 2,
      s"expected join branches to read the checkpointed frame:\n$plan")
  }

  test("q20_excess_suppliers: one fact aggregation, every join broadcast or semi") {
    val plan = planOf("q20_excess_suppliers")
    // The decorrelated nested-IN: part prune, per-part total, and the
    // final supplier lookup are ALL broadcast-side joins — the only
    // shuffles are the two aggregations ((supp, part) and per-part).
    val shuffled =
      countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin")
    assert(shuffled == 0,
      s"nested-IN decorrelation must not shuffle a join:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"supplier lookup must be a semi join:\n$plan")
  }

  test("join_semireduced: broadcast keyset prunes the fact below the shuffled join") {
    val plan = planOf("join_semireduced")
    // Exactly one shuffled join (the reduced fact ⋈ selected orders) …
    val shuffled =
      countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin")
    assert(shuffled == 1, s"expected one shuffled join, got $shuffled:\n$plan")
    // … and below it, the broadcast LeftSemi keyset filter on lineitem.
    val semiIdx = plan.indexOf("BroadcastHashJoin")
    assert(semiIdx >= 0 && plan.substring(semiIdx).take(200).contains("LeftSemi"),
      s"semi-join reduction missing or not broadcast:\n$plan")
    val smjIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("ShuffledHashJoin")
    assert(semiIdx > smjIdx,
      s"the semi prefilter must sit BELOW the shuffled join:\n$plan")
  }

  test("funnel_steps: one user-partitioning exchange feeds all three step windows") {
    val plan = planOf("funnel_steps")
    // Three stacked Window nodes (t1, t2, t3) + the final per-user
    // aggregate must share ONE hashpartitioning(user_id) exchange: the
    // whole funnel is a single shuffle of the fact.
    assert(countOf(plan, "Window") == 3,
      s"expected the three step windows:\n$plan")
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"funnel must shuffle the fact exactly once:\n$plan")
  }

  test("sql_q6: every predicate reaches the parquet scan's PushedFilters") {
    val plan = planOf("sql_q6_revenue_scan")
    val scanLine = plan.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    // All four Q6 predicates are pushable (timestamp range, double
    // range, double <) and must land in the scan, not a post-filter.
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(scanLine.contains(c),
        s"$c missing from PushedFilters:\n$scanLine\n$plan")
    }
    // And the scan must only read the columns the query touches.
    assert(!plan.contains("l_orderkey"),
      s"untouched columns read by the Q6 scan:\n$plan")
  }

  test("graph_pagerank: iterations read the checkpointed contribution frame") {
    val plan = planOf("graph_pagerank")
    // Degrees and the rank seed re-derive from the localCheckpoint, so
    // the lineitem scan + distinct must NOT appear in the final plan —
    // every branch reads the pinned RDD.
    assert(!plan.contains("lineitem"),
      s"an iteration branch re-scans lineitem past the checkpoint:\n$plan")
    assert(countOf(plan, "Scan ExistingRDD") >= 4,
      s"iterations must read the checkpointed contribution frame:\n$plan")
  }

  test("snapshot_diff: one full-outer merge join over hash-narrowed scans") {
    val plan = planOf("snapshot_diff")
    // The reconciliation is ONE key-shuffled join; payload text must be
    // hashed away below the join (the scans project (doc_id, text) and
    // the join carries (id, md5) only — no text column crosses it).
    assert(plan.contains("FullOuter"), s"full outer join missing:\n$plan")
    assert(countOf(plan, "SortMergeJoin") == 1,
      s"expected exactly one shuffled join:\n$plan")
    val joinUp = plan.substring(0, plan.indexOf("SortMergeJoin"))
    assert(!joinUp.contains("text#"),
      s"raw text column crosses the join:\n$plan")
  }

  test("dedup_substring: no join anywhere, exchanges bounded by design") {
    val plan = planOf("dedup_substring")
    // The whole operator is fingerprint-count + islands: any join means
    // someone reintroduced pair enumeration. Exactly three hash
    // exchanges are structural: the Par.byKey tokenize barrier, the fp
    // count-window, and the per-doc island window (the span aggregate
    // reuses the island window's doc_id partitioning).
    assert(!plan.contains("Join"), s"substring dedup must not join:\n$plan")
    assert(countOf(plan, "hashpartitioning") == 3,
      s"expected tokenize barrier + fp window + doc islands only:\n$plan")
    assert(countOf(plan, "Window") == 2, s"expected the two windows:\n$plan")
  }

  test("search_bm25: broadcast-only joins, WindowGroupLimit-pruned top-k") {
    val plan = planOf("search_bm25")
    // Scoring reads the checkpointed (query-term-pruned) postings; all
    // dimension attachments (df, corpus stats, query ids) must ride
    // broadcasts, and the per-query top-10 must prune map-side via
    // WindowGroupLimit instead of sorting every candidate through the
    // query_id exchange.
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"bm25 must not shuffle-join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must prune before the window exchange:\n$plan")
    assert(countOf(plan, "hashpartitioning") <= 3,
      s"expected df agg + score agg + rank window exchanges only:\n$plan")
  }

  test("corpus_filter_report: one narrow scan into one source aggregate") {
    val plan = planOf("corpus_filter_report")
    assert(!plan.contains("Join"),
      s"the funnel must be computed inline, never joined:\n$plan")
    assert(countOf(plan, "hashpartitioning") == 1,
      s"expected only the source-keyed aggregate exchange:\n$plan")
  }

  test("basket_affinity: top-25 via TakeOrderedAndProject, no cartesian product") {
    val plan = planOf("basket_affinity")
    // The limit must be a per-partition heap merge, not a global sort,
    // and the only nested-loop join is the hinted 1-row stats cross.
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-25 must not global-sort:\n$plan")
    assert(countOf(plan, "rangepartitioning") == 0,
      s"no range exchange expected:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must stay keyed on the order id:\n$plan")
  }

  test("annotateWithLabels: labels broadcast only below the row gate") {
    import org.apache.spark.sql.functions.col
    val corpus = spark.range(100).select(col("id").as("doc_id"))
    val labels = spark.range(10).select(col("id").as("doc_id"),
      col("id").as("component"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // Claimed-big labels (the 100 TB case): must shuffle on the key,
      // never a forced broadcast of the labels side.
      val big = ScaleGates.annotateWithLabels(
        corpus, labels, ScaleGates.LabelsBroadcastMaxRows, "doc_id")
        .queryExecution.executedPlan.toString
      assert(countOf(big, "BroadcastHashJoin") == 0,
        s"labels at/above the gate must not broadcast:\n$big")
      // Measured-small labels: the explicit fast path broadcasts.
      val small = ScaleGates.annotateWithLabels(corpus, labels, 10L, "doc_id")
        .queryExecution.executedPlan.toString
      assert(countOf(small, "BroadcastHashJoin") == 1,
        s"small labels should take the broadcast fast path:\n$small")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("propagation loop: shuffle width scales with measured edge volume") {
    import graft.dedup.DedupQueries.{loopShufflePartitions, LoopEdgeRowsPerPartition}
    import org.apache.spark.sql.functions.col
    // Pure sizing rule: floor of 4 at test-SF volumes, linear in edge
    // rows, capped at the session's declared parallelism.
    assert(loopShufflePartitions(1000L, 32) == 4, "tiny frames keep the floor")
    assert(loopShufflePartitions(10L * LoopEdgeRowsPerPartition, 4096) == 10,
      "width is linear in measured edge rows")
    assert(loopShufflePartitions(4000L * LoopEdgeRowsPerPartition, 2048) == 2048,
      "width is capped at the session parallelism ceiling")
    // End-to-end: a >4M-pair synthetic edge frame (disjoint pairs — the
    // bidirectional frame tops 7M rows) must widen the loop past the
    // floor; the converged labels frame was materialized under the
    // loop's conf, so its partition count IS the loop's shuffle width.
    val nPairs = 3500000L
    val edges = spark.range(nPairs).select(
      (col("id") * 2).as("doc_a"), (col("id") * 2 + 1).as("doc_b"))
    val sessionWas = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val labels = graft.dedup.DedupQueries.componentLabelsOf(edges)
      val expected = loopShufflePartitions(2 * nPairs, 64)
      assert(expected > 4, s"fixture must exceed the floor, got $expected")
      assert(labels.rdd.getNumPartitions == expected,
        s"loop ran at ${labels.rdd.getNumPartitions} partitions, expected $expected")
      // Each pair is its own component labeled by its even endpoint.
      assert(labels.count() == 2 * nPairs)
    } finally spark.conf.set("spark.sql.shuffle.partitions", sessionWas)
  }

  test("q7_nation_volume: one fact-spine shuffle, both nation-filtered dims broadcast") {
    val plan = planOf("q7_nation_volume")
    val shuffled =
      countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin")
    assert(shuffled == 1,
      s"expected exactly one shuffled join (lineitem ⋈ orders):\n$plan")
    // supp = supplier⋈nation, cust = customer⋈nation, plus each leg
    // broadcast onto the spine.
    assert(countOf(plan, "BroadcastHashJoin") == 4,
      s"expected 4 broadcast joins:\n$plan")
    assert(plan.contains("In(n_name"),
      s"the two-nation filter must reach the nation scans:\n$plan")
  }

  test("q13_customer_distribution: LEFT OUTER survives, order filter pushed to the scan") {
    val plan = planOf("q13_customer_distribution")
    assert(plan.contains("LeftOuter"),
      s"the k=0 bucket requires an outer join:\n$plan")
    // The priority predicate lives on the orders side of the join, so
    // it must reach the orders scan as a pushed filter — in the WHERE
    // clause it would have turned the join inner.
    assert(plan.contains("Not(EqualTo(o_orderpriority"),
      s"order-side predicate must push to the scan:\n$plan")
  }

  test("q14/q19: envelope predicates reach both scans, single broadcast join each") {
    for ((q, factFilter) <- Seq(
        "q14_promo_revenue" -> "GreaterThanOrEqual(l_shipdate",
        "q19_disjunctive_pred" -> "GreaterThanOrEqual(l_quantity")) {
      val plan = planOf(q)
      assert(countOf(plan, "BroadcastHashJoin") == 1,
        s"$q: part must broadcast onto lineitem:\n$plan")
      assert(countOf(plan, "SortMergeJoin") +
        countOf(plan, "ShuffledHashJoin") == 0,
        s"$q: no shuffled join expected:\n$plan")
      assert(plan.contains(factFilter),
        s"$q: fact-side envelope must reach the lineitem scan:\n$plan")
    }
    assert(planOf("q19_disjunctive_pred").contains("In(p_brand"),
      "q19: the brand envelope must reach the part scan")
  }

  test("q15_top_supplier: argmax via broadcast equi-join over ONE checkpointed aggregate") {
    val plan = planOf("q15_top_supplier")
    // Catalyst rewrites the filtered 1-row cross join into a broadcast
    // EQUI-join on rev_units = max_units; with the supplier-name join
    // that makes exactly two broadcast joins and no nested loop.
    assert(countOf(plan, "BroadcastHashJoin") == 2,
      s"expected max-equality + supplier-name broadcast joins:\n$plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") +
      countOf(plan, "SortMergeJoin") +
      countOf(plan, "ShuffledHashJoin") == 0,
      s"no nested-loop or shuffled join expected:\n$plan")
    // The revenue frame is checkpointed: the max branch and the probe
    // read it — the fact table is scanned and aggregated exactly once.
    assert(!plan.contains("lineitem.parquet"),
      s"both branches must read the checkpointed aggregate, not re-scan:\n$plan")
  }

  test("q22_global_sales: stats broadcast, anti join is the only shuffled join") {
    val plan = planOf("q22_global_sales")
    assert(plan.contains("LeftAnti"),
      s"no-recent-orders must be an anti join:\n$plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 1,
      s"the 1-row stats frame broadcasts (enrich pattern):\n$plan")
    val shuffled =
      countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin")
    assert(shuffled == 1,
      s"customer ⋈ orders on the customer key is the only shuffle join:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the recency predicate must reach the orders scan:\n$plan")
  }

  test("perplexity family: model frames broadcast-only, no shuffled joins") {
    for (q <- Seq("text_perplexity_bits", "text_bigram_bits")) {
      val plan = planOf(q)
      assert(countOf(plan, "SortMergeJoin") +
        countOf(plan, "ShuffledHashJoin") == 0,
        s"$q: the vocabulary-sized model sides must broadcast:\n$plan")
      assert(countOf(plan, "BroadcastNestedLoopJoin") == 1,
        s"$q: totals arrive as a 1-row broadcast cross join:\n$plan")
    }
  }

  test("dedup_incremental_components: standing labels never force-broadcast") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val df = SparkEntry.queries("dedup_incremental_components")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty, "expected explicit broadcast hints in the plan")
    // The standing labels table is corpus-scale; the only frame that
    // carries its `component` column into a broadcast hint must first
    // have been narrowed to the batch-sized touched key set by the
    // LeftSemi join — broadcasting un-narrowed standing state is the
    // 100 TB OOM this spec pins out.
    hints.foreach { h =>
      val outputsComponent = h.child.output.exists(_.name == "component")
      val semiNarrowed = h.child.collect {
        case j: Join if j.joinType == LeftSemi => j
      }.nonEmpty
      assert(!outputsComponent || semiNarrowed,
        s"broadcast hint carries standing labels without semi-narrowing:\n${h.child}")
    }
  }

  test("similarity_rerank_mrl: TakeOrdered cascades, window only above the 100-row cut") {
    val df = SparkEntry.queries("similarity_rerank_mrl")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // Three TakeOrdereds: the 1-row probe, the stage-1 top-100, the
    // final top-10 — the cascade never ranks through a corpus window.
    assert("TakeOrderedAndProject".r.findAllIn(plan).length == 3, plan)
    // The trunc_rank window is allowed ONLY above a TakeOrdered (the
    // bounded 100-row form); a Window below every limit would be the
    // corpus-sized single-task funnel this query's doc rules out.
    val winIdx = plan.indexOf("Window")
    if (winIdx >= 0)
      assert(plan.indexOf("TakeOrderedAndProject", winIdx) >= 0,
        s"window must sit above a TakeOrdered cut:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"the cascade needs no shuffle beyond broadcasts:\n$plan")
  }

  test("split_drift_report: one corpus token pass; everything after reads the pin") {
    val df = SparkEntry.queries("split_drift_report")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // The (split, bucket) aggregate is checkpoint-pinned, so the four
    // plan branches that reference it read the materialized leaf
    // (ExistingRDD) — a `Scan parquet` of documents anywhere in THIS
    // plan would mean a branch re-running the corpus token pass.
    assert(!plan.contains("Scan parquet"),
      s"a plan branch re-scans the corpus instead of the pin:\n$plan")
    assert(plan.contains("Scan ExistingRDD"), plan)
    // Post-pin joins are all metadata-sized → broadcast.
    assert(!plan.contains("SortMergeJoin"),
      s"metadata joins must broadcast:\n$plan")
  }

  test("join_runtime_filter: the shape takes an injected bloom filter at scale thresholds") {
    // Locally the 10 GB application-side threshold keeps injection off;
    // drop it (as a 100 TB fact scan would clear it) and the optimizer
    // must push a bloom filter built from the filtered orders leg into
    // the lineitem side — proving the declared query's shape is
    // runtime-filterable, not just joinable.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val qe = SparkEntry.queries("join_runtime_filter")(spark, sf)
        .queryExecution
      val plan = qe.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter") ||
        plan.contains("might_contain"),
        s"expected an injected bloom runtime filter on the fact side:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dedup_recall_eval: no cartesian; candidates semi-pruned by the broadcast truth set") {
    val plan = planOf("dedup_recall_eval")
    assert(!plan.contains("CartesianProduct"),
      s"ground truth must come from the shingle equi-join, never all-pairs:\n$plan")
    // The pair-scale candidate frame must shrink to audit size via a
    // broadcast LeftSemi against the checkpointed truth keys BEFORE the
    // caught-flag outer join (the truth frame's own query-side
    // broadcasts run inside its checkpoint job and are asserted by the
    // oracle, not visible here). The semi is pushed below the
    // orientation union — one per leg.
    val semiBroadcasts = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semiBroadcasts >= 1,
      s"expected the candidate frame semi-pruned by broadcast truth keys:\n$plan")
  }

  test("mixture_plan: one corpus aggregate, totals broadcast as a 1-row cross join") {
    val plan = planOf("mixture_plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 1,
      s"totals must arrive as the broadcast enrich pattern:\n$plan")
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"mixture planning must never shuffle-join:\n$plan")
  }

  test("agg_bucketed: the per-orderkey rollup reads the bucket layout with zero Exchange") {
    val df = SparkEntry.queries("agg_bucketed")(spark, sf)
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("Bucketed: true"),
      s"the rollup must scan the bucketed twin:\n$plan")
    // No shuffle may sit between the bucketed scan and the first
    // aggregate: HashPartitioning(l_orderkey) from the layout satisfies
    // the aggregate's requirement. The only Exchange allowed is the
    // n_lines regroup above already-reduced data.
    val shufflesOverScan = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.collectLeaves().exists(_.toString.contains("graft_bkt_lineitem")) &&
            e.outputPartitioning.toString.contains("l_orderkey") => e
    }
    assert(shufflesOverScan.isEmpty,
      s"per-orderkey aggregation must ride the bucket partitioning:\n$plan")
  }

  test("search_hybrid: no shuffled joins anywhere — candidates and query vectors broadcast") {
    val plan = planOf("search_hybrid")
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"the BM25 stage is broadcast-only (its own spec) and the fusion " +
        s"stage joins a |queries|·50 candidate frame — nothing may " +
        s"shuffle-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("dsir_importance: model frames broadcast-only, no shuffled joins") {
    val plan = planOf("dsir_importance")
    assert(countOf(plan, "SortMergeJoin") + countOf(plan, "ShuffledHashJoin") == 0,
      s"the 1024-bucket model and 1-row totals must broadcast:\n$plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 1,
      s"totals arrive as the 1-row broadcast enrich pattern:\n$plan")
  }

  test("events_wau: offset-explode shape — no range join, no cartesian, day frame broadcast") {
    val plan = planOf("events_wau")
    assert(!plan.contains("CartesianProduct") &&
      countOf(plan, "BroadcastNestedLoopJoin") == 0,
      s"the day spine must never become a nested-loop range join:\n$plan")
    // The day-set restriction rides a broadcast semi join.
    val semiBroadcasts = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semiBroadcasts == 1,
      s"expected the metadata day frame as a broadcast semi:\n$plan")
  }

  test("embedding_dim_stats: no joins, one metadata-sized dim shuffle") {
    val plan = planOf("embedding_dim_stats")
    assert(!plan.contains("Join"), s"profile must be join-free:\n$plan")
    assert(countOf(plan, "hashpartitioning") == 1,
      s"expected exactly the 64-group dim exchange:\n$plan")
  }

  test("customer_pareto: the global rank is cell-decomposed — no " +
      "single-task window over the customer frame") {
    val plan = planOf("customer_pareto")
    // The per-customer rank window must partition by the revenue cell
    // (distributed), never run unpartitioned over the corpus-sized
    // aggregate.
    assert(plan.contains("hashpartitioning(cell"),
      s"the rank window must partition by the revenue cell:\n$plan")
    // Exactly TWO single-partition exchanges are allowed, both
    // metadata-sized: the cells-before offset window over the cell
    // histogram (one row per $10k revenue band) and the 1-row grand
    // totals aggregate. A third means a corpus-sized frame regressed
    // into a global window.
    assert(countOf(plan, "Exchange SinglePartition") == 2,
      s"only the cell histogram + 1-row totals may single-partition:\n$plan")
    // And both sit directly above an aggregate (a reduced frame), never
    // above the customer-level scan.
    plan.linesIterator.sliding(2).foreach { w =>
      if (w.head.contains("Exchange SinglePartition"))
        assert(w.last.contains("HashAggregate"),
          s"a SinglePartition exchange must consume an aggregate:\n$plan")
    }
  }

  test("text_html_extract: one narrow codegen projection — the ONLY " +
      "exchange is the final sort") {
    val plan = planOf("text_html_extract")
    assert(countOf(plan, "Exchange") == 1,
      s"extraction must not shuffle before the order:\n$plan")
    assert(plan.contains("rangepartitioning(doc_id"),
      s"the one exchange is the output sort:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"a pure per-row transform must not aggregate or join:\n$plan")
  }

  test("lang_id_confusion rides the label through the scoring pass — " +
      "no corpus self-join") {
    val plan = planOf("lang_id_confusion")
    assert(!plan.contains("Join"),
      s"the confusion matrix must not self-join the corpus:\n$plan")
    // One partial-agg shuffle on the matrix key + the output sort.
    assert(countOf(plan, "Exchange") == 2, s"plan grew an exchange:\n$plan")
    assert(plan.contains("partial_count"),
      s"matrix counts must map-side combine:\n$plan")
  }

  test("join_interval_overlap: the bucketed decomposition — an EQUI " +
      "join on the hour bucket, never a nested-loop range join") {
    val plan = planOf("join_interval_overlap")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the overlap predicate must ride the bucket equi-join:\n$plan")
    assert(countOf(plan, "SortMergeJoin") +
      countOf(plan, "ShuffledHashJoin") + countOf(plan, "BroadcastHashJoin")
      == 1, s"exactly one join, keyed on the bucket:\n$plan")
    val joinLine = plan.linesIterator.find(_.contains("Join")).get
    assert(joinLine.contains("bucket"),
      s"the equi-join key must be the bucket:\n$joinLine")
  }

  test("quality_train: the corpus is never joined — training is the " +
      "bucket aggregate; every join in the plan is metadata-sized") {
    val plan = planOf("quality_train")
    assert(!plan.contains("CartesianProduct"))
    // The only equi-joins are the 64-row bucket-domain fills on b; the
    // token stream reaches them only as an aggregate. A doc_id join
    // here would mean training started shuffling the corpus.
    plan.linesIterator.filter(_.contains("SortMergeJoin")).foreach(l =>
      assert(l.contains("[b#"), s"unexpected non-bucket join:\n$l"))
    assert(!plan.contains("Join [doc_id"),
      s"training must never join on the doc key:\n$plan")
  }

  test("quality_score: the 65-row model BROADCASTS onto the token " +
      "stream; the only corpus-sized join is the per-doc score attach") {
    val plan = planOf("quality_score")
    assert(!plan.contains("CartesianProduct"))
    // Model weights reach the exploded token stream as a broadcast
    // hash join on the bucket key — the 100 TB contract: the corpus
    // shuffles once (the per-doc sum), never for the model.
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("[b#")),
      s"the weight model must broadcast onto the token stream:\n$plan")
    val docJoins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") && l.contains("doc_id"))
    assert(docJoins == 1,
      s"exactly one corpus-keyed join (scores onto labels), got $docJoins:\n$plan")
    // The class-prior / totals scalars ride 1-row broadcast cross
    // joins — the enrich pattern, never a shuffle.
    assert(countOf(plan, "BroadcastNestedLoopJoin") <= 2, plan)
  }

  test("domain_extract: a pure per-row parse over the hosting union — " +
      "the only exchange is the output sort") {
    val plan = planOf("domain_extract")
    assert(countOf(plan, "Exchange") == 1,
      s"extraction must not shuffle before the order:\n$plan")
    assert(plan.contains("rangepartitioning(fetch_seq"),
      s"the one exchange is the output sort:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"a per-row parse must not aggregate or join:\n$plan")
  }

  test("domain_stats: corpus never joined; the canonical window " +
      "shuffles digests, not document bytes") {
    val plan = planOf("domain_stats")
    assert(!plan.contains("Join"), s"stats must not join:\n$plan")
    assert(countOf(plan, "Window") == 1,
      s"exactly the first-seen-wins window:\n$plan")
    // Token counts are projected below the window, so the md5 exchange
    // carries (digest, tk, keys) — `text` is consumed inside the scan
    // branch projections and never crosses a shuffle.
    assert(plan.contains("hashpartitioning(text_key"),
      s"the window must partition on the digest key:\n$plan")
    // md5 window + distinct expand + final agg + output sort.
    assert(countOf(plan, "Exchange") <= 4, s"plan grew an exchange:\n$plan")
  }

  test("domain_reputation: the 101-page target map BROADCASTS onto " +
      "the corpus; the rank loop never goes cartesian") {
    // The loop runs off a lineage cut, so the corpus-side shape is
    // pinned on the pre-cut edge frame directly.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val edgePlan =
      try graft.text.DomainQueries.linkEdgesFor(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold)
    assert(edgePlan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("tgt")),
      s"the page→domain map must broadcast onto the corpus:\n$edgePlan")
    assert(countOf(edgePlan, "SortMergeJoin") +
      countOf(edgePlan, "ShuffledHashJoin") == 0,
      s"no shuffled join may touch the corpus:\n$edgePlan")
    val plan = planOf("domain_reputation")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the rank loop joins stay keyed:\n$plan")
  }

  test("mixture_temperature: one corpus aggregate; totals ride a " +
      "1-row broadcast cross join (the mixture_plan enrich shape)") {
    val plan = planOf("mixture_temperature")
    assert(countOf(plan, "SortMergeJoin") +
      countOf(plan, "ShuffledHashJoin") == 0,
      s"totals must broadcast, never shuffle:\n$plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 1,
      s"exactly the 1-row totals cross join:\n$plan")
    assert(plan.contains("partial_count"),
      s"the source aggregate must map-side combine:\n$plan")
    // Per-source agg + its re-aggregate on the 1-row totals branch +
    // the single-partition totals + BroadcastExchange + output sort.
    assert(countOf(plan, "Exchange") <= 5, s"plan grew an exchange:\n$plan")
  }

  test("cdc_view_maintain: the delta path — one view-keyed join, " +
      "delta aggregated before it ever meets the view") {
    val plan = planOf("cdc_view_maintain")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // Exactly ONE join in the whole plan: maintained = view ⋈ deltas.
    // A second join would mean the delta path started re-reading facts
    // per group instead of summing contribution deltas.
    assert(countOf(plan, "SortMergeJoin") +
      countOf(plan, "ShuffledHashJoin") +
      countOf(plan, "BroadcastHashJoin") == 1,
      s"the delta path is one view-keyed join:\n$plan")
    // Both sides pre-aggregate (map-side combine) on the group key
    // before the join.
    assert(plan.contains("partial_count") && plan.contains("partial_sum"),
      s"base and delta must combine map-side:\n$plan")
  }

  test("cdc_view_distinct: the count-map merge — exactly one FULL " +
      "outer join on the map key, both sides pre-aggregated") {
    val plan = planOf("cdc_view_distinct")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(countOf(plan, "SortMergeJoin") +
      countOf(plan, "ShuffledHashJoin") +
      countOf(plan, "BroadcastHashJoin") == 1,
      s"the map merge is one join:\n$plan")
    assert(plan.contains("FullOuter"),
      s"inserts mint unseen bands, so the merge must be FULL outer:\n$plan")
    assert(plan.contains("partial_count"),
      s"the stored map and the delta map must combine map-side:\n$plan")
  }

  test("cdc_view_minmax: the bounded-rescan shape — affected groups " +
      "reach the facts through a LEFT SEMI, everything stays keyed") {
    val plan = planOf("cdc_view_minmax")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"),
      s"the rescan must semi-join the affected-group list:\n$plan")
    // Every join is keyed on the group key (custkey) — the rescan is
    // group-bounded, never a row-level fact-to-fact join.
    plan.linesIterator.filter(_.contains("Join")).foreach(l =>
      assert(l.contains("o_custkey"), s"non-group-keyed join:\n$l"))
  }

  test("text_url_canonicalize / text_html_links: map-side combined " +
      "aggregation on the canonical/target key, corpus never joined") {
    for (q <- Seq("text_url_canonicalize", "text_html_links")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
      assert(plan.contains("partial_count"),
        s"$q must map-side combine:\n$plan")
      // distinct-count rewrite (two-phase) + final sort: ≤ 3 exchanges,
      // every one over the already-aggregated metadata frame.
      assert(countOf(plan, "Exchange") <= 3, s"$q plan grew:\n$plan")
    }
  }

  test("cdc_view_distinct_hll: mergeable sketch partials — no join " +
      "wider than the group-keyed union merge, both partials " +
      "map-side combined") {
    val plan = planOf("cdc_view_distinct_hll")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"the sketch form merges by UNION + re-aggregate, never a join:\n$plan")
    assert(plan.contains("partial_hll_sketch_agg") ||
      plan.contains("partial_hllsketchagg") ||
      plan.toLowerCase.contains("hll"),
      s"sketch partials must combine map-side:\n$plan")
  }

  test("training_shards: rates and totals broadcast; the only wide " +
      "machinery is the curation chain, the billing key join, and " +
      "the packer's range exchange") {
    // The manifest frame lineage-cuts `bill` (packer input AND source
    // join), so its executed plan starts at the cut — the mixture
    // broadcasts must be asserted on the PRE-cut bill plan.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val billPlan =
      try graft.text.TrainingShardQueries.billFrame(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert(!billPlan.contains("CartesianProduct"), billPlan)
    // The mixture math joins through BROADCASTS (source-cardinality
    // rates, 1-row totals) — a shuffled join on source would put the
    // whole corpus through a low-cardinality key at 100 TB.
    assert(countOf(billPlan, "BroadcastExchange") >= 2,
      s"rates + totals must broadcast:\n$billPlan")
    // The packer's range sort is the declared distributed prefix-sum
    // shape — no per-split single-task window may appear in the
    // manifest-level plan.
    val plan = planOf("training_shards")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"),
      s"the packer's range exchange must survive:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition funnel in the shard manifest:\n$plan")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sim.SimilarityQueries
import graft.ops.Checkpoints.CheckpointOps

/** INCREMENTAL ANN MAINTENANCE — the navigable graph
  * (`similarity_graph_search`'s HNSW layout) as a STANDING structure
  * (the round-16 verdict's missing item 2): every other standing plane
  * already has an incremental twin (dedup index, semantic index, bars,
  * quality model, domain stats); this closes the last write-once
  * rebuild. Per epoch, a batch of new vectors:
  *
  *   1. LSH-probes the standing OR-amplified bucket index (the
  *      [[IncrementalSemDedup]] machinery verbatim, UN-thresholded:
  *      ANN edges keep every scored collision candidate — top-K
  *      selection happens at read, so the candidate table stays
  *      mergeable) and pairs within the batch itself;
  *   2. NN-DESCENT-refreshes LOCALLY around the insertions
  *      ([[SimilarityQueries.GsDescentRounds]] rounds): each round's
  *      2-hop candidates are drawn only from edges whose SOURCE is an
  *      affected vertex (the batch and its current neighbors), scored
  *      once per unordered pair — cost bounded by |batch|·degree², the
  *      locality HNSW inserts promise, never a global rebuild;
  *   3. lands the scored candidate edges (stamped with their
  *      GENERATION — bucket probe vs descent round — so the standing
  *      read folds per-generation top-K exactly like the batch build's
  *      union of per-stage top-K graphs) and the batch's bucket rows,
  *      both as SnapshotTable commits under the loop discipline:
  *      epoch-gap refusal on both ledgers, replays no-op (appendOnce),
  *      maintenance folds freely because both tables are mergeable.
  *
  * The standing READ ([[standingLayered]]) rebuilds nothing: layer 0
  * is one per-(vertex, generation) rank window over the landed
  * candidate table; the upper layers fold through the SAME
  * [[SimilarityQueries.layersFrom]] measured-depth closure rule as the
  * batch layout, and the SAME search walks it
  * ([[SimilarityQueries.multiProbeVisited]]'s `layeredOver`).
  * IncrementalAnnSpec pins standing-graph search recall against the
  * rebuilt-from-scratch layout at EVERY epoch boundary.
  *
  * Scale posture: the standing index is touched by one bucket
  * semi-join per epoch (the semdedup posture — bucketed layout applies
  * verbatim); the descent touches only edges incident to the affected
  * set; the read's rank window is keyed by (vec_id, gen) — no global
  * sort, no corpus self-join, no rebuild. */
object IncrementalAnn {

  /** One epoch: probe + local descent + land. `indexDir` holds the
    * OR-amplified bucket rows (vec_id, bucket, embedding — the
    * semdedup index layout), `candsDir` the scored candidate edges
    * (vec_id < nbr_id, sim_e6, gen). */
  def processBatch(
      vecs: DataFrame, indexDir: String, candsDir: String,
      batchId: Long): Unit = {
    val spark = vecs.sparkSession
    val index = IncrementalDedup.SnapIndex(indexDir)
    IncrementalDedup.requireEpochContinuity(index, spark, batchId)
    val next =
      graft.etl.SnapshotTable.maxCommittedBatch(spark, candsDir) + 1
    require(batchId <= next,
      s"epoch gap on the candidate ledger: batch $batchId after " +
        s"high-water mark ${next - 1}")
    if (vecs.isEmpty) return
    val newRows = SimilarityQueries.multiBucketRowsOf(vecs).cut(false)
    // 1. Bucket-collision candidates, UN-thresholded (Long.MinValue):
    // the batch against the standing index plus the batch against
    // itself — generation 0.
    val intra = SimilarityQueries
      .incrementalSemPairsBetween(newRows, newRows, Long.MinValue)
      .filter(col("new_vec") > col("corpus_vec"))
    val emitted =
      if (index.exists(spark))
        SimilarityQueries
          .incrementalSemPairsBetween(
            newRows,
            IncrementalDedup.committedBefore(index.read(spark), batchId),
            Long.MinValue)
          .unionByName(intra)
      else intra
    val probePairs = emitted
      .select(least(col("new_vec"), col("corpus_vec")).as("vec_id"),
        greatest(col("new_vec"), col("corpus_vec")).as("nbr_id"),
        col("sim_e6"))
      .distinct()
      .withColumn("gen", lit(0L))
      .cut()
    // Embeddings of every vertex the descent may score: landed index
    // rows (distinct across the 4 table rows) plus the batch.
    val emb = (if (index.exists(spark))
      IncrementalDedup.committedBefore(index.read(spark), batchId)
        .select(col("vec_id"), col("embedding"))
        .unionByName(vecs.select(col("vec_id"), col("embedding")))
    else vecs.select(col("vec_id"), col("embedding")))
      .distinct()
      .cut(false)
    val standing = committedCands(spark, candsDir, batchId).cut()
    val batchIds = vecs.select(col("vec_id")).cut(false)
    // MEASURED locality gate (the ScaleGates discipline, free off the
    // manifest's rows= header): the ripple restriction only pays when
    // the standing candidate table dwarfs the batch — on a toy corpus
    // (or the cold first epochs) the whole-table window is cheaper
    // than computing the ripple, and both are exact.
    val standingRows = graft.etl.SnapshotTable
      .currentSnapshot(spark, candsDir).map(_.rows).getOrElse(0L)
    val batchN = vecs.count()
    val useRipple = standingRows > batchN * 64L
    // 2. Local NN-descent: rounds over the CURRENT standing+fresh
    // graph, 2-hop candidates restricted to sources in the affected
    // set (batch + its neighbors), each scored pair landed with its
    // round as generation. The per-round top-K fold is computed ONLY
    // over the batch's RIPPLE (vertices within 3 hops of an insertion
    // along the unranked candidate adjacency — a superset of the
    // graph's own reach, so every needed source keeps its COMPLETE
    // out-candidate set and its rank is exact): at 100 TB the window
    // runs over |batch|·degree³ rows, never the standing table.
    var newEdges = probePairs
    for (r <- 1 to SimilarityQueries.GsDescentRounds) {
      val all = standing.unionByName(newEdges)
      val sources =
        if (!useRipple) None
        else {
          val adj = all
            .select(col("vec_id"), col("nbr_id"))
            .unionByName(all.select(col("nbr_id").as("vec_id"),
              col("vec_id").as("nbr_id")))
            .cut(false)
          var ripple = batchIds
          for (_ <- 1 to 3)
            ripple = ripple.unionByName(
              adj.join(ripple, Seq("vec_id"), "left_semi")
                .select(col("nbr_id").as("vec_id"))).distinct()
          Some(ripple.cut(false))
        }
      val g = genTopK(all, sources).cut(false)
      // Affected set: the batch, its neighbors, and THEIR neighbors —
      // the 2-hop ripple an insertion perturbs (still |batch|·degree²
      // vertices, never the corpus). One hop was measured one probe-
      // neighbor short of the global-descent rebuild at sf0.001.
      val ring1 = g.join(batchIds, Seq("vec_id"), "left_semi")
        .select(col("nbr_id").as("vec_id")).distinct()
      val ring2 = g.join(ring1, Seq("vec_id"), "left_semi")
        .select(col("nbr_id").as("vec_id"))
      val affected = batchIds.unionByName(ring1).unionByName(ring2)
        .distinct()
      val hop2 = g.join(affected, Seq("vec_id"), "left_semi").as("a")
        .join(g.as("b"), col("a.nbr_id") === col("b.vec_id"))
        .filter(col("a.vec_id") =!= col("b.nbr_id"))
        .select(least(col("a.vec_id"), col("b.nbr_id")).as("vec_id"),
          greatest(col("a.vec_id"), col("b.nbr_id")).as("nbr_id"))
        .distinct()
        .join(all.select("vec_id", "nbr_id"),
          Seq("vec_id", "nbr_id"), "left_anti")
      val scored = hop2
        .join(emb.select(col("vec_id"), col("embedding").as("ea")),
          Seq("vec_id"))
        .join(emb.select(col("vec_id").as("nbr_id"),
          col("embedding").as("eb")), Seq("nbr_id"))
        .select(col("vec_id"), col("nbr_id"),
          SimilarityQueries.simE6(col("ea"), col("eb")).as("sim_e6"))
        .withColumn("gen", lit(r.toLong))
      newEdges = newEdges.unionByName(scored).cut()
    }
    // 3. Land: pairs first, then the index — a crash between replays
    // cleanly (appendOnce no-ops the landed half).
    IncrementalDedup.landPairs(newEdges, candsDir, batchId)
    index.append(newRows, batchId)
  }

  private def committedCands(
      spark: SparkSession, candsDir: String, batchId: Long): DataFrame =
    if (graft.etl.SnapshotTable.currentSnapshot(spark, candsDir).nonEmpty)
      IncrementalDedup.committedBefore(
        graft.etl.SnapshotTable.read(spark, candsDir), batchId)
        .select("vec_id", "nbr_id", "sim_e6", "gen")
    else
      spark.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("nbr_id"),
          lit(0L).as("sim_e6"), lit(0L).as("gen"))
        .limit(0)

  /** Directed per-(vertex, GENERATION) top-[[SimilarityQueries.GsDegree]]
    * over a scored unordered candidate table — the standing layer-0
    * fold, mirroring the batch build's union of per-stage top-K graphs
    * (bucket edges ∪ per-descent-round edges), which is what makes the
    * landed table MERGEABLE: appends only ever add candidates, the
    * rank re-folds. */
  private def genTopK(
      pairs: DataFrame, sources: Option[DataFrame] = None): DataFrame = {
    val directed = pairs
      .select(col("vec_id"), col("nbr_id"), col("sim_e6"), col("gen"))
      .unionByName(pairs.select(col("nbr_id").as("vec_id"),
        col("vec_id").as("nbr_id"), col("sim_e6"), col("gen")))
      .distinct()
    // Restricting to a SOURCE set keeps every kept source's complete
    // out-candidate row set, so its per-(vertex, gen) rank is exactly
    // the unrestricted one — the batch-ripple locality the epoch step
    // exploits.
    val scoped = sources.fold(directed)(s =>
      directed.join(s, Seq("vec_id"), "left_semi"))
    scoped
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id"), col("gen"))
          .orderBy(col("sim_e6").desc, col("nbr_id"))))
      .filter(col("rnk") <= SimilarityQueries.GsDegree)
      .select(col("vec_id"), col("nbr_id"))
      .distinct()
  }

  /** The standing layer-0 navigable graph. */
  def standingLayer0(spark: SparkSession, candsDir: String): DataFrame =
    genTopK(graft.etl.SnapshotTable.read(spark, candsDir)
      .select("vec_id", "nbr_id", "sim_e6", "gen"))

  /** The standing LAYERED graph — layer 0 folded from the candidate
    * table, upper layers through the batch build's own measured-depth
    * closure rule ([[SimilarityQueries.layersFrom]]), so the standing
    * hierarchy obeys the same depth law as the write-once layout. */
  def standingLayered(
      spark: SparkSession, indexDir: String, candsDir: String)
      : DataFrame = {
    val emb = graft.etl.SnapshotTable.read(spark, indexDir)
      .select(col("vec_id"), col("embedding"))
      .distinct()
    SimilarityQueries.layersFrom(emb, standingLayer0(spark, candsDir))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are declared module-by-module (graft.etl / graft.ops /
  * graft.text / graft.dedup / graft.sim) as [[Q]] values carrying both the
  * Spark implementation and the DuckDB oracle SQL, so the two sides are
  * written and reviewed together.
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    etl.EtlQueries.queries ++
      etl.CdcQueries.queries ++
      ops.RelationalQueries.queries ++
      ops.MarketQueries.queries ++
      er.ErQueries.queries ++
      ops.TpchBreadthQueries.queries ++
      ops.StorageQueries.queries ++
      text.TextQueries.queries ++
      text.QualityQueries.queries ++
      text.DomainQueries.queries ++
      text.CurationQueries.queries ++
      text.TrainingShardQueries.queries ++
      text.BpeTrain.queries ++
      dedup.DedupQueries.queries ++
      sim.SimilarityQueries.queries ++
      mm.MultimodalQueries.queries ++
      functions.SqlQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

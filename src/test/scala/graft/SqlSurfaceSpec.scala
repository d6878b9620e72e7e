package graft

import org.apache.spark.sql.functions._

/** The spark.sql(...) surface: the same logical queries must be
  * expressible as SQL text over registered views and agree exactly with
  * the DataFrame-API declarations (one Catalyst underneath). */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def registerViews(): Unit =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("lineitem")

  test("agg_group via spark.sql equals the DataFrame declaration") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       sum(cast(floor(l_quantity * 100.0D + 0.5D) as bigint)) / 100.0D AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val viaDf = SparkEntry.queries("agg_group")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("the registered native function works inside a SQL query over a view") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    val n = spark.sql(
      """SELECT vec_id, graft_vector_dot(embedding, embedding) AS self_dot
        |FROM embeddings
        |WHERE graft_vector_dot(embedding, embedding) > 0.99
        |ORDER BY vec_id""".stripMargin).count()
    assert(n > 0)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnOps

/** TokenHashStats contract: bit-identical to the composable
  * array_min(transform(md5)) + aggregate-fold formulation it replaces
  * (the semantics the DuckDB oracle mirrors), across corpus text and
  * edge cases, on both evaluation paths. */
class TokenHashStatsSpec extends SparkSpec {

  private def toks = split(col("text"), " ")

  private def hofMin = array_min(transform(toks, t => md5(t)))
  private def hofRoll = aggregate(toks, lit(0L),
    (acc, t) => (acc * lit(31L) + graft.util.Hashes.tokHash(t)) % lit(1000000007L))

  test("equivalent to the HOF formulation on corpus text") {
    val stats = ColumnOps.tokenHashStats(toks)
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        stats.getField("min_token_hash").as("nm"),
        stats.getField("rolling_hash").as("nr"),
        hofMin.as("hm"), hofRoll.as("hr"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(2))
      assert(r.getLong(1) == r.getLong(3))
    }
  }

  test("edge cases: empty array, null tokens, empty-string token") {
    val df = spark.sql(
      """SELECT toks FROM VALUES
        |  (array('hello', 'world')),
        |  (array('')),
        |  (array()),
        |  (array('a', CAST(NULL AS STRING), 'b'))
        |AS t(toks)""".stripMargin)
    val stats = ColumnOps.tokenHashStats(col("toks"))
    val hm = array_min(transform(col("toks"), t => md5(t)))
    val hr = aggregate(col("toks"), lit(0L),
      (acc, t) => (acc * lit(31L) + graft.util.Hashes.tokHash(t)) % lit(1000000007L))
    df.select(
      stats.getField("min_token_hash").as("nm"),
      stats.getField("rolling_hash").as("nr"),
      hm.as("hm"), hr.as("hr")).collect().foreach { r =>
      assert(Option(r.getString(0)) == Option(r.getString(2)))
      assert(r.isNullAt(1) == r.isNullAt(3))
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(3))
    }
  }

  test("resolves in SQL via the session extension") {
    val r = spark.sql(
      "SELECT graft_token_hash_stats(array('a')) AS s").head().getStruct(0)
    // md5('a') = 0cc175b9c0f1b6a831c399e269772661; first 8 hex = 0cc175b9
    assert(r.getString(0) == "0cc175b9c0f1b6a831c399e269772661")
    assert(r.getLong(1) == java.lang.Long.parseLong("0cc175b9", 16) % 1000000007L)
  }
}

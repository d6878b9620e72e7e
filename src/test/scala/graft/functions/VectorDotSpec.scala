package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VectorDot contract: bit-identical to the composable fold it
  * replaces (the DuckDB-mirrored semantics), including NULL poisoning
  * and length-mismatch behavior, resolvable via SQL and call_function. */
class VectorDotSpec extends SparkSpec {

  private def fold = (a: String, b: String) =>
    aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the zip_with+aggregate fold on float vectors") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val rows = df.select(
      call_function("graft_vector_dot", col("a"), col("b")).as("native"),
      fold("a", "b").as("folded")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("resolves in SQL via the session extension") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("mixed float/double arrays widen to double") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(CAST(0.5 AS FLOAT)), array(2.0D)) AS d")
      .head().getDouble(0)
    assert(r == 1.0)
  }

  test("NULL element poisons the result (fold parity)") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS d")
      .head()
    assert(r.isNullAt(0))
  }

  test("length mismatch yields NULL (zip_with pad parity)") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(1.0D), array(1.0D, 2.0D)) AS d").head()
    assert(r.isNullAt(0))
  }

  test("NULL input yields NULL") {
    val r = spark.sql(
      "SELECT graft_vector_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d")
      .head()
    assert(r.isNullAt(0))
  }
}

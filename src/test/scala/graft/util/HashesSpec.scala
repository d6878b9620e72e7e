package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hash-family contracts: 32-bit base hash range, affine family overflow
  * safety at the extremes, Spark↔generated-SQL constant agreement. */
class HashesSpec extends SparkSpec {

  test("tokHash is in [0, 2^32) and deterministic") {
    import spark.implicits._
    val vals = Seq("a", "b", "spark", "", "ürlich").toDF("t")
      .select(Hashes.tokHash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0L && h < (1L << 32)))
    val again = Seq("a", "b", "spark", "", "ürlich").toDF("t")
      .select(Hashes.tokHash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals.toSeq == again.toSeq)
  }

  test("affine family never overflows int64 at the extreme base hash") {
    val hMax = (1L << 32) - 1
    (0 until 16).foreach { i =>
      val a = Hashes.a(i)
      val b = Hashes.b(i)
      assert(a >= 1 && a < (1L << 31), s"a($i)=$a out of range")
      assert(b >= 0 && b < Hashes.P)
      // a*hMax + b must stay below Long.MaxValue
      assert(a <= (Long.MaxValue - b) / hMax)
    }
  }

  test("affine column expression equals the generated SQL constants") {
    import spark.implicits._
    val h = 123456789L
    val viaCol = Seq(h).toDF("h")
      .select(Hashes.affine(3, col("h"))).head().getLong(0)
    val viaExpected = (Hashes.a(3) * h + Hashes.b(3)) % Hashes.P
    assert(viaCol == viaExpected)
    assert(Hashes.sqlAffine(3, "h")
      == s"(${Hashes.a(3)} * (h) + ${Hashes.b(3)}) % ${Hashes.P}")
  }

  test("Par.byKey produces the session's shuffle partition count") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Par.byKey(df, "doc_id").rdd.getNumPartitions == n)
  }
}

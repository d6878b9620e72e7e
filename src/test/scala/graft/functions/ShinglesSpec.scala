package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnOps

/** Shingles contract: identical to the interpreted HOF formulation it
  * replaces (sequence + transform + filter + concat — the semantics the
  * DuckDB oracle mirrors), across real corpus text and edge cases, on
  * both the codegen and interpreted evaluation paths. */
class ShinglesSpec extends SparkSpec {

  /** The composable formulation Shingles replaces, verbatim from the
    * pre-native DedupQueries implementation. */
  private def hofShingles(tk: org.apache.spark.sql.Column) =
    filter(
      transform(
        sequence(lit(0), greatest(size(tk), lit(3)) - 3),
        i =>
          concat(
            get(tk, i), lit(" "),
            get(tk, i + 1), lit(" "),
            get(tk, i + 2))),
      x => x.isNotNull)

  test("equivalent to the HOF pipeline on corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
    val rows = docs.select(
      ColumnOps.shingles(col("toks"), 3).as("native"),
      hofShingles(col("toks")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("edge cases: short arrays, null tokens, empty strings") {
    val df = spark.sql(
      """SELECT toks FROM VALUES
        |  (array('a','b','c','d')),
        |  (array('a','b','c')),
        |  (array('a','b')),
        |  (array('a')),
        |  (array()),
        |  (array('a', CAST(NULL AS STRING), 'c', 'd', 'e')),
        |  (array('', '', '')),
        |  (CAST(NULL AS ARRAY<STRING>))
        |AS t(toks)""".stripMargin)
    val rows = df.select(
      ColumnOps.shingles(col("toks"), 3).as("native"),
      hofShingles(col("toks")).as("hof")).collect()
    rows.foreach { r =>
      // One intentional divergence: a NULL input array is NULL natively
      // (standard unary null-intercept) but [] through the HOF chain
      // (greatest(size→NULL, 3) = 3 → one window of NULL gets →
      // filtered). Downstream explode() drops both identically, and
      // null-text docs can never become dedup candidates.
      if (!r.isNullAt(0) && !r.isNullAt(1))
        assert(r.getSeq[String](0) == r.getSeq[String](1))
      else assert(r.isNullAt(0) && (r.isNullAt(1) || r.getSeq[String](1).isEmpty))
    }
    // Spot-check the interesting ones directly.
    val direct = df.select(ColumnOps.shingles(col("toks"), 3).as("s")).collect()
    assert(direct(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(direct(1).getSeq[String](0) == Seq("a b c"))
    assert(direct(2).getSeq[String](0) == Seq.empty)
    assert(direct(4).getSeq[String](0) == Seq.empty)
    // NULL token poisons exactly the windows containing it.
    assert(direct(5).getSeq[String](0) == Seq("c d e"))
    assert(direct(6).getSeq[String](0) == Seq("  "))
    assert(direct(7).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val data = spark.sql(
      """SELECT toks FROM VALUES
        |  (array('x','y','z','w')),
        |  (array('a', CAST(NULL AS STRING), 'c', 'd')),
        |  (array())
        |AS t(toks)""".stripMargin)
    val native = data.select(ColumnOps.shingles(col("toks"), 3).as("s"))
    val codegen = native.collect()
    val interpreted = withSQLConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      native.collect()
    }
    codegen.zip(interpreted).foreach { case (a, b) =>
      assert(a.getSeq[String](0) == b.getSeq[String](0))
    }
  }

  test("resolves in SQL via the session extension") {
    val r = spark.sql(
      "SELECT graft_shingles(array('a','b','c','d'), 2) AS s")
      .head().getSeq[String](0)
    assert(r == Seq("a b", "b c", "c d"))
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

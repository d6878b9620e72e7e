package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** SnakeCase unit + property tests (SURVEY.md §5): mirrors the exact
  * rename chain at bpi_etl_bigquery.py:216-219 — '.'→'_' literal,
  * ([a-z])([A-Z]) boundary, lowercase. Property cases are generated
  * with a fixed-seed RNG (no scalatestplus bridge in the offline
  * dependency cache). */
class SnakeCaseSpec extends AnyFunSuite {

  test("reference examples") {
    assert(SnakeCase.snake("chartName") == "chart_name")
    assert(SnakeCase.snake("time.updated") == "time_updated")
    assert(SnakeCase.snake("time.updatedISO") == "time_updated_iso")
    assert(SnakeCase.snake("bpi.USD.rate_float") == "bpi_usd_rate_float")
    assert(SnakeCase.snake("disclaimer") == "disclaimer")
  }

  test("digit→upper boundary gets NO underscore (reference regex is ([a-z])([A-Z]))") {
    assert(SnakeCase.snake("rate1Float") == "rate1float")
  }

  private def samples: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019."
    Seq.fill(500)(
      Seq.fill(1 + rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
  }

  test("idempotent: snake(snake(x)) == snake(x)") {
    samples.foreach { s =>
      assert(SnakeCase.snake(SnakeCase.snake(s)) == SnakeCase.snake(s), s)
    }
  }

  test("no dots and no uppercase survive") {
    samples.foreach { s =>
      val out = SnakeCase.snake(s)
      assert(!out.contains('.') && out == out.toLowerCase, s)
    }
  }
}

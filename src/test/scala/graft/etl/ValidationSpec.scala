package graft.etl

import graft.SparkSpec

/** Negative validation tests (SURVEY.md §5): each mirrors a Pydantic
  * assertion that would abort the reference's run — 4-char code
  * (pydantic_models.py:37), wrong chartName literal (:49), malformed
  * datetime (:26-34), bad license literal (:62). */
class ValidationSpec extends SparkSpec {

  private def bpiJson(
      chartName: String = "Bitcoin",
      usdCode: String = "USD",
      updated: String = "Dec 18, 2022 10:00:00 UTC"): String =
    s"""{
       |  "time": {"updated": "$updated",
       |           "updatedISO": "2022-12-18T10:00:00+00:00"},
       |  "disclaimer": "d", "chartName": "$chartName",
       |  "bpi": {
       |    "USD": {"code": "$usdCode", "description": "USD", "rate_float": 1.0},
       |    "GBP": {"code": "GBP", "description": "GBP", "rate_float": 1.0},
       |    "EUR": {"code": "EUR", "description": "EUR", "rate_float": 1.0}
       |  }
       |}""".stripMargin

  private def enforceBpi(json: String): Unit = {
    val df = Ingest.parseJson(spark, Seq(json), Schemas.bpi)
    Validation.enforce(df, Validation.bpiRules).collect()
  }

  test("valid payload passes all rules") {
    enforceBpi(bpiJson()) // must not throw
  }

  test("wrong chartName literal fails (pydantic_models.py:49)") {
    val e = intercept[RuntimeException](enforceBpi(bpiJson(chartName = "Ethereum")))
    assert(e.getMessage.contains("chartName_is_Bitcoin"))
  }

  test("4-char code fails the 3-char constraint (pydantic_models.py:37)") {
    val e = intercept[RuntimeException](enforceBpi(bpiJson(usdCode = "USDX")))
    assert(e.getMessage.contains("code"))
  }

  test("whitespace-padded code passes after trim (strip_whitespace)") {
    enforceBpi(bpiJson(usdCode = " USD")) // 4 chars raw, 3 after trim
  }

  test("malformed updated datetime fails (pydantic_models.py:28)") {
    val e = intercept[RuntimeException](
      enforceBpi(bpiJson(updated = "2022/12/18 oops")))
    assert(e.getMessage.contains("updated_matches_format"))
  }

  test("bad license literal fails XR rules (pydantic_models.py:62)") {
    val bad =
      """{"disclaimer": "d", "license": "https://example.com/other",
        |"timestamp": 1671356400, "base": "USD",
        |"rates": {"IDR": 15602.5}}""".stripMargin
    val df = Ingest.parseJson(spark, Seq(bad), Schemas.xr)
    val e = intercept[RuntimeException](
      Validation.enforce(df, Validation.xrRules).collect())
    assert(e.getMessage.contains("license_literal"))
  }

  test("violations() returns the audit rows instead of raising") {
    val df = Ingest.parseJson(spark, Seq(bpiJson(chartName = "Ethereum")), Schemas.bpi)
    val v = Validation.violations(df, Validation.bpiRules, "chartName")
      .collect().map(_.getAs[String]("violation"))
    assert(v.toSeq == Seq("chartName_is_Bitcoin"))
  }

  test("malformed JSON fails FAILFAST parse (Pydantic-raise semantics)") {
    intercept[Exception] {
      Ingest.parseJson(spark, Seq("""{"not json"""), Schemas.bpi).collect()
    }
  }
}

package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** URL construction for the OER-style authenticated, date-templated
  * fetch (bpi_etl_bigquery.py:118-128) — pure string logic, no network.
  */
class IngestSpec extends AnyFunSuite {

  private val template = "https://example.test/api/historical/{date}.json"

  test("date is formatted ISO and substituted into the template (:127)") {
    val url = Ingest.templatedUrl(template, LocalDate.of(2022, 12, 18), Nil)
    assert(url == "https://example.test/api/historical/2022-12-18.json")
  }

  test("auth params appended as a query string in order (:120-123)") {
    val url = Ingest.templatedUrl(
      template, LocalDate.of(2022, 12, 18),
      Seq("app_id" -> "secret-key", "symbols" -> "IDR"))
    assert(url ==
      "https://example.test/api/historical/2022-12-18.json?app_id=secret-key&symbols=IDR")
  }

  test("params are URL-encoded") {
    val url = Ingest.templatedUrl(
      template, LocalDate.of(2022, 1, 5), Seq("q" -> "a b&c=d"))
    assert(url.endsWith("2022-01-05.json?q=a+b%26c%3Dd"))
  }

  test("a template that already has a query string gets '&', not '?'") {
    val url = Ingest.templatedUrl(
      template + "?v=2", LocalDate.of(2022, 12, 18), Seq("symbols" -> "IDR"))
    assert(url.endsWith(".json?v=2&symbols=IDR"))
  }
}

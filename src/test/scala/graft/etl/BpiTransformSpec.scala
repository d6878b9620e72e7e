package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Golden end-to-end test of the reference's transform (FIXTURES.md A3):
  * fixtures mirror the two live API payloads exactly (including the
  * `symbol`/`rate` extras that `extra='allow'` admits), and the output
  * is asserted against the §1.4 schema — names, types, nullability,
  * column order — and values, including the IEEE-754-exact IDR product
  * (bpi_etl_bigquery.py:225).
  */
class BpiTransformSpec extends SparkSpec {

  private val stamp = "2022-12-18 11:22:33"

  private lazy val out = BpiTransform(
    Ingest.readBpi(spark, fixture("bpi-raw-data.json")),
    Ingest.readXr(spark, fixture("rupiah-exchange-rate.json")),
    stamp)

  test("column names and order match §1.4") {
    assert(out.columns.toSeq == Schemas.bpiXrHourly.map(_.name))
  }

  test("symbol and rate are projected away") {
    assert(!out.columns.exists(c => c.contains("symbol") || c.endsWith("_rate")))
  }

  test("types match §1.4") {
    assert(out.schema.map(_.dataType) == Schemas.bpiXrHourly.map(_.dataType))
  }

  test("pinned nullability: only disclaimer and chart_name nullable") {
    val pinned = Sinks.withPinnedSchema(out, Schemas.bpiXrHourly)
    val nullables = pinned.schema.filter(_.nullable).map(_.name)
    assert(nullables == Seq("disclaimer", "chart_name"))
  }

  test("golden row values (FIXTURES.md A3)") {
    val r = out.collect().head
    assert(out.count() == 1)
    assert(r.getAs[String]("chart_name") == "Bitcoin")
    assert(r.getAs[String]("disclaimer").startsWith("This data was produced"))
    assert(r.getAs[String]("time_updated") == "2022-12-18 10:00:00")
    assert(r.getAs[String]("time_updated_iso") == "2022-12-18 10:00:00")
    assert(r.getAs[String]("bpi_usd_code") == "USD")
    assert(r.getAs[String]("bpi_usd_description") == "United States Dollar")
    assert(r.getAs[Double]("bpi_usd_rate_float") == 16751.0735)
    assert(r.getAs[String]("bpi_gbp_code") == "GBP")
    assert(r.getAs[Double]("bpi_gbp_rate_float") == 13972.2437)
    assert(r.getAs[String]("bpi_eur_code") == "EUR")
    assert(r.getAs[Double]("bpi_eur_rate_float") == 16095.3079)
    // IEEE-754 double product, bit-exact (bpi_etl_bigquery.py:225)
    assert(r.getAs[Double]("bpi_idr_rate_float") == 16751.0735 * 15602.5)
    assert(r.getAs[Double]("bpi_idr_rate_float") == 261358624.28374997)
    assert(r.getAs[String]("last_updated") == stamp)
  }

  test("end-to-end pipeline appends to the warehouse table") {
    val table = tmpDir("bpi-table")
    val r1 = BpiPipeline.run(spark,
      fixture("bpi-raw-data.json"), fixture("rupiah-exchange-rate.json"),
      stamp, table)
    assert(r1.count() == 1)
    val r2 = BpiPipeline.run(spark,
      fixture("bpi-raw-data.json"), fixture("rupiah-exchange-rate.json"),
      "2022-12-18 12:22:33", table)
    assert(r2.count() == 2) // WRITE_APPEND semantics (:280)
  }
}

package graft.etl

import org.apache.spark.sql.types._

/** Hand-written StructTypes mirroring the reference's Pydantic contracts
  * (never inferred — schema-on-read with declared shape, SURVEY.md §1.3).
  *
  *  - BPI: /root/reference/dags/bpi_etl/common_module/pydantic_models.py:22-50
  *  - XR:  pydantic_models.py:55-70
  *  - Output: the §1.4 15-column table written by transform_data
  *    (bpi_etl_bigquery.py:160-266) with nullability pinned exactly as
  *    the reference pins it for BigQuery (`has_nulls=['disclaimer',
  *    'chart_name']`, bpi_etl_bigquery.py:240-242).
  *
  * The models declare `extra = 'allow'` (pydantic_models.py:18-20), so
  * the undeclared API fields `symbol` and `rate` pass validation and are
  * only dropped at projection — our schemas declare them so the read
  * admits them and [[BpiTransform]] drops them the same way.
  */
object Schemas {

  /** One currency entry: declared fields first (code, description,
    * rate_float — pydantic_models.py:36-39), admitted extras last
    * (symbol, rate — the order Pydantic's dict() emits them). */
  val bpiCurrencyRate: StructType = StructType(Seq(
    StructField("code", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("rate_float", DoubleType, nullable = true),
    StructField("symbol", StringType, nullable = true),
    StructField("rate", StringType, nullable = true)))

  val bpiTime: StructType = StructType(Seq(
    StructField("updated", StringType, nullable = true),
    StructField("updatedISO", StringType, nullable = true)))

  /** CoinDesk currentprice.json (BPI root, pydantic_models.py:46-50). */
  val bpi: StructType = StructType(Seq(
    StructField("time", bpiTime, nullable = true),
    StructField("disclaimer", StringType, nullable = true),
    StructField("chartName", StringType, nullable = true),
    StructField("bpi", StructType(Seq(
      StructField("USD", bpiCurrencyRate, nullable = true),
      StructField("GBP", bpiCurrencyRate, nullable = true),
      StructField("EUR", bpiCurrencyRate, nullable = true))),
      nullable = true)))

  /** Open Exchange Rates historical payload (pydantic_models.py:55-70).
    * `rates` is declared as a struct with only IDR — the API can return
    * every currency (comment :57), and extra currencies are simply not
    * projected, same as the reference only plucks rates['IDR'] (:223). */
  val xr: StructType = StructType(Seq(
    StructField("disclaimer", StringType, nullable = true),
    StructField("license", StringType, nullable = true),
    StructField("timestamp", LongType, nullable = true),
    StructField("base", StringType, nullable = true),
    StructField("rates", StructType(Seq(
      StructField("IDR", DoubleType, nullable = true))), nullable = true)))

  /** §1.4 output table (`bpi_xr_hourly`): 15 columns, in the column
    * order pandas emits after projection; only disclaimer and chart_name
    * nullable (bpi_etl_bigquery.py:242). Datetime columns are *strings*
    * (`%Y-%m-%d %H:%M:%S`), as the reference writes strings (:229-234). */
  val bpiXrHourly: StructType = {
    def s(name: String, n: Boolean = false) = StructField(name, StringType, n)
    def d(name: String) = StructField(name, DoubleType, nullable = false)
    StructType(Seq(
      s("disclaimer", n = true),
      s("chart_name", n = true),
      s("time_updated"),
      s("time_updated_iso"),
      s("bpi_usd_code"), s("bpi_usd_description"), d("bpi_usd_rate_float"),
      s("bpi_gbp_code"), s("bpi_gbp_description"), d("bpi_gbp_rate_float"),
      s("bpi_eur_code"), s("bpi_eur_description"), d("bpi_eur_rate_float"),
      d("bpi_idr_rate_float"),
      s("last_updated")))
  }
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest path (SURVEY.md §3.2): fetch → schema-enforced parse →
  * snapshot. The reference GETs one JSON document per run
  * (bpi_etl_bigquery.py:62-63, :127-130), validates it (:66, :133), and
  * snapshots the raw payload (:80-84, :147-151).
  *
  * At one document/hour no DataSourceV2 is warranted: the fetch is
  * driver-side; parsing happens on executors via from_json against the
  * declared [[Schemas]]. FAILFAST semantics mirror Pydantic's raise:
  * a malformed payload aborts the job at parse time.
  */
object Ingest {

  /** Driver-side HTTP GET (the reference's requests.get,
    * bpi_etl_bigquery.py:62). Plain java.net; query params pre-encoded
    * by the caller (the XR auth params, :120-123, arrive via config —
    * secrets never live in code). */
  def httpGetJson(url: String, timeoutMs: Int = 30000): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try src.mkString finally src.close()
    } finally conn.disconnect()
  }

  /** OER-style authenticated, date-templated fetch URL
    * (bpi_etl_bigquery.py:118-128): the reference formats the run date
    * into `historical/{date}.json` and passes auth as query params
    * (`app_id` from an Airflow Variable, `symbols=IDR`). Here the
    * template carries a `{date}` placeholder and params arrive from
    * config — secrets never live in code. Params are URL-encoded and
    * appended in the given order (requests.get param semantics). */
  def templatedUrl(
      template: String,
      date: java.time.LocalDate,
      params: Seq[(String, String)]): String = {
    val base = template.replace(
      "{date}",
      date.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE))
    if (params.isEmpty) base
    else {
      def enc(s: String): String =
        java.net.URLEncoder.encode(s, "UTF-8")
      val qs = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
        .mkString("&")
      base + (if (base.contains("?")) "&" else "?") + qs
    }
  }

  /** Fetch one day of the OER historical feed (the extract_xr task,
    * bpi_etl_bigquery.py:127-130): template the date in, authenticate
    * via params, GET. */
  def fetchHistoricalXr(
      template: String,
      date: java.time.LocalDate,
      apiKey: String,
      symbols: String = "IDR",
      timeoutMs: Int = 30000): String =
    httpGetJson(
      templatedUrl(template, date, Seq("app_id" -> apiKey, "symbols" -> symbols)),
      timeoutMs)

  /** Parse in-memory JSON documents against a declared schema.
    * FAILFAST mode: a malformed document raises at parse time
    * (Pydantic-raise semantics) instead of nulling fields. */
  def parseJson(spark: SparkSession, docs: Seq[String], schema: StructType): DataFrame = {
    import spark.implicits._
    docs.toDF("raw")
      .select(
        from_json(col("raw"), schema, Map("mode" -> "FAILFAST")).as("doc"))
      .select("doc.*")
  }

  /** Schema-enforced JSON file scan (mode=FAILFAST — a violating record
    * fails the read, it is never silently nulled). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .option("multiLine", "true")
      .json(path)

  /** The two reference feeds, schema-enforced then rule-gated (the
    * Pydantic validation step, bpi_etl_bigquery.py:66 and :133). */
  def readBpi(spark: SparkSession, path: String): DataFrame =
    Validation.enforce(readJson(spark, path, Schemas.bpi), Validation.bpiRules)

  def readXr(spark: SparkSession, path: String): DataFrame =
    Validation.enforce(readJson(spark, path, Schemas.xr), Validation.xrRules)
}

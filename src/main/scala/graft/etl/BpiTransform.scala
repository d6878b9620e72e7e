package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's transform_data step (bpi_etl_bigquery.py:160-266) as
  * one lazy DataFrame expression: flatten → project → snake-rename →
  * IDR enrich → datetime reformat → stamp. All steps are narrow
  * (column-level) except the enrich, which is a broadcast cross join
  * against the 1-row XR frame — so the whole pipeline is a single
  * whole-stage-codegen'd stage regardless of input volume.
  */
object BpiTransform {

  /** pd.json_normalize (bpi_etl_bigquery.py:195): recursively flatten
    * struct columns into dotted top-level names. Like pandas, scalars at
    * each level come before nested expansions of sibling dicts is NOT
    * the pandas rule — pandas puts all root-level scalars first, then
    * flattened nested columns in encounter order; we reproduce that. */
  def flatten(df: DataFrame): DataFrame = {
    def leaves(prefix: String, st: StructType): Seq[(String, Boolean)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case nested: StructType => leaves(p, nested)
          case _ => Seq((p, prefix.isEmpty))
        }
      }
    val all = leaves("", df.schema)
    val ordered = all.filter(_._2).map(_._1) ++ all.filterNot(_._2).map(_._1)
    // un-backticked col(p): dotted paths here are struct *access* into
    // the nested frame; the alias then makes the dotted name literal.
    df.select(ordered.map(p => col(p).as(p)): _*)
  }

  /** Projection (bpi_etl_bigquery.py:201-212): 4 named meta columns plus
    * every per-currency `code`/`rate_float`/`description` column matched
    * by regex over *column names*. The reference's regex quirk (§1.4
    * faithfulness note) is observably equivalent to this intent. */
  def project(df: DataFrame): DataFrame = {
    val meta = Seq("disclaimer", "chartName", "time.updated", "time.updatedISO")
    val currencyRe = "^bpi\\..*\\.(code|rate_float|description)$".r
    val keep =
      df.columns.filter(meta.contains) ++
        df.columns.filter(c => currencyRe.findFirstIn(c).isDefined)
    // Preserve frame order (pandas .loc keeps frame order, not list order)
    val inOrder = df.columns.filter(keep.contains)
    df.select(inOrder.map(c => col(s"`$c`")).toIndexedSeq: _*)
  }

  private val OutFmt = "yyyy-MM-dd HH:mm:ss"

  /** Datetime reformat (bpi_etl_bigquery.py:229-232): parse the two wire
    * formats ('MMM dd, yyyy HH:mm:ss z' and ISO-8601) and emit
    * `%Y-%m-%d %H:%M:%S` *strings*, exactly as the reference keeps
    * strings. */
  private def reformat(c: Column, fmt: Option[String]): Column =
    date_format(
      fmt.map(f => to_timestamp(c, f)).getOrElse(to_timestamp(c)), OutFmt)

  /** Full transform. `xr` is the 1-row validated XR frame; `lastUpdated`
    * is injected (the reference stamps pendulum.now() at :234 — callers
    * pass a literal so declared outputs stay deterministic; production
    * passes the wall clock). */
  def apply(bpiRaw: DataFrame, xr: DataFrame, lastUpdated: String): DataFrame = {
    val projected = SnakeCase.renameAll(project(flatten(bpiRaw)))
    // Enrich (bpi_etl_bigquery.py:223-225): scalar USD→IDR rate from the
    // second source — broadcast cross join, fact side never shuffles.
    val idr = xr.select(col("rates.IDR").as("usd_idr_rate"))
    val enriched = projected
      .crossJoin(broadcast(idr))
      .withColumn("bpi_idr_rate_float",
        col("bpi_usd_rate_float") * col("usd_idr_rate"))
      .drop("usd_idr_rate")
    enriched
      .withColumn("time_updated",
        reformat(col("time_updated"), Some("MMM dd, yyyy HH:mm:ss z")))
      .withColumn("time_updated_iso", reformat(col("time_updated_iso"), None))
      .withColumn("last_updated", lit(lastUpdated))
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fail-fast validation: the engine analog of the reference's Pydantic
  * gates (`BPI(**json)` raises → task fails, bpi_etl_bigquery.py:66,133).
  *
  * Each rule is a Column predicate; [[enforce]] wraps them in
  * assert_true so the first violating row aborts the job (reference
  * semantics), [[violations]] returns violating rows instead (the audit
  * form used by the `validate_constraints` declared query).
  */
object Validation {

  final case class Rule(name: String, predicate: Column)

  /** BPI payload rules, addressed against the *nested* frame read with
    * [[Schemas.bpi]] (dotted paths are struct access, not flat names)
    * — pydantic_models.py:22-50. */
  def bpiRules: Seq[Rule] = {
    def threeChar(c: String) = Rule(
      s"${c.toLowerCase.replace('.', '_')}_is_3char_code",
      length(trim(col(c))) === 3)
    Seq(
      Rule("chartName_is_Bitcoin", col("chartName") === "Bitcoin"),
      Rule("updated_matches_format",
        try_to_timestamp(col("time.updated"),
          lit("MMM dd, yyyy HH:mm:ss z")).isNotNull),
      Rule("updatedISO_matches_format",
        try_to_timestamp(col("time.updatedISO")).isNotNull),
      threeChar("bpi.USD.code"), threeChar("bpi.GBP.code"),
      threeChar("bpi.EUR.code"),
      Rule("usd_rate_float_present", col("bpi.USD.rate_float").isNotNull))
  }

  /** XR payload rules (pydantic_models.py:55-70). */
  def xrRules: Seq[Rule] = Seq(
    Rule("license_literal",
      col("license") === "https://openexchangerates.org/license"),
    Rule("base_is_3char_code", length(trim(col("base"))) === 3),
    // pendulum.from_timestamp plausibility (:67-70): a representable epoch
    Rule("timestamp_is_unix",
      col("timestamp").isNotNull &&
        col("timestamp") >= 0L && col("timestamp") < 253402300800L),
    Rule("idr_rate_present", col("rates.IDR").isNotNull))

  /** Fail-fast: evaluates every rule on every row inside the scan; the
    * first violation raises (assert_true), mirroring Pydantic's raise.
    * The assert lives in a filter (assert_true yields NULL on success,
    * so the filter keeps every row) — a projected-then-dropped check
    * column would be pruned away by the optimizer and never run. */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df)((d, r) =>
      d.filter(
        assert_true(coalesce(r.predicate, lit(false)), lit(r.name)).isNull))

  /** Audit form: one row per (row, violated rule). */
  def violations(df: DataFrame, rules: Seq[Rule], idCol: String): DataFrame =
    rules
      .map(r =>
        df.filter(!coalesce(r.predicate, lit(false)))
          .select(col(idCol).cast("string").as("entity_id"),
            lit(r.name).as("violation")))
      .reduce(_ unionAll _)
}

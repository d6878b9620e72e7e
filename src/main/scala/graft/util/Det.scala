package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-checked queries.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * logical query. Floating-point SUMs are order-dependent, and a 600k-row
  * double sum carries ~1e-3 absolute noise — no fixed decimal rounding is
  * safe against that. The robust pattern is *integerize-then-sum*:
  *
  *   sum_cents = sum( floor(x * 100 + 0.5) )        -- exact int64 math
  *   sum_x     = sum_cents / 100.0                   -- one deterministic op
  *
  * Every step (IEEE multiply, add, floor, int sum, final divide) is
  * bit-identical across engines because it operates on identical inputs in
  * an identical order. Per-row double arithmetic (no aggregation) is
  * already deterministic as long as the expression tree is written with
  * the same association on both sides.
  */
object Det {
  /** floor(x * scale + 0.5) as long — exact, engine-independent. */
  def toUnits(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5))

  /** Order-independent SUM of a double column, exact at `scale` units.
    * Result is DoubleType = sum_units / scale. */
  def dsum(c: Column, scale: Long = 100L): Column =
    sum(toUnits(c, scale)) / lit(scale.toDouble)

  /** Order-independent AVG of a double column via unit sums. */
  def davg(c: Column, scale: Long = 1000000L): Column =
    (sum(toUnits(c, scale)) / lit(scale.toDouble)) / count(lit(1))

  /** DuckDB SQL fragment mirroring [[toUnits]]. */
  def sqlUnits(expr: String, scale: Long): String =
    s"CAST(floor(($expr) * $scale.0 + 0.5) AS BIGINT)"

  /** SQL fragment mirroring [[dsum]], safe to run verbatim on BOTH
    * engines: the unit sum is cast to DOUBLE *before* the divide.
    * (`CAST(... AS BIGINT) / 100.0` is a dialect trap — Spark parses
    * `100.0` as DECIMAL(4,1) and plans a DECIMAL(27,6) division while
    * DuckDB yields DOUBLE; equal values, mismatched schema hash.) */
  def sqlDsum(expr: String, scale: Long = 100L): String =
    s"CAST(sum(${sqlUnits(expr, scale)}) AS DOUBLE) / $scale.0"

  /** SQL fragment mirroring [[davg]]; DOUBLE-cast for the same
    * dialect-neutrality as [[sqlDsum]]. */
  def sqlDavg(expr: String, scale: Long = 1000000L): String =
    s"(CAST(sum(${sqlUnits(expr, scale)}) AS DOUBLE) / $scale.0) / count(*)"
}

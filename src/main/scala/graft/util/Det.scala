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

  /** EXACT integer square root of a non-negative int64 column. The
    * correctly-rounded IEEE double sqrt puts floor(sqrt(x)) within ±1
    * of the true isqrt for every x < 2^62 (for x beyond 2^52 the
    * double representation of x itself is off by ≤2^10, moving sqrt
    * by ≪1), and one integer fixup in exact int64 comparisons makes
    * the result engine-independent regardless of either engine's
    * sqrt/floor behavior. Used to integerize √-weighting (soft-dedup
    * weights, α=0.5 temperature sampling) without floating sums. */
  def isqrt(c: Column): Column = {
    val s0 = floor(sqrt(c.cast("double"))).cast("long")
    when(s0 * s0 > c, s0 - 1L)
      .when((s0 + 1L) * (s0 + 1L) <= c, s0 + 1L)
      .otherwise(s0)
  }

  /** SQL fragment mirroring [[isqrt]] — CASE/CAST/floor/sqrt only, so
    * the text runs verbatim on BOTH engines. */
  def sqlIsqrt(expr: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($expr) AS DOUBLE))) AS BIGINT)"
    s"(CASE WHEN $s0 * $s0 > ($expr) THEN $s0 - 1 " +
      s"WHEN ($s0 + 1) * ($s0 + 1) <= ($expr) THEN $s0 + 1 " +
      s"ELSE $s0 END)"
  }

  /** EXACT floor(1000·√x) for a non-negative int64 column — the value
    * `isqrt(x * 1000000)` WITHOUT ever materializing `x·10^6`, which
    * overflows int64 (loudly, under ANSI) once x exceeds ~9.2e12 —
    * plausible for a single source's token count at the 100 TB
    * posture. The double seed s0 = floor(1000·sqrt(x)) is within ±1 of
    * the truth for every int64 x (x ≤ 2^63 is representable to ≤2^10
    * ulp; sqrt halves the relative error; ×1000 is exact in double up
    * to 2^53), and the fixup comparison s² ≤ 10^6·x is evaluated
    * overflow-free by the split s = 1000q + r:
    *   s² ≤ 10^6·x  ⟺  10^6·(x − q²) ≥ 2000·q·r + r²
    * where |x − q²| ≤ 2q+2 keeps every product ≤ ~6e15. */
  def isqrtScaled1000(c: Column): Column = {
    def le(s: Column): Column = {
      // Integral s DIV 1000 via double divide + truncate: exact for
      // non-negative s < 2^53 (the quotient's rounding error ~5e-10
      // never crosses an integer boundary for an integer-valued s).
      val q = (s / lit(1000L)).cast("long")
      val r = s - q * 1000L
      lit(1000000L) * (c - q * q) >= lit(2000L) * q * r + r * r
    }
    val s0 = floor(lit(1000.0) * sqrt(c.cast("double"))).cast("long")
    when(!le(s0), s0 - 1L)
      .when(le(s0 + 1L), s0 + 1L)
      .otherwise(s0)
  }

  /** DuckDB-dialect SQL fragment mirroring [[isqrtScaled1000]] (`//`
    * and `%` are DuckDB integral div/mod — truncating toward zero,
    * matching the Scala form on the non-negative domain). `expr` must
    * be a simple column reference (it is repeated). */
  def sqlIsqrtScaled1000(expr: String): String = {
    val s0 = s"CAST(floor(1000.0 * sqrt(CAST(($expr) AS DOUBLE))) AS BIGINT)"
    def le(s: String): String =
      s"(1000000 * (($expr) - (($s) // 1000) * (($s) // 1000)) >= " +
        s"2000 * (($s) // 1000) * (($s) % 1000) + " +
        s"(($s) % 1000) * (($s) % 1000))"
    s"(CASE WHEN NOT ${le(s0)} THEN $s0 - 1 " +
      s"WHEN ${le(s"($s0 + 1)")} THEN $s0 + 1 " +
      s"ELSE $s0 END)"
  }
}

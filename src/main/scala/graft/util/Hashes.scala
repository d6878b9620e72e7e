package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * The driver hash-compares Spark output against DuckDB, so every hash a
  * declared query emits must be computable bit-identically on both
  * engines. md5 is the one hash both share; a 32-bit integer hash is
  * derived from its first 8 hex chars. All values are non-negative and
  * fit in a long, so later modular arithmetic agrees across engines.
  */
object Hashes {

  /** 32-bit token hash: first 8 hex chars of md5, parsed base-16. */
  def tokHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL mirroring [[tokHash]]. */
  def sqlTokHash(expr: String): String =
    s"CAST(CAST('0x' || substr(md5($expr), 1, 8) AS UBIGINT) AS BIGINT)"

  /** THE 90/5/5 content-independent train/val/test split — the ONE
    * split policy every split-aware operator must agree on
    * (assignment, leakage audit, drift report, packers): change it
    * here and the whole board moves in lockstep on both engines. */
  def splitOf(docId: Column): Column = {
    val b = pmod(tokHash(docId.cast("string")), lit(100L))
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** DuckDB SQL mirroring [[splitOf]]. */
  def sqlSplitOf(expr: String): String = {
    val b = s"${sqlTokHash(s"CAST($expr AS VARCHAR)")} % 100"
    s"CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val' ELSE 'test' END"
  }

  /** Universal hash family over a 32-bit base hash: h_i = (a_i·h + b_i)
    * mod p, p prime > 2^32. One md5 per value, k cheap affine
    * transforms — exact int64 arithmetic, identical on both engines:
    * a_i < 2^31 and h < 2^32 keep a_i·h ≤ (2^31-1)(2^32-1) < 2^63-2^32,
    * and adding b_i < 2^33 stays under 2^63 (no signed overflow). */
  val P: Long = 4294967311L
  def a(i: Int): Long = (2654435761L * (i + 1) + 1) % 2147483647L + 1
  def b(i: Int): Long = (2654435789L * (i + 1) + 17) % P

  def affine(i: Int, h: Column): Column =
    (lit(a(i)) * h + lit(b(i))) % lit(P)

  /** DuckDB SQL mirroring [[affine]]. */
  def sqlAffine(i: Int, expr: String): String =
    s"(${a(i)} * ($expr) + ${b(i)}) % $P"
}

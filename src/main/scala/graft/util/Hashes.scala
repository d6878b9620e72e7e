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

  /** Seeded variant: hash of "<seed>:<value>" — the cheap way to get k
    * independent hash functions for MinHash without a real hash family. */
  def seededHash(seed: Int, c: Column): Column =
    tokHash(concat(lit(s"$seed:"), c))

  /** DuckDB SQL mirroring [[seededHash]]. */
  def sqlSeededHash(seed: Int, expr: String): String =
    sqlTokHash(s"'$seed:' || ($expr)")
}

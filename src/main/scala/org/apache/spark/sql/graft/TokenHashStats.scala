// Hosted under org.apache.spark.sql because the expression type-check
// surface (AbstractDataType) is private[sql] — the standard packaging
// pattern for third-party native expressions (same as VectorDot).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token-hash statistics over a token array, one MD5 pass per
  * token: `struct(min_token_hash: string, rolling_hash: long)` where
  *
  *   min_token_hash = min over tokens of md5hex(token)     (nulls skipped)
  *   rolling_hash   = foldLeft(0L)((acc, t) =>
  *                      (acc * 31 + tokHash32(t)) % 1000000007)
  *   tokHash32(t)   = first 8 hex chars of md5hex(t) as base-16 long
  *
  * Bit-identical to the composable formulation it replaces
  * (`array_min(transform(toks, md5))` + an `aggregate` fold through
  * graft.util.Hashes.tokHash — the semantics the DuckDB oracle
  * mirrors), with the same NULL behavior: null tokens are skipped by
  * the min but poison the fold; an empty array yields (null, 0).
  *
  * Exists for a measured reason: at 50k docs the interpreted
  * higher-order pipeline computes two md5s per token through per-element
  * closure dispatch, hex-string materialization and base-16 string
  * parsing — the slowest operator of the 10× scale stress (BASELINE.md).
  * Here each token is digested ONCE; the min is tracked as the raw
  * 16-byte digest (hex encoding is monotone per byte, so digest order ==
  * hex-string order) and encoded exactly once per row; the 32-bit hash
  * is the first 4 digest bytes as an unsigned int — no hex parsing.
  */
case class TokenHashStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("min_token_hash", StringType, nullable = true),
    StructField("rolling_hash", LongType, nullable = true)))

  override def prettyName: String = "graft_token_hash_stats"

  override def nullSafeEval(arr: Any): Any =
    TokenHashStats.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenHashStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashStats {
  private val P = 1000000007L

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned-lexicographic digest compare (== hex-string order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Shared by interpreted eval and generated code: one digest per
    * token, min tracked as raw bytes, fold in element order. */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val digest = md.get()
    var minDigest: Array[Byte] = null
    var acc: java.lang.Long = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        acc = null // null token poisons the fold (matches aggregate())
      } else {
        digest.reset()
        val d = digest.digest(toks.getUTF8String(i).getBytes)
        if (minDigest == null || less(d, minDigest)) minDigest = d
        if (acc != null) {
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          acc = (acc * 31L + h) % P
        }
      }
      i += 1
    }
    InternalRow(
      if (minDigest == null) null else hex(minDigest),
      acc)
  }

  /** (identifier, info, builder) tuple for SparkSessionExtensions
    * .injectFunction / FunctionRegistry registration. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_hash_stats"),
    new ExpressionInfo(classOf[TokenHashStats].getName, null, "graft_token_hash_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_token_hash_stats takes exactly 1 argument")
      TokenHashStats(args.head)
    })
}

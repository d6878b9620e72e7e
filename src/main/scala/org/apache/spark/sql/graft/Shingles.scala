// Hosted under org.apache.spark.sql because the expression type-check
// surface (AbstractDataType) is private[sql] — the standard packaging
// pattern for third-party native expressions (same as VectorDot).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-gram shingling over a token array column:
  * element i of the output is `tok[i] ⧺ " " ⧺ … ⧺ tok[i+n-1]`; windows
  * containing a NULL token are dropped.
  *
  * Exists for a measured reason: the composable formulation
  * (`filter(transform(sequence(0, greatest(size(tk), n) - n), i =>
  * concat(get(tk,i), " ", …)), isNotNull)`) runs every lambda on the
  * interpreted higher-order-function path — per-element closure
  * dispatch, boxed index arithmetic, and a five-way string concat tree
  * per window — which is the hot loop of every near-dedup operator
  * (MinHash signatures + Jaccard verification shingle the whole corpus).
  * This expression emits one tight Java loop via doGenCode. The heavy
  * allocation of the interpreted path also mattered operationally: it
  * drove G1 young collections whose safepoints are disproportionately
  * expensive on virtualized hosts with slow thread wakeup.
  *
  * Semantics are BIT-IDENTICAL to the HOF pipeline it replaces (which is
  * what the DuckDB oracle mirrors — see DedupQueries.sqlShingles):
  *  - windows run i = 0 … size-n (empty result when size < n, matching
  *    `greatest(size, n) - n` + NULL-get filtering);
  *  - a NULL token poisons its windows (concat semantics), and poisoned
  *    windows are dropped (the isNotNull filter);
  *  - the separator is a single space, matching both engines' literals.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val cap = math.max(m - n + 1, 0)
    val tmp = new Array[AnyRef](cap)
    var cnt = 0
    var i = 0
    while (i + n <= m) {
      var ok = true
      var j = 0
      while (ok && j < n) {
        if (toks.isNullAt(i + j)) ok = false
        j += 1
      }
      if (ok) {
        val parts = new Array[UTF8String](2 * n - 1)
        var k = 0
        while (k < n) {
          parts(2 * k) = toks.getUTF8String(i + k)
          if (k < n - 1) parts(2 * k + 1) = Shingles.Space
          k += 1
        }
        tmp(cnt) = UTF8String.concat(parts: _*)
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val space = ctx.addReferenceObj("space", Shingles.Space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val cap = ctx.freshName("cap")
      val tmp = ctx.freshName("tmp")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      val parts = ctx.freshName("parts")
      val u = classOf[UTF8String].getName
      s"""
         |final int $m = $a.numElements();
         |final int $cap = java.lang.Math.max($m - $n + 1, 0);
         |final $u[] $tmp = new $u[$cap];
         |int $cnt = 0;
         |for (int $i = 0; $i + $n <= $m; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($i + $j)) { $ok = false; break; }
         |  }
         |  if ($ok) {
         |    final $u[] $parts = new $u[${2 * n - 1}];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[2 * $j] = $a.getUTF8String($i + $j);
         |      if ($j < $n - 1) $parts[2 * $j + 1] = $space;
         |    }
         |    $tmp[$cnt++] = $u.concat($parts);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($tmp, $cnt));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  private[graft] val Space: UTF8String = UTF8String.fromString(" ")

  /** (identifier, info, builder) tuple for SparkSessionExtensions
    * .injectFunction / FunctionRegistry registration:
    * `graft_shingles(tokens, n)` with n a foldable int literal. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[Shingles].getName, null, "graft_shingles"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_shingles takes exactly 2 arguments")
      val n = args(1) match {
        case Literal(v: Int, IntegerType) => v
        case other =>
          throw new IllegalArgumentException(
            s"graft_shingles width must be an int literal, got $other")
      }
      Shingles(args.head, n)
    })
}

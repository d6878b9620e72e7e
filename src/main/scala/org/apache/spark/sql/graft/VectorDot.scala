// Hosted under org.apache.spark.sql because the expression type-check
// surface (AbstractDataType / TypeCollection) is private[sql] — the
// standard packaging pattern for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns.
  *
  * Exists for a measured reason: the composable formulation
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)`) runs on the interpreted higher-order-
  * function path — per-element closure dispatch and boxing — which is
  * the hot loop of every similarity operator. This expression emits a
  * tight primitive Java loop via doGenCode instead (with an identical
  * interpreted eval for completeness).
  *
  * Semantics are kept BIT-IDENTICAL to the fold it replaces, which is
  * what the DuckDB oracle mirrors (`list_reduce(list_prepend(0.0,
  * list_transform(list_zip(a, b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2]
  * AS DOUBLE))), (acc, x) -> acc + x)`):
  *  - elements are widened to double BEFORE multiplying;
  *  - accumulation is a left fold in element order (same IEEE-754
  *    operation sequence → same bits);
  *  - a NULL element or length mismatch yields NULL (zip_with pads the
  *    shorter side with NULL and NULL poisons the fold).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_vector_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (xs.numElements() != ys.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = lt match {
        case FloatType => xs.getFloat(i).toDouble
        case _ => xs.getDouble(i)
      }
      val y = rt match {
        case FloatType => ys.getFloat(i).toDouble
        case _ => ys.getDouble(i)
      }
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType) = t match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    val (ga, gb) = (getter(elemType(left)), getter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (double)($a.$ga($i)) * (double)($b.$gb($i));
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** (identifier, info, builder) tuple for SparkSessionExtensions
    * .injectFunction / FunctionRegistry registration. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, null, "graft_vector_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_vector_dot takes exactly 2 arguments")
      VectorDot(args.head, args(1))
    })
}

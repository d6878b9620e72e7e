package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{BpeTokenCount, Shingles, TokenHashStats, VectorDot}

/** Engine extension point (spark.sql.extensions=graft.functions
  * .GraftExtensions): registers the native expressions so they resolve
  * as SQL functions and through functions.call_function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorDot.registration)
    ext.injectFunction(Shingles.registration)
    ext.injectFunction(TokenHashStats.registration)
    ext.injectFunction(GraftExtensions.bpeCountRegistration)
  }
}

object GraftExtensions {
  /** `graft_bpe_count(text)`: the native min-rank BPE kernel bound to
    * the engine's pinned merges table ([[graft.text.Bpe.Merges]]).
    * Binding happens HERE rather than in the expression's companion so
    * the org.apache.spark.sql.graft package stays table-agnostic. */
  val bpeCountRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_count"),
    new ExpressionInfo(classOf[BpeTokenCount].getName, null, "graft_bpe_count"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_bpe_count takes exactly 1 argument")
      BpeTokenCount(args.head, graft.text.Bpe.Merges)
    })
}

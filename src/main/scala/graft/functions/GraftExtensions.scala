package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{Shingles, TokenHashStats, VectorDot}

/** Engine extension point (spark.sql.extensions=graft.functions
  * .GraftExtensions): registers the native expressions so they resolve
  * as SQL functions and through functions.call_function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorDot.registration)
    ext.injectFunction(Shingles.registration)
    ext.injectFunction(TokenHashStats.registration)
  }
}

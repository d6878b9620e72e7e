package graft.tools

import org.apache.spark.sql.functions.col
import graft.Sessions

/** Scratch diagnostic (r19): build a 2-epoch incremental-ANN state at
  * a small SF and print the formatted plan of the standing layer-0
  * read — the frame whose fold strategy the r19 optimization round
  * changed (collect_set array fold → spill-safe rank window on the
  * unscoped path). Usage: runMain graft.tools.AnnPlanDump [sfDir]
  */
object AnnPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    val dir = java.nio.file.Files.createTempDirectory("annplan").toString
    val vecs = graft.Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding")
    for (b <- 0L to 1L)
      graft.streaming.IncrementalAnn.processBatch(
        vecs.filter(col("vec_id") % 2 === b),
        s"$dir/index", s"$dir/cands", b)
    println("========== standingLayer0 ==========")
    graft.streaming.IncrementalAnn
      .standingLayer0(spark, s"$dir/cands")
      .explain("formatted")
    spark.stop()
  }
}

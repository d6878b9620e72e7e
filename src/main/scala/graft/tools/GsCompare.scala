package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: scored-candidate counts per probe for the
  * HNSW descent entry vs the retired bucket-seeded entry, same
  * layer-0 graph, same beam parameters. */
object GsCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    val t = Tables(spark, sfDir)
    val (oldC, oldR) = graft.sim.SimilarityQueries.gsProbeStats(t,
      useDescent = false)
    println(s"[gscompare] buckets 4x32: scored=$oldC recallMean=$oldR")
    for ((h, b) <- Seq((6, 8), (7, 8), (6, 9), (7, 9), (8, 8))) {
      val (c, r) = graft.sim.SimilarityQueries.gsProbeStats(t,
        useDescent = true, hops = h, beam = b)
      println(s"[gscompare] descent ${h}x$b: scored=$c recallMean=$r")
    }
    spark.stop()
  }
}

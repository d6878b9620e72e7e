package graft.tools

import graft.{Sessions, SparkEntry}

/** Diagnostic: run one declared query N times in one JVM, print each
  * wall time — isolates run-to-run variance (GC, codegen, host) from
  * plan cost. Not part of the driver contract.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobs.remove(e.jobId)
          jobLog.add((e.jobId, (System.nanoTime() - t0) / 1e9))
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Host-health stamp (same probe Bench adjudicates flags with):
    // compare against steady_states.json's host_cpu_ms before trusting
    // any minimum from this window.
    println(f"[benchone] host_cpu_ms: ${graft.Bench.cpuProbeMillis()}%.1f")
    for (q <- name.split(',').map(_.trim).filter(_.nonEmpty)) {
      // Stream cells (BenchStreams) run by the same name scheme as
      // declared queries; their wall time includes their own writes.
      val streamCell = graft.BenchStreams.cells.find(_._1 == q)
      val fn = if (streamCell.isEmpty) SparkEntry.queries(q) else null
      val walls = for (i <- 1 to n) yield {
        jobLog.clear()
        val t0 = System.nanoTime()
        streamCell match {
          case Some(cell) => graft.BenchStreams.runCell(spark, sfDir, cell)
          case None =>
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener drain
        import scala.jdk.CollectionConverters._
        val js = jobLog.asScala.toSeq.sortBy(_._1)
        val jobSum = js.map(_._2).sum
        println(f"[benchone] $q run $i: $wall%.2f s wall, $jobSum%.2f s in ${js.size} jobs, gap ${wall - jobSum}%.2f s")
        println("[benchone]   jobs: " + js.map { case (id, s) => f"$id:$s%.2f" }.mkString(" "))
        wall
      }
      println(f"[benchone] $q MIN of $n: ${walls.min}%.2f s")
    }
    spark.stop()
  }
}

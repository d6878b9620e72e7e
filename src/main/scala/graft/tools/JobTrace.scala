package graft.tools

import graft.Sessions

/** Scratch diagnostic: run one BenchStreams cell (or declared query)
  * and print every Spark job's wall time, description and call site —
  * where a loop cell's job floor actually comes from.
  * Usage: runMain graft.tools.JobTrace <cellName> [phaseMarks...] */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          val lines = e.stageInfos.headOption.map(_.details)
            .getOrElse("").linesIterator.toSeq
          val graftFrames = lines.filter(_.contains("graft."))
          val site =
            if (graftFrames.nonEmpty) graftFrames.take(2).mkString(" <- ")
            else lines.take(2).mkString(" <- ")
          val frames = desc.fold(site)(d => s"$d || $site")
          starts.put(e.jobId,
            (System.nanoTime(), s"${e.stageInfos.length}st $frames"))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          // A job-end without a recorded start (listener registered
          // after the job began, or events dropped under bus pressure)
          // must not MatchError inside the listener and lose the line.
          Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
            println(f"[jobtrace] job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s $desc")
          }
        }
      })
    val cell = graft.BenchStreams.cells.find(_._1 == name)
    val dir = java.nio.file.Files
      .createTempDirectory(s"jobtrace-$name").toString
    val t0 = System.nanoTime()
    cell match {
      case Some(c) => c._2(spark, sfDir, dir)
      case None => graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    Thread.sleep(300)
    println(f"[jobtrace] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

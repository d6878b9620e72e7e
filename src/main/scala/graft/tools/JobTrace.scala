package graft.tools

import graft.Sessions

/** Scratch diagnostic: run one BenchStreams cell and print every Spark
  * job's call site — where a loop cell's job floor actually comes
  * from. Usage: runMain graft.tools.JobTrace <cellName> */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val lines = e.stageInfos.headOption.map(_.details)
            .getOrElse("").linesIterator.toSeq
          val graftFrames = lines.filter(_.contains("graft."))
          val frames =
            if (graftFrames.nonEmpty) graftFrames.take(3).mkString(" <- ")
            else lines.take(3).mkString(" <- ")
          println(s"[jobtrace] job ${e.jobId}: ${e.stageInfos.length}st " +
            frames)
        }
      })
    val cell = graft.BenchStreams.cells.find(_._1 == name).get
    val dir = java.nio.file.Files
      .createTempDirectory(s"jobtrace-$name").toString
    cell._2(spark, sfDir, dir)
    spark.stop()
  }
}

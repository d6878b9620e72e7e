package graft

/** Benchmark main: runs every declared query at the env-selected scale
  * factor and prints one JSON line of per-query wall times.
  *
  * Action is the noop sink, not count() — count() lets Catalyst prune
  * every column (and elide sorts), so it would time a cheaper plan than
  * the one Verify hashes. The noop sink evaluates every output
  * expression and discards rows at the sink, which is the standard way
  * to measure plan cost without I/O.
  *
  * Failures are NOT folded into timings: a failed query reports -1 and
  * is excluded from the total, so a regression reads as a missing
  * number, never as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.cpusFromEnv)
    // Warmup: exercise the scan + shuffle + codegen paths once so the
    // first timed query doesn't absorb JVM/JIT and session start cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    // Best-of-2 per query: a single-JVM local[32] run shares the host
    // with whatever else is bursting; the min of two runs measures the
    // plan, not the interference.
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = once(name, fn)
      val b = if (a >= 0) once(name, fn) else -1.0
      name -> (if (a >= 0 && b >= 0) math.min(a, b) else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

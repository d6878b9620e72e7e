package graft

/** Plan-audit main: prints the formatted physical plan for each declared
  * query (or the names passed as args) so scan pruning (PushedFilters /
  * ReadSchema), join strategies, TakeOrderedAndProject and
  * WholeStageCodegen coverage can be eyeballed per query.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("4")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

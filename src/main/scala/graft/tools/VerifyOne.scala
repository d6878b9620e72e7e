package graft.tools

import graft.{Sessions, SparkEntry, Verify}

/** Single-query correctness dump for the local iteration loop: same
  * output contract as [[graft.Verify]] (result parquet + oracle_sql.json
  * holding just this query), so `tools/check_oracle.py` can compare one
  * query in seconds instead of re-running all of them.
  *
  * Usage: runMain graft.tools.VerifyOne <name>[,<name>...] <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = Sessions.local(Sessions.cpusFromEnv)
    new java.io.File(outDir).mkdirs()
    val picked = names.split(',').toSeq
    picked.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    Verify.writeOracleSql(
      outDir, SparkEntry.oracleSql.view.filterKeys(picked.contains).toMap)
    spark.stop()
  }
}

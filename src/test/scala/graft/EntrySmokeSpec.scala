package graft

/** Full-surface smoke at sf0.001: the flagship entry returns rows and
  * every declared query executes (correctness vs DuckDB is the driver's
  * job; this catches runtime regressions before a round ends).
  *
  * GRAFT_SMOKE_SF_DIR overrides the data dir so the same suite gates
  * larger scale factors — the testdata can be regenerated between
  * commits (round 7 lost two queries to a TIMESTAMP_NTZ drift this
  * suite caught), so run it against every sf dir before submitting. */
class EntrySmokeSpec extends SparkSpec {

  private val sf = sys.env.getOrElse("GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at the target sf") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.length == names.length)
  }
}

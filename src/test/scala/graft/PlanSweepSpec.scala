package graft

/** Whole-board physical-plan invariant: NO declared query may plan a
  * CartesianProduct. Every intended cross join in the repo is a hinted
  * 1-row broadcast (BroadcastNestedLoopJoin with a scalar build side —
  * the enrich pattern); an unhinted CartesianProductExec means a join
  * lost its keys or a hint regressed, which at 100 TB is an O(n²) run
  * away. EntrySmokeSpec proves every query RUNS; this proves none of
  * them would run quadratically. */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.allQueries.flatMap { q =>
      val plan = q.impl(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning cartesian products: ${offenders.mkString(", ")}")
  }
}

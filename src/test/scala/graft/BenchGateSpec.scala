package graft

import org.scalatest.funsuite.AnyFunSuite

/** The steady-state regression gate is a pure function over the bench
  * results and the recorded-steadies file — pinned here so the gate
  * that guards every future round is itself guarded. */
class BenchGateSpec extends AnyFunSuite {

  private def steadyFile(sf: String, cells: (String, Double)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("bench-gate")
    val f = dir.resolve("steady_states.json")
    val qs = cells.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    java.nio.file.Files.write(f,
      s"""{"sf": "$sf", "queries": {$qs}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toString
  }

  test("flag rule: 1.5x steady + 0.25s, inclusive below") {
    assert(!Bench.isRegression(1.75, 1.0))  // exactly at the line
    assert(Bench.isRegression(1.76, 1.0))
    // the absolute floor absorbs jitter on sub-second cells
    assert(!Bench.isRegression(0.39, 0.1))
    assert(Bench.isRegression(0.41, 0.1))
  }

  test("cells are flagged only at the recorded SF, with failed cells ignored") {
    val f = steadyFile("sf0.1", "a" -> 1.0, "b" -> 1.0)
    val results = Map("a" -> 2.0, "b" -> 1.2, "c" -> 99.0, "d" -> -1.0)
    val flagged = Bench.flaggedCells(results, "/data/sf0.1", f)
    // a regressed; b inside the envelope; c has no steady; d failed.
    assert(flagged == Map("a" -> ((2.0, 1.0))))
    // Same results at a different SF: the gate stands down entirely.
    assert(Bench.flaggedCells(results, "/data/sf0.01", f).isEmpty)
    // Trailing slash on the run dir must not defeat the SF match.
    assert(Bench.flaggedCells(results, "/data/sf0.1/", f).nonEmpty)
  }

  test("a missing or malformed steady file degrades to no flags, never a failure") {
    assert(Bench.flaggedCells(Map("a" -> 9.0), "/data/sf0.1",
      "/nonexistent/steady.json").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bench-gate-bad")
    val bad = dir.resolve("steady_states.json")
    java.nio.file.Files.write(bad, "not json".getBytes("UTF-8"))
    assert(Bench.flaggedCells(Map("a" -> 9.0), "/data/sf0.1",
      bad.toString).isEmpty)
  }

  test("adjudication clears a flag on the first clean retry and stops " +
      "retrying — the reported time is the post-retry min") {
    var runs = Map.empty[String, Int]
    // First retry of 'a' lands in a clean window (0.9 s, under gate).
    val rerun: String => Double = n => { runs += n -> (runs.getOrElse(n, 0) + 1); 0.9 }
    val (surviving, minima) = Bench.adjudicateFlags(
      Map("a" -> ((3.0, 1.0))), rerun, () => 42.0, steadyCpuMs = 42.4)
    assert(surviving.isEmpty, "a cleared flag must not reach the JSON")
    assert(runs("a") == 1, "retrying must stop as soon as the min clears")
    assert(minima("a") == 0.9, "the cell's reported time takes the retry min")
  }

  test("a persistent flag survives with its retries and host stamp") {
    val rerun: String => Double = _ => 2.8 // still over 1.5*1.0+0.25
    var probes = List(84.8, 90.0, 88.0) // degraded host: ~2x steady
    val probe: () => Double =
      () => { val h = probes.head; probes = probes.tail :+ h; h }
    val (surviving, minima) = Bench.adjudicateFlags(
      Map("a" -> ((3.0, 1.0))), rerun, probe, steadyCpuMs = 42.4)
    val r = surviving("a")
    assert(r.runS == 2.8 && r.steadyS == 1.0)
    assert(r.retries == Seq(2.8, 2.8), "both retries recorded")
    assert(r.hostCpuMs == 84.8, "stamp is the best probe around the retries")
    assert(math.abs(r.hostFactor - 2.0) < 0.01,
      "host_factor = probe / recorded clean steady")
    assert(minima("a") == 2.8)
  }

  test("a failed retry (-1) never lowers the min; unrecorded host steady " +
      "reads factor -1") {
    val rerun: String => Double = _ => -1.0
    val (surviving, minima) = Bench.adjudicateFlags(
      Map("a" -> ((3.0, 1.0))), rerun, () => 42.0, steadyCpuMs = -1.0)
    assert(surviving("a").runS == 3.0 && minima("a") == 3.0)
    assert(surviving("a").hostFactor == -1.0)
  }
}

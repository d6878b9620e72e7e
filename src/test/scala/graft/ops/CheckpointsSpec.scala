package graft.ops

import graft.{SparkEntry, SparkSpec}

/** The config-gated reliable-checkpoint swap ([[Checkpoints]]): by
  * default every lineage cut is a localCheckpoint (fail-loud on
  * executor loss); with `graft.checkpoint.dir` set, the same cuts write
  * reliable checkpoints that survive executor loss. The gate must not
  * change any query's answer — only where the cut blocks live. */
class CheckpointsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("graft.checkpoint.dir swaps cuts to reliable checkpoints, same answer") {
    val dir = tmpDir("graft-reliable-ckpt")
    val baseline = SparkEntry.queries("dedup_components")(spark, sf)
      .collect().map(_.toString).sorted
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val gated = SparkEntry.queries("dedup_components")(spark, sf)
        .collect().map(_.toString).sorted
      assert(gated.sameElements(baseline),
        "reliable-checkpoint mode changed the query answer")
      // The cuts really went to the reliable store: the checkpoint dir
      // must contain materialized RDD checkpoint data.
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files written under $dir")
    } finally spark.conf.unset(Checkpoints.DirKey)
  }

  test("default (key unset) cuts preserve data, eager and lazy") {
    assert(spark.conf.get(Checkpoints.DirKey, "").isEmpty)
    val df = spark.range(10).toDF("id")
    assert(Checkpoints.cut(df).count() == 10)
    assert(Checkpoints.cut(df, eager = false).count() == 10)
  }
}

package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gap replay landing through per-partition snapshot commits: plans
  * from storage, converges through crashes, corrects in place, and a
  * reader racing a backfill keeps its pinned view — the catchup-knob
  * the reference DAG (`catchup=False`) hands to its operator. */
class BackfillSpec extends SparkSpec {

  // Hour-partitioned synthetic table: hour h holds rows h*10..h*10+9.
  private def hourFrame(s: SparkSession, h: String): DataFrame = {
    import s.implicits._
    (0 until 10).map(i => (h.toInt * 10 + i, h)).toDF("v", "hour")
  }

  // Reads go through the pinned-manifest table reader (the plain
  // spark.read.parquet(dir) of the directory-swap era can no longer
  // parse a table whose touched partitions carry manifests).
  private def tableRows(dir: String): Set[(Int, String)] =
    Backfill.readTable(spark, dir, "hour").collect()
      .map(r => (r.getAs[Int]("v"),
        String.valueOf(r.getAs[Any]("hour")))).toSet

  private val hours = Seq("0", "1", "2", "3", "4")

  test("plan derives from storage; only gaps replay; re-run is a no-op") {
    val dir = tmpDir("backfill") + "/t"
    for (h <- Seq("0", "1", "3")) // hole at 2 and 4
      Sinks.overwritePartitions(hourFrame(spark, h), dir, "hour")
    assert(Backfill.missingPartitions(spark, dir, "hour", hours)
      == Seq("2", "4"))
    var computed = Vector.empty[String]
    val r = Backfill.run(spark, dir, "hour", hours) { (s, h) =>
      computed :+= h; hourFrame(s, h)
    }
    assert(r.replayed == Seq("2", "4") && computed == Vector("2", "4"),
      "only the gaps may be recomputed")
    assert(r.skipped.toSet == Set("0", "1", "3"))
    assert(tableRows(dir) ==
      (0 until 50).map(v => (v, (v / 10).toString)).toSet)
    // Converged: the next run finds nothing to do and computes nothing.
    val r2 = Backfill.run(spark, dir, "hour", hours)(
      (_, h) => fail(s"no gap left, must not recompute $h"))
    assert(r2.replayed.isEmpty && r2.forced.isEmpty)
  }

  test("a crashed partial replay converges on re-run") {
    val dir = tmpDir("backfill-crash") + "/t"
    for (h <- Seq("0", "3")) // holes at 1, 2, 4
      Sinks.overwritePartitions(hourFrame(spark, h), dir, "hour")
    // First attempt dies after landing hour 1 (mid-outage re-crash).
    intercept[RuntimeException] {
      Backfill.run(spark, dir, "hour", hours) { (s, h) =>
        if (h == "2") throw new RuntimeException("spark died")
        hourFrame(s, h)
      }
    }
    assert(Backfill.existingPartitions(spark, dir, "hour")
      == Set("0", "1", "3"), "completed partitions survive the crash")
    // The re-run's plan no longer contains hour 1: it fills 2 and 4
    // and the table converges to the no-crash result.
    val r = Backfill.run(spark, dir, "hour", hours)((s, h) => hourFrame(s, h))
    assert(r.replayed == Seq("2", "4"))
    assert(tableRows(dir) ==
      (0 until 50).map(v => (v, (v / 10).toString)).toSet)
  }

  test("force recomputes exactly the named partitions (late-data correction)") {
    val dir = tmpDir("backfill-force") + "/t"
    for (h <- hours)
      Sinks.overwritePartitions(hourFrame(spark, h), dir, "hour")
    import spark.implicits._
    val r = Backfill.run(spark, dir, "hour", hours, force = Seq("1")) {
      (s, h) => Seq((999, h)).toDF("v", "hour")
    }
    assert(r.forced == Seq("1") && r.replayed.isEmpty)
    assert(tableRows(dir) ==
      ((0 until 50).filter(v => v / 10 != 1).map(v => (v, (v / 10).toString))
        :+ (999, "1")).toSet,
      "only hour 1 was swapped; every other partition untouched")
  }

  test("a compute straying outside its partition is refused before writing") {
    val dir = tmpDir("backfill-stray") + "/t"
    Sinks.overwritePartitions(hourFrame(spark, "0"), dir, "hour")
    val before = tableRows(dir)
    val e = intercept[IllegalArgumentException] {
      Backfill.run(spark, dir, "hour", Seq("0", "1")) { (s, h) =>
        hourFrame(s, h).withColumn("hour", lit("0")) // clobbers hour 0
      }
    }
    assert(e.getMessage.contains("refusing"))
    assert(tableRows(dir) == before, "nothing may have been written")
  }

  test("escaped partition values (':' hour stamps) round-trip; re-run is a no-op") {
    val dir = tmpDir("backfill-escape") + "/t"
    import spark.implicits._
    val hrs = Seq("2024-01-01T00:00", "2024-01-01T01:00")
    def frame(h: String) = Seq((1, h)).toDF("v", "hour")
    Sinks.overwritePartitions(frame(hrs.head), dir, "hour")
    // The ':' is %3A on disk; the plan must still see the partition.
    assert(Backfill.existingPartitions(spark, dir, "hour") == Set(hrs.head))
    val r = Backfill.run(spark, dir, "hour", hrs)((s, h) => frame(h))
    assert(r.replayed == Seq(hrs(1)) && r.skipped == Seq(hrs.head))
    val r2 = Backfill.run(spark, dir, "hour", hrs)(
      (_, h) => fail(s"converged table must not recompute $h"))
    assert(r2.replayed.isEmpty && r2.skipped.toSet == hrs.toSet)
  }

  test("an unknown force partition is refused, not silently dropped") {
    val dir = tmpDir("backfill-unknown") + "/t"
    Sinks.overwritePartitions(hourFrame(spark, "0"), dir, "hour")
    val e = intercept[IllegalArgumentException] {
      Backfill.run(spark, dir, "hour", Seq("0"), force = Seq("25")) {
        (s, h) => hourFrame(s, h)
      }
    }
    assert(e.getMessage.contains("25"))
  }

  test("a reader racing a force backfill keeps its pinned snapshot view") {
    val dir = tmpDir("backfill-race") + "/t"
    for (h <- Seq("0", "1"))
      Sinks.overwritePartitions(hourFrame(spark, h), dir, "hour")
    // Land hour 1 as a snapshot commit so a manifest exists to pin.
    Backfill.run(spark, dir, "hour", hours.take(2), force = Seq("1"))(
      (s, h) => hourFrame(s, h))
    val reader = Backfill.readTable(spark, dir, "hour")
    val pinned = reader.collect()
      .map(r => (r.getAs[Int]("v"),
        String.valueOf(r.getAs[Any]("hour")))).toSet
    // A correction lands UNDER the running reader — the directory-swap
    // landing this replaced would delete the files the reader holds.
    import spark.implicits._
    Backfill.run(spark, dir, "hour", hours.take(2), force = Seq("1")) {
      (s, h) => Seq((999, h)).toDF("v", "hour")
    }
    assert(reader.collect()
      .map(r => (r.getAs[Int]("v"),
        String.valueOf(r.getAs[Any]("hour")))).toSet == pinned,
      "the pinned plan must keep reading its resolved snapshot files")
    // A fresh resolve sees the correction; hour 0 is untouched.
    assert(tableRows(dir) ==
      ((0 until 10).map(v => (v, "0")) :+ (999, "1")).toSet)
  }

  test("a crash between adopt and overwrite still reads correctly and " +
      "converges on the operator's re-force") {
    val dir = tmpDir("backfill-adopt-crash") + "/t"
    for (h <- Seq("0", "1"))
      Sinks.overwritePartitions(hourFrame(spark, h), dir, "hour")
    // Plant the crash state by hand: the adopt commit landed, the
    // overwrite never did. The adopted head's files lack the hour
    // column (pre-format partitioned writes) — readTable must identify
    // the bare-path manifest and attach the dir-derived value.
    SnapshotTable.adopt(spark, s"$dir/hour=1")
    assert(tableRows(dir) ==
      (0 until 20).map(v => (v, (v / 10).toString)).toSet,
      "the adopted-head crash state must read as the pre-crash data")
    // The interrupted correction is simply re-run and converges.
    import spark.implicits._
    Backfill.run(spark, dir, "hour", Seq("0", "1"), force = Seq("1")) {
      (s, h) => Seq((999, h)).toDF("v", "hour")
    }
    assert(tableRows(dir) ==
      ((0 until 10).map(v => (v, "0")) :+ (999, "1")).toSet)
  }

  test("force on a plain partition keeps the pre-correction state " +
      "manifest-referenced through the grace window") {
    val dir = tmpDir("backfill-grace") + "/t"
    Sinks.overwritePartitions(hourFrame(spark, "0"), dir, "hour")
    import spark.implicits._
    Backfill.run(spark, dir, "hour", Seq("0"), force = Seq("0")) {
      (s, h) => Seq((999, h)).toDF("v", "hour")
    }
    val pdir = s"$dir/hour=0"
    // Even an aggressive zero-age expire with the default 2-snapshot
    // window must keep the adopted pre-correction files: they are
    // referenced by snapshot 0, not unreferenced orphans.
    SnapshotTable.expire(spark, pdir, keepLast = 2, minAgeMs = 0)
    val snaps = SnapshotTable.snapshots(spark, pdir)
    assert(snaps.length == 2, "adopt + overwrite = two snapshots kept")
    assert(SnapshotTable.read(spark, pdir, Some(snaps.head.id))
      .count() == 10, "the pre-correction state must stay readable")
    assert(SnapshotTable.read(spark, pdir, Some(snaps.last.id))
      .count() == 1)
  }

  test("empty recomputes are reported, not written") {
    val dir = tmpDir("backfill-empty") + "/t"
    Sinks.overwritePartitions(hourFrame(spark, "0"), dir, "hour")
    val r = Backfill.run(spark, dir, "hour", Seq("0", "1")) { (s, h) =>
      hourFrame(s, h).filter(lit(false))
    }
    assert(r.empty == Seq("1") && r.replayed.isEmpty)
    assert(Backfill.existingPartitions(spark, dir, "hour") == Set("0"),
      "an empty frame cannot fill a partition")
  }

  test("a table whose every head snapshot is empty fails loud, not " +
    "with empty.reduceLeft") {
    // Plant the committed-but-empty state: a partition whose head
    // manifest is valid yet lists zero files (hasData is true via
    // head.nonEmpty, but it contributes no frame).
    val dir = tmpDir("backfill-allempty") + "/t"
    val pdir = s"$dir/hour=0"
    val fs = new org.apache.hadoop.fs.Path(pdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$pdir/manifests"))
    val m = fs.create(new org.apache.hadoop.fs.Path(
      s"$pdir/manifests/snap-00000000.manifest"), false)
    m.write("files=0\nrows=0\ncommit\n".getBytes("UTF-8"))
    m.close()
    assert(Backfill.existingPartitions(spark, dir, "hour") == Set("0"))
    val e = intercept[IllegalArgumentException] {
      Backfill.readTable(spark, dir, "hour")
    }
    assert(e.getMessage.contains("empty"),
      s"must name the all-empty-snapshots state, got: ${e.getMessage}")
    // A real partition beside it reads fine (the empty head simply
    // contributes nothing).
    Sinks.overwritePartitions(hourFrame(spark, "1"), dir, "hour")
    assert(tableRows(dir) == (10 until 20).map(v => (v, "1")).toSet)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** End-to-end streaming twin of the reference DAG: raw JSON snapshots
  * landing in a directory flow through BpiTransform into the appended
  * warehouse table; the checkpoint makes file pickup exactly-once
  * across restarts (the reference's manual snapshot-replay story,
  * automated). */
class BpiIngestStreamSpec extends SparkSpec {

  private def fixtureText(name: String): String =
    new String(Files.readAllBytes(Paths.get(fixture(name))), "UTF-8")

  test("snapshots stream through the pipeline into the warehouse, exactly once") {
    val rawDir = tmpDir("bpi-raw")
    val table = tmpDir("bpi-wh") + "/t"
    val ckpt = tmpDir("bpi-ckpt")
    val bpiJson = fixtureText("bpi-raw-data.json")

    Files.writeString(Paths.get(s"$rawDir/tick-1.json"), bpiJson)
    val q1 = Streaming.startBpiIngest(
      spark, rawDir, fixture("rupiah-exchange-rate.json"),
      table, ckpt, "2022-12-18 11:00:00", Trigger.AvailableNow())
    q1.awaitTermination()
    val after1 = spark.read.parquet(table)
    assert(after1.count() == 1)
    assert(after1.columns.length == 15)
    assert(after1.select("bpi_idr_rate_float").head().getDouble(0)
      == 16751.0735 * 15602.5)

    // Second tick lands; restart from checkpoint → only the new file
    // is processed (tick-1 is not re-appended).
    Files.writeString(Paths.get(s"$rawDir/tick-2.json"), bpiJson)
    val q2 = Streaming.startBpiIngest(
      spark, rawDir, fixture("rupiah-exchange-rate.json"),
      table, ckpt, "2022-12-18 12:00:00", Trigger.AvailableNow())
    q2.awaitTermination()
    val after2 = spark.read.parquet(table)
    assert(after2.count() == 2)
    assert(after2.select("last_updated").distinct().count() == 2)
  }

  test("an invalid snapshot aborts the micro-batch (validation gate parity)") {
    val rawDir = tmpDir("bpi-raw-bad")
    val table = tmpDir("bpi-wh-bad") + "/t"
    val bad = fixtureText("bpi-raw-data.json")
      .replace("\"Bitcoin\"", "\"Ethereum\"")
    Files.writeString(Paths.get(s"$rawDir/tick-1.json"), bad)
    val q = Streaming.startBpiIngest(
      spark, rawDir, fixture("rupiah-exchange-rate.json"),
      table, tmpDir("bpi-ckpt-bad"), "2022-12-18 11:00:00",
      Trigger.AvailableNow())
    val e = intercept[Exception](q.awaitTermination())
    assert(e.getMessage.contains("chartName_is_Bitcoin")
      || Option(e.getCause).exists(_.getMessage.contains("chartName_is_Bitcoin")))
    // The directory may exist (task-attempt temp files) but no data
    // file was ever committed.
    val committed = Option(new java.io.File(table).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(committed.isEmpty)
  }
}

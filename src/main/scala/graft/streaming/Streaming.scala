package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.etl.Sinks

/** Streaming surface (SURVEY.md §2.6). The reference's streaming story
  * is an hourly Airflow trigger (`schedule='@hourly'`,
  * bpi_etl_bigquery.py:27) appending one record per tick; the Spark
  * re-expression is Structured Streaming with a processing-time trigger,
  * plus the things the reference never had: watermarked event-time
  * windows and checkpointed exactly-once recovery (its manual
  * snapshot-and-replay, :80-84, made principled).
  */
object Streaming {

  /** Tumbling event-time aggregate with a watermark — the streaming twin
    * of the `window_tumbling` batch query. State is bounded by the
    * watermark: at 100 TB/day the store holds only open windows, and the
    * shuffle is keyed by window start (low cardinality, pre-aggregated
    * map-side). */
  def hourlyTumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("n_events"), col("sum_value"))

  /** Hourly micro-batch cadence (the `@hourly` schedule, :27). */
  val HourlyTrigger: Trigger = Trigger.ProcessingTime("1 hour")

  /** Stream-stream interval join: each left event pairs with right
    * events for the same key whose timestamps land within
    * [left.ts, left.ts + `horizon`] — the streaming form of
    * `join_range`'s bin-composed batch join (click→purchase
    * attribution, request→response correlation). Both sides carry
    * watermarks, and the time-bound join condition is what lets Spark
    * evict buffered rows once the watermark passes the interval — the
    * state-boundedness contract that keeps a stream-stream join viable
    * at 100 TB/day; an unbounded-condition join would buffer both
    * streams forever. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String, horizon: String,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withWatermark("ts", watermark)
    l.as("l").join(
      r.as("r"),
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $horizon"))
  }

  /** Stream-static enrichment join: each micro-batch broadcast-joins a
    * STATIC dimension (here: a user→segment lookup) — the streaming
    * form of `join_broadcast`, and the standard "enrich events with
    * reference data" step in front of any streaming aggregate. No
    * state store is involved at all: the static side is planned as a
    * broadcast per micro-batch, so there is nothing to watermark and
    * nothing to evict — which is why this join stays O(batch) at
    * 100 TB/day while a mis-declared stream-stream join of the same
    * data would buffer forever. Inner joins need no output-mode
    * caveats; the result composes with downstream watermarked windows
    * unchanged. */
  def enrichWithStatic(
      events: DataFrame,
      dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** Streaming exact dedup on an id key: duplicates arriving within the
    * watermark horizon are dropped across micro-batches — the streaming
    * twin of `dedup_exact`, and the idempotence layer an at-least-once
    * upstream (retried fetches, replayed snapshots — the reference's
    * manual-replay story, :80-84) needs before the append sink. State is
    * bounded: `dropDuplicatesWithinWatermark` evicts ids once the
    * watermark passes them, so the store holds one horizon's worth of
    * keys, not the stream's history — the property that keeps this
    * viable at 100 TB/day. */
  def dedupWithinWatermark(
      events: DataFrame,
      idCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Append sink with checkpointed recovery: foreachBatch → parquet
    * append (the WRITE_APPEND load, :279-291), checkpoint directory for
    * restart-without-reprocessing (the raw-snapshot replay story made
    * automatic). Caller picks the trigger (tests: AvailableNow). */
  def appendWriter(
      df: DataFrame,
      tableDir: String,
      checkpointDir: String,
      trigger: Trigger = HourlyTrigger): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) Sinks.appendParquet(batch.toDF(), tableDir)
      }

  def startAppend(
      df: DataFrame,
      tableDir: String,
      checkpointDir: String,
      trigger: Trigger = HourlyTrigger): StreamingQuery =
    appendWriter(df, tableDir, checkpointDir, trigger).start()

  /** The reference DAG as a stream: raw BPI JSON snapshots arriving in
    * a directory (the GCS raw zone, bpi_etl_bigquery.py:76-84) are
    * picked up per micro-batch, pushed through the full BpiTransform
    * against the validated XR feed, and appended to the warehouse table
    * with pinned nullability — `@hourly` + WRITE_APPEND, with exactly-
    * once file tracking from the checkpoint instead of manual replay. */
  def startBpiIngest(
      spark: org.apache.spark.sql.SparkSession,
      rawDir: String,
      xrJsonPath: String,
      tableDir: String,
      checkpointDir: String,
      lastUpdated: String,
      trigger: Trigger = HourlyTrigger): StreamingQuery = {
    val raw = spark.readStream
      .schema(graft.etl.Schemas.bpi)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", "16")
      .json(rawDir)
    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          // Same validation gate as the batch path (Ingest.readBpi) — a
          // snapshot that would abort the batch pipeline must abort the
          // micro-batch too, not slip NULLs past the pinned schema.
          val checked = graft.etl.Validation.enforce(
            batch.toDF(), graft.etl.Validation.bpiRules)
          val xr = graft.etl.Ingest.readXr(batch.sparkSession, xrJsonPath)
          val out = graft.etl.Sinks.withPinnedSchema(
            graft.etl.BpiTransform(checked, xr, lastUpdated),
            graft.etl.Schemas.bpiXrHourly)
          Sinks.appendParquet(out, tableDir)
        }
      }
      .start()
  }
}

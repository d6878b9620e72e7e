package graft.ops

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Market time-series queries: semantic invariants plus an independent
  * driver-side recomputation of one instrument at fixture scale (the
  * oracle hash-match is the driver's job; these pin the algebra). */
class MarketQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  test("timeseries_ohlc: bar invariants and full coverage") {
    val bars = SparkEntry.queries("timeseries_ohlc")(spark, sf).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
      assert(l <= h && r.getLong(6) > 0)
    }
    val totalTrades = bars.map(_.getLong(6)).sum
    assert(totalTrades == Tables(spark, sf).events.count(),
      "every trade must land in exactly one bar")
    assert(bars.map(r => (r.getString(0), r.getString(1))).distinct.length
      == bars.length, "one bar per (instrument, hour)")
  }

  test("timeseries_ohlc: open/close match the time-ordered first/last trade") {
    val hourMicros = 3600L * 1000000L
    val ev = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts)"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2))))
      .sortBy(t => (t._1, t._2))
    val firstHour = java.time.Instant
      .ofEpochSecond(ev.head._1 / hourMicros * 3600)
    val hourKey = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      .format(firstHour)
    val inHour = ev.takeWhile(_._1 / hourMicros == ev.head._1 / hourMicros)
    val bar = SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .filter(col("event_type") === "purchase" && col("hour") === hourKey)
      .collect().head
    assert(bar.getLong(2) == inHour.head._3, "open = first trade")
    assert(bar.getLong(5) == inHour.last._3, "close = last trade")
    assert(bar.getLong(3) == inHour.map(_._3).max)
    assert(bar.getLong(4) == inHour.map(_._3).min)
    assert(bar.getLong(6) == inHour.length.toLong)
  }

  test("timeseries_vwap: weighted mean stays inside the day's price range") {
    val rows = SparkEntry.queries("timeseries_vwap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) > 0, "volume positive")
      val vwap = r.getDouble(4)
      assert(vwap > 0.0 && vwap ==
        r.getLong(2).toDouble / r.getLong(3).toDouble / 100.0,
        "vwap is exactly pv/vol/100 of the exact integer sums")
    }
  }

  test("timeseries_drawdown matches a driver-side fold per instrument") {
    val got = SparkEntry.queries("timeseries_drawdown")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val ev = Tables(spark, sf).events
      .select(col("event_type"), expr("unix_micros(ts)"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(t => (t._2, t._3)).map(_._4)
      var peak = Long.MinValue
      var maxDd = 0L
      var maxFrac = 0.0
      series.foreach { c =>
        peak = math.max(peak, c)
        maxDd = math.max(maxDd, peak - c)
        maxFrac = math.max(maxFrac, (peak - c).toDouble / peak.toDouble)
      }
      val (n, p, dd, frac) = got(et)
      assert(n == series.length.toLong && p == series.max &&
        dd == maxDd && frac == maxFrac, s"drawdown mismatch for $et")
    }
  }

  test("timeseries_ohlc_daily: bars composed from hourly bars equal " +
      "bars computed from raw trades") {
    val fromHourly = SparkEntry.queries("timeseries_ohlc_daily")(spark, sf)
      .collect().map(_.toSeq)
    // direct daily bars: the hourly query's algebra at day granularity
    val ev = Tables(spark, sf).events
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
    val dayMicros = 86400L * 1000000L
    val direct = ev.groupBy(t => (t._1, t._2 / dayMicros)).map {
      case ((et, day), rows) =>
        val s = rows.sortBy(t => (t._2, t._3)).map(_._4)
        val dayStr = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(day * 86400L))
        Seq[Any](et, dayStr, s.head, s.max, s.min, s.last, s.length.toLong)
    }.toSeq.sortBy(r => (r(0).toString, r(1).toString))
    assert(fromHourly.toSeq.map(_.toList) == direct.map(_.toList),
      "bar composition must be lossless")
  }

  test("timeseries_rsi: windowed gains/losses match a driver-side fold") {
    val got = SparkEntry.queries("timeseries_rsi")(spark, sf)
      .filter(col("event_type") === "purchase").orderBy("day").collect()
    // daily closes, time-ordered
    val ev = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts)").as("us"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2))))
    val dayMicros = 86400L * 1000000L
    val closes = ev.groupBy(_._1 / dayMicros).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.maxBy(t => (t._1, t._2))._3 }
    val diffs = closes.sliding(2).map(p => p(1) - p(0)).toSeq
    got.zipWithIndex.foreach { case (r, i) =>
      val w = diffs.slice(math.max(0, i - 13), i + 1)
      val g = w.map(d => math.max(d, 0L)).sum
      val l = w.map(d => math.max(-d, 0L)).sum
      assert(r.getLong(3) == g && r.getLong(4) == l,
        s"gain/loss mismatch at row $i")
      val want = if (g + l == 0) 50.0 else 100.0 * g.toDouble / (g + l).toDouble
      assert(r.getDouble(5) == want)
    }
    assert(got.length == closes.length - 1, "one RSI row per day after the first")
  }

  test("ohlc plan: window and bar aggregation share one hash Exchange") {
    val plan = SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected the groupBy to reuse the window's partitioning:\n$plan")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det
import graft.{Q, Tables}

/** Market/price time-series analytics [EXT] — the natural query surface
  * over the reference's domain (`bpi_etl_bigquery.py` lands a bitcoin
  * price-index series; these are the bars/VWAP/drawdown/indicator reads
  * a price pipeline owner runs on that series). `events.value` stands in
  * for the traded price, integerized to exact cents
  * ([[graft.util.Det]]) so every aggregate is bit-identical to the
  * DuckDB oracle.
  *
  * Scale posture: every query is one shuffle on its grouping keys plus,
  * for the indicator family, one ordered window over the CALENDAR-sized
  * daily-close frame (days × instruments rows — metadata, never
  * trades). The shared bar/close machinery lives in [[hourlyBars]] /
  * [[dailyCloses]] / [[dailyReturns]] and their SQL CTE twins, so the
  * determinism-critical rank-within-bar rule exists in exactly one
  * place per engine.
  */
object MarketQueries {

  /** Exact cents as BIGINT — delegates to the shared discipline. */
  private def sqlCents(expr: String): String = Det.sqlUnits(expr, 100)

  // -----------------------------------------------------------------
  // Shared bar machinery. Open/close are picked by rank within the
  // bar — row_number over (ts, event_id) is unique, so min/max-by-rank
  // is engine-deterministic even if two trades share a timestamp. The
  // Spark side reads open/close as min/max of a (rn, cents) struct —
  // order-independent aggregates, no second window pass; the oracle
  // uses arg_min/arg_max on the same unique rank.
  // -----------------------------------------------------------------

  /** CTE `e`: trades ranked within (instrument, `unit` bucket). */
  private def sqlRankedCte(unit: String): String =
    s"""WITH e AS (
       |  SELECT event_type,
       |         date_trunc('$unit', ts) AS $unit,
       |         ${sqlCents("value")} AS cents,
       |         row_number() OVER (
       |           PARTITION BY event_type, date_trunc('$unit', ts)
       |           ORDER BY ts, event_id) AS rn
       |  FROM events
       |)""".stripMargin

  /** CTE chain ending in `daily(event_type, day, close_cents)`. */
  private val sqlDailyCloseCte: String =
    s"""${sqlRankedCte("day")}, daily AS (
       |  SELECT event_type, day, arg_max(cents, rn) AS close_cents
       |  FROM e GROUP BY event_type, day
       |)""".stripMargin

  /** CTE chain ending in `ret(event_type, day, r)` — non-null daily
    * cent returns. */
  private val sqlDailyReturnsCte: String =
    s"""$sqlDailyCloseCte, ret AS (
       |  SELECT event_type, day,
       |         close_cents - lag(close_cents) OVER (
       |           PARTITION BY event_type ORDER BY day) AS r
       |  FROM daily
       |), ok AS (
       |  SELECT * FROM ret WHERE r IS NOT NULL
       |)""".stripMargin

  /** Trades ranked within (instrument, unit bucket) — the Spark twin
    * of [[sqlRankedCte]]. */
  private def ranked(t: Tables, unit: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col(unit))
      .orderBy(col("ts"), col("event_id"))
    t.events
      .select(
        col("event_type"),
        date_trunc(unit, col("ts")).as(unit),
        col("ts"), col("event_id"),
        Det.toUnits(col("value"), 100L).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
  }

  /** Exact hourly bars: (event_type, hour, open/high/low/close cents,
    * n_trades). */
  private def hourlyBars(t: Tables): DataFrame =
    ranked(t, "hour")
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min(struct(col("rn"), col("cents"))).getField("cents")
          .as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(struct(col("rn"), col("cents"))).getField("cents")
          .as("close_cents"),
        count(lit(1)).as("n_trades"))

  /** Exact daily closes: (event_type, day, close_cents). */
  private def dailyCloses(t: Tables): DataFrame =
    ranked(t, "day")
      .groupBy(col("event_type"), col("day"))
      .agg(max(struct(col("rn"), col("cents"))).getField("cents")
        .as("close_cents"))

  /** Non-null daily cent returns: (event_type, day, r). */
  private def dailyReturns(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dailyCloses(t)
      .withColumn("r",
        col("close_cents") - lag(col("close_cents"), 1).over(w))
      .filter(col("r").isNotNull)
      .select(col("event_type"), col("day"), col("r"))
  }

  /** Hourly OHLC bars per instrument (event_type). One shuffle; the
    * bar aggregation reuses the window's hash partitioning (plan-spec
    * pinned to a single hash Exchange). */
  private val timeseriesOhlc = Q(
    "timeseries_ohlc",
    s"""${sqlRankedCte("hour")}
       |SELECT event_type,
       |       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       |       arg_min(cents, rn) AS open_cents,
       |       max(cents) AS high_cents,
       |       min(cents) AS low_cents,
       |       arg_max(cents, rn) AS close_cents,
       |       count(*) AS n_trades
       |FROM e GROUP BY event_type, hour
       |ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
    hourlyBars(Tables(s, dir))
      .select(
        col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "hour")
  }

  /** Daily VWAP per instrument. Volume is the deterministic synthetic
    * `event_id % 10 + 1` (events carry no volume column); the weighted
    * sum is exact integer cents×volume, so the only float op is ONE
    * final divide of two exact integers — identical on both engines
    * (the regr_ols sufficient-statistics discipline). One
    * map-side-combinable aggregate: the shuffle carries 3 numbers per
    * (instrument × day × partition).
    */
  private val timeseriesVwap = Q(
    "timeseries_vwap",
    s"""WITH e AS (
       |  SELECT event_type,
       |         date_trunc('day', ts) AS day,
       |         ${sqlCents("value")} AS cents,
       |         event_id % 10 + 1 AS vol
       |  FROM events
       |)
       |SELECT event_type,
       |       strftime(day, '%Y-%m-%d') AS day,
       |       CAST(sum(cents * vol) AS BIGINT) AS pv_cents,
       |       CAST(sum(vol) AS BIGINT) AS volume,
       |       (CAST(sum(cents * vol) AS DOUBLE)
       |          / CAST(sum(vol) AS DOUBLE)) / 100.0 AS vwap
       |FROM e GROUP BY event_type, day
       |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(
        col("event_type"),
        date_trunc("day", col("ts")).as("day"),
        Det.toUnits(col("value"), 100L).cast("long").as("cents"),
        (col("event_id") % 10 + 1).as("vol"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(col("cents") * col("vol")).as("pv_cents"),
        sum(col("vol")).as("volume"))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("pv_cents"), col("volume"),
        (col("pv_cents").cast("double") / col("volume").cast("double")
          / lit(100.0)).as("vwap"))
      .orderBy("event_type", "day")
  }

  /** Maximum drawdown per instrument: running peak over the
    * (ts, event_id)-ordered series, drawdown = peak - price in exact
    * cents, and the depth both absolute and as a fraction of the peak
    * at that row. The fraction is a per-row divide of two exact
    * integers (deterministic), and MAX over those per-row doubles is
    * order-independent — no float accumulation anywhere.
    *
    * A naive per-instrument window serializes the whole series onto one
    * task (few instruments × many rows — the 10× stress measured that
    * shape at ratio 4.4). The running max is a prefix scan, so it
    * distributes the classic two-level way: (a) running max WITHIN each
    * (instrument, day) chunk — fine-grained parallel windows; (b) a
    * carry-in per chunk = running max over the per-day maxima — a
    * calendar-sized frame (days × instruments rows); (c) row peak =
    * greatest(chunk prefix, carry). The oracle keeps the single global
    * window — identical values, the associativity of max is the proof.
    * ROWS frames pinned explicitly: the default RANGE frame would
    * include peer rows on ties (none exist — event_id is unique — but
    * the contract should not depend on that).
    */
  private val timeseriesDrawdown = Q(
    "timeseries_drawdown",
    s"""WITH e AS (
       |  SELECT event_type, ts, event_id,
       |         ${sqlCents("value")} AS cents
       |  FROM events
       |), dd AS (
       |  SELECT event_type, cents,
       |         max(cents) OVER (PARTITION BY event_type
       |           ORDER BY ts, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS peak_cents
       |  FROM e
       |)
       |SELECT event_type,
       |       count(*) AS n_trades,
       |       max(peak_cents) AS peak_cents,
       |       max(peak_cents - cents) AS max_dd_cents,
       |       max(CAST(peak_cents - cents AS DOUBLE)
       |             / CAST(peak_cents AS DOUBLE)) AS max_dd_frac
       |FROM dd GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val wChunk = Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = Tables(s, dir).events
      .select(
        col("event_type"), col("ts"), col("event_id"),
        date_trunc("day", col("ts")).as("day"),
        Det.toUnits(col("value"), 100L).cast("long").as("cents"))
      .withColumn("chunk_peak", max(col("cents")).over(wChunk))
    val carries = base
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cents")).as("day_max"))
      .withColumn("carry", max(col("day_max")).over(wCarry))
      .select(col("event_type"), col("day"), col("carry"))
    base
      .join(broadcast(carries), Seq("event_type", "day"))
      .withColumn("peak_cents",
        when(col("carry").isNull, col("chunk_peak"))
          .otherwise(greatest(col("chunk_peak"), col("carry"))))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_trades"),
        max(col("peak_cents")).as("peak_cents"),
        max(col("peak_cents") - col("cents")).as("max_dd_cents"),
        max((col("peak_cents") - col("cents")).cast("double")
          / col("peak_cents").cast("double")).as("max_dd_frac"))
      .orderBy("event_type")
  }

  /** Daily bars ROLLED UP FROM the hourly bars — the composition
    * property a 100-TB bar pipeline lives on (bars re-aggregate from
    * finer bars without touching the trade-level data, so the daily
    * job reads ~1/4000th of the rows): open = first hour's open,
    * close = last hour's close, high/low/volume fold. The spec proves
    * the result is IDENTICAL to computing daily bars from raw trades.
    */
  private val timeseriesOhlcDaily = Q(
    "timeseries_ohlc_daily",
    s"""${sqlRankedCte("hour")}, hourly AS (
       |  SELECT event_type, hour,
       |         arg_min(cents, rn) AS open_cents,
       |         max(cents) AS high_cents,
       |         min(cents) AS low_cents,
       |         arg_max(cents, rn) AS close_cents,
       |         count(*) AS n_trades
       |  FROM e GROUP BY event_type, hour
       |)
       |SELECT event_type,
       |       strftime(date_trunc('day', hour), '%Y-%m-%d') AS day,
       |       arg_min(open_cents, hour) AS open_cents,
       |       max(high_cents) AS high_cents,
       |       min(low_cents) AS low_cents,
       |       arg_max(close_cents, hour) AS close_cents,
       |       CAST(sum(n_trades) AS BIGINT) AS n_trades
       |FROM hourly GROUP BY event_type, date_trunc('day', hour)
       |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    hourlyBars(Tables(s, dir))
      .groupBy(col("event_type"), date_trunc("day", col("hour")).as("day"))
      .agg(
        min(struct(col("hour"), col("open_cents"))).getField("open_cents")
          .as("open_cents"),
        max(col("high_cents")).as("high_cents"),
        min(col("low_cents")).as("low_cents"),
        max(struct(col("hour"), col("close_cents"))).getField("close_cents")
          .as("close_cents"),
        sum(col("n_trades")).as("n_trades"))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "day")
  }

  /** 14-day rolling RSI per instrument over the daily closes. Gains and
    * losses are exact cent deltas; the windowed sums are exact integer
    * sums; RSI = 100·gains/(gains+losses) is ONE divide of two exact
    * integers (flat windows pinned to the neutral 50 on both engines).
    * The daily-close input is [[dailyCloses]], so the whole indicator
    * is scan → two one-key shuffles (day bars, then the per-instrument
    * ordered window over the calendar-sized close frame).
    */
  private val timeseriesRsi = Q(
    "timeseries_rsi",
    s"""$sqlDailyCloseCte, delta AS (
       |  SELECT event_type, day, close_cents,
       |         close_cents - lag(close_cents) OVER (
       |           PARTITION BY event_type ORDER BY day) AS diff
       |  FROM daily
       |), gl AS (
       |  SELECT event_type, day, close_cents,
       |         greatest(diff, 0) AS gain,
       |         greatest(-diff, 0) AS loss
       |  FROM delta WHERE diff IS NOT NULL
       |), win AS (
       |  SELECT event_type, day, close_cents,
       |         CAST(sum(gain) OVER (PARTITION BY event_type ORDER BY day
       |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS gain14,
       |         CAST(sum(loss) OVER (PARTITION BY event_type ORDER BY day
       |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS loss14
       |  FROM gl
       |)
       |SELECT event_type,
       |       strftime(day, '%Y-%m-%d') AS day,
       |       close_cents, gain14, loss14,
       |       CASE WHEN gain14 + loss14 = 0 THEN 50.0
       |            ELSE 100.0 * CAST(gain14 AS DOUBLE)
       |                 / CAST(gain14 + loss14 AS DOUBLE) END AS rsi14
       |FROM win ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val wSeries = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wSeries.rowsBetween(-13, Window.currentRow)
    dailyCloses(Tables(s, dir))
      .withColumn("diff",
        col("close_cents") - lag(col("close_cents"), 1).over(wSeries))
      .filter(col("diff").isNotNull)
      .withColumn("gain", greatest(col("diff"), lit(0L)))
      .withColumn("loss", greatest(-col("diff"), lit(0L)))
      .withColumn("gain14", sum(col("gain")).over(w14))
      .withColumn("loss14", sum(col("loss")).over(w14))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("close_cents"), col("gain14"), col("loss14"),
        when(col("gain14") + col("loss14") === 0, lit(50.0))
          .otherwise(lit(100.0) * col("gain14").cast("double")
            / (col("gain14") + col("loss14")).cast("double")).as("rsi14"))
      .orderBy("event_type", "day")
  }

  /** Pairwise correlation of daily returns across instruments — the
    * co-movement matrix a portfolio/risk read starts from. Returns are
    * exact cent diffs ([[dailyReturns]]); each pair's Pearson
    * correlation comes from exact integer sufficient statistics
    * (n, Σx, Σy, Σxx, Σyy, Σxy — the regr_ols discipline) with the
    * only float ops being two IEEE-exact sqrts and one divide,
    * association pinned identically on both engines. The pair join is
    * on the DAY spine of per-instrument daily rows — calendar-sized,
    * never trade-sized; the stats aggregate is map-side-combinable
    * (6 numbers per pair-partition).
    */
  private val timeseriesReturnsCorr = Q(
    "timeseries_returns_corr",
    s"""$sqlDailyReturnsCte, paired AS (
       |  SELECT a.event_type AS et_a, b.event_type AS et_b,
       |         a.r AS x, b.r AS y
       |  FROM ok a JOIN ok b
       |    ON a.day = b.day AND a.event_type < b.event_type
       |), stats AS (
       |  SELECT et_a, et_b,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx,
       |         CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx,
       |         CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM paired GROUP BY et_a, et_b
       |)
       |SELECT et_a, et_b, n,
       |       n * sxy - sx * sy AS cov_num,
       |       CAST(n * sxy - sx * sy AS DOUBLE)
       |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
       |FROM stats ORDER BY et_a, et_b""".stripMargin) { (s, dir) =>
    val ret = dailyReturns(Tables(s, dir))
    val a = ret.select(col("event_type").as("et_a"), col("day"),
      col("r").as("x"))
    val b = ret.select(col("event_type").as("et_b"), col("day"),
      col("r").as("y"))
    val stats = a.join(b, Seq("day"))
      .filter(col("et_a") < col("et_b"))
      .groupBy(col("et_a"), col("et_b"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    stats.select(
        col("et_a"), col("et_b"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"))
            * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double")))).as("corr"))
      .orderBy("et_a", "et_b")
  }

  /** Per-instrument beta against the equal-weight market index:
    * index return per day = SUM of every instrument's cent return
    * (exact integer — an equal-weight index up to the constant 1/N,
    * which cancels in beta), beta_i = cov(r_i, r_m) / var(r_m) from
    * the same exact sufficient statistics as `timeseries_returns_corr`,
    * one divide of exact integers. The index frame is calendar-sized
    * (one row per day) and BROADCAST back onto the per-instrument
    * returns — no shuffle on the join. The instrument count that gates
    * full-coverage days is computed IN-PLAN (a 1-row countDistinct
    * aggregate cross-joined broadcast onto the day frame, mirroring
    * the oracle's scalar subquery), keeping the builder lazy and the
    * plan self-contained — no eager driver action freezes a literal
    * into the plan. Days where any instrument has no trades drop from
    * the index (the honest joint-observation rule, same as the
    * pairwise query).
    */
  private val timeseriesBeta = Q(
    "timeseries_beta",
    s"""$sqlDailyReturnsCte, idx AS (
       |  SELECT day, CAST(sum(r) AS BIGINT) AS rm,
       |         CAST(count(*) AS BIGINT) AS n_inst
       |  FROM ok GROUP BY day
       |  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM ok)
       |), joined AS (
       |  SELECT o.event_type, o.r AS x, i.rm AS y
       |  FROM ok o JOIN idx i ON o.day = i.day
       |), stats AS (
       |  SELECT event_type,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx,
       |         CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM joined GROUP BY event_type
       |)
       |SELECT event_type, n,
       |       n * sxy - sx * sy AS cov_num,
       |       n * syy - sy * sy AS var_den,
       |       CAST(n * sxy - sx * sy AS DOUBLE)
       |         / CAST(n * syy - sy * sy AS DOUBLE) AS beta
       |FROM stats ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.ops.Checkpoints.CheckpointOps
    // read by the index agg AND the join below
    val okC = dailyReturns(Tables(s, dir)).cut(false)
    val nInstruments = okC.agg(
      countDistinct(col("event_type")).as("n_instruments"))
    val idx = okC.groupBy(col("day"))
      .agg(sum(col("r")).as("rm"), count(lit(1)).as("n_inst"))
      .crossJoin(broadcast(nInstruments))
      .filter(col("n_inst") === col("n_instruments"))
      .select(col("day"), col("rm"))
    val stats = okC
      .join(broadcast(idx), Seq("day"))
      .select(col("event_type"), col("r").as("x"), col("rm").as("y"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    stats.select(
        col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("var_den"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")).as("beta"))
      .orderBy("event_type")
  }

  val queries: Seq[Q] =
    Seq(timeseriesOhlc, timeseriesVwap, timeseriesDrawdown,
      timeseriesOhlcDaily, timeseriesRsi, timeseriesReturnsCorr,
      timeseriesBeta)
}

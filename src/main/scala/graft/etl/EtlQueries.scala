package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps
import graft.{Q, Tables}

/** Declared queries derived from the reference's transform surface
  * (SURVEY.md §2.1-2.2). Each mirrors a cited behavior of
  * /root/reference/dags/bpi_etl/bpi_etl_bigquery.py, re-expressed as a
  * declarative Spark plan over the driver test tables so Catalyst can
  * push filters/projections into the parquet scan.
  */
object EtlQueries {

  /** Explicit projection + derived column (reference projection step,
    * bpi_etl_bigquery.py:201-212). Narrow, shuffle-free; the parquet scan
    * reads only the 4 referenced columns.
    */
  private val scanProject = Q(
    "scan_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
      |       l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Row filter by predicate — generalization of the reference's
    * validation gating (SURVEY.md §2.2). Predicate is pushed to the scan.
    */
  private val filterPredicate = Q(
    "filter_predicate",
    """SELECT event_id, user_id, value
      |FROM events
      |WHERE event_type = 'purchase' AND value > 50.0
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .filter(col("event_type") === "purchase" && col("value") > 50.0)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  /** camelCase→snake_case rename (bpi_etl_bigquery.py:216-219): alias to
    * camelCase, then apply the SnakeCase utility; plan-time only.
    */
  private val colRenameSnake = Q(
    "col_rename_snake",
    """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
      |       l_returnflag AS return_flag, l_quantity AS quantity_value
      |FROM lineitem
      |ORDER BY order_key, line_number""".stripMargin) { (s, dir) =>
    val camel = Tables(s, dir).lineitem.select(
      col("l_orderkey").as("orderKey"),
      col("l_linenumber").as("lineNumber"),
      col("l_returnflag").as("returnFlag"),
      col("l_quantity").as("quantityValue"))
    SnakeCase.renameAll(camel).orderBy("order_key", "line_number")
  }

  /** Nested-JSON flatten (pd.json_normalize, bpi_etl_bigquery.py:195):
    * parse the events.props JSON string against a declared schema and
    * surface the nested field as a top-level column.
    */
  private val flattenJson = Q(
    "flatten_json",
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("prop_k"))
      .orderBy("event_id")
  }

  /** Scalar enrichment (bpi_etl_bigquery.py:223-225): the reference's only
    * "join" — a scalar USD→IDR rate applied to every row. General form:
    * cross join against a broadcast 1-row dimension, so at 100 TB the fact
    * side never shuffles.
    */
  private val enrichScalarRate = Q(
    "enrich_scalar_rate",
    """SELECT o_orderkey, rate_base,
      |       o_totalprice * usd_idr AS totalprice_idr
      |FROM orders
      |CROSS JOIN (SELECT 'USD' AS rate_base, CAST(15602.5 AS DOUBLE) AS usd_idr)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    // Fixture rate: FIXTURES.md A2 (rates.IDR = 15602.5).
    val rate = Seq(("USD", 15602.5)).toDF("rate_base", "usd_idr")
    Tables(s, dir).orders
      .crossJoin(broadcast(rate))
      .select(
        col("o_orderkey"), col("rate_base"),
        (col("o_totalprice") * col("usd_idr")).as("totalprice_idr"))
      .orderBy("o_orderkey")
  }

  /** Datetime parse + reformat to string (bpi_etl_bigquery.py:229-232).
    * Output stays a *string* column, as in the reference (SURVEY.md §1.2).
    */
  private val datetimeFormat = Q(
    "datetime_format",
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_dt,
      |       strftime(o_orderdate, '%Y-%m') AS order_month
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_dt"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .orderBy("o_orderkey")
  }

  /** Hash-randomized object-store prefix (create_random_dt_prefix,
    * bpi_etl_bigquery.py:8-23): md5 of a seed, first 6 hex chars, dash,
    * timestamp formatted `yyyy-MM-dd-HH-mm-ss`. Spreads writes across
    * object-store key ranges — the same trick that avoids hot prefixes
    * on S3/GCS at cluster scale.
    */
  private val md5Prefix = Q(
    "md5_prefix",
    """SELECT o_orderkey,
      |       substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6) || '-' ||
      |       strftime(o_orderdate, '%Y-%m-%d-%H-%M-%S') AS raw_prefix
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select(
        col("o_orderkey"),
        concat(
          substring(md5(col("o_orderkey").cast("string")), 1, 6),
          lit("-"),
          date_format(col("o_orderdate"), "yyyy-MM-dd-HH-mm-ss"))
          .as("raw_prefix"))
      .orderBy("o_orderkey")
  }

  /** Validation predicates (pydantic_models.py:22-70): declarative rules,
    * violations returned as rows (the fail-fast variant wraps the same
    * predicates in assert_true — see [[Validation]]).
    * Rule 1 mirrors the literal/enum equality checks (`chartName ==
    * 'Bitcoin'`, pydantic_models.py:49); rule 2 mirrors numeric
    * plausibility (pydantic_models.py:67-70); rule 3 mirrors the
    * fixed-length trimmed-code constraint (`code`/`base` exactly 3 chars
    * after strip, pydantic_models.py:37,64 — here 2-char lang codes);
    * rule 4 mirrors the datetime-format assertions
    * (pydantic_models.py:26-34) as a format-shape check.
    */
  private val validateConstraints = Q(
    "validate_constraints",
    """SELECT entity, entity_id, violation FROM (
      |  SELECT 'events' AS entity, event_id AS entity_id,
      |         'event_type_not_allowed' AS violation
      |  FROM events
      |  WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
      |  UNION ALL
      |  SELECT 'events', event_id, 'value_out_of_range'
      |  FROM events
      |  WHERE value < 0.0 OR value > 1000000.0
      |  UNION ALL
      |  SELECT 'documents', doc_id, 'lang_code_not_2char'
      |  FROM documents
      |  WHERE length(trim(lang)) <> 2
      |  UNION ALL
      |  SELECT 'events', event_id, 'ts_format_invalid'
      |  FROM events
      |  WHERE NOT regexp_matches(
      |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
      |    '^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$')
      |) ORDER BY entity, entity_id, violation""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val ev = t.events
    def v(entity: String, id: Column, rule: String) = Seq(
      lit(entity).as("entity"), id.as("entity_id"), lit(rule).as("violation"))
    val badType = ev
      .filter(!col("event_type").isin("click", "view", "purchase", "signup"))
      .select(v("events", col("event_id"), "event_type_not_allowed"): _*)
    val badValue = ev
      .filter(col("value") < 0.0 || col("value") > 1000000.0)
      .select(v("events", col("event_id"), "value_out_of_range"): _*)
    val badLang = t.documents
      .filter(length(trim(col("lang"))) =!= 2)
      .select(v("documents", col("doc_id"), "lang_code_not_2char"): _*)
    val badTs = ev
      .filter(!date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")
        .rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$"))
      .select(v("events", col("event_id"), "ts_format_invalid"): _*)
    badType.unionAll(badValue).unionAll(badLang).unionAll(badTs)
      .orderBy("entity", "entity_id", "violation")
  }

  /** Stable per-sfDir suffix so the planted layout from different
    * scale factors never collides in the shared tmp (the
    * StorageQueries.digest pattern). */
  private def digest(dir: String): String = graft.util.Digests.short(dir)

  /** The [[Backfill]] gap PLAN as a declared query — the operational
    * knob the reference leaves to the operator (`catchup=False`,
    * bpi_etl_bigquery.py:27-29: missed ticks are replayed by hand)
    * made oracle-checkable. A partitioned twin of `events` (by event
    * day) is planted ONCE per sfDir with every day where
    * day-of-month % 5 == 0 deliberately absent (the outage); the
    * query then derives the replay plan exactly the way
    * [[Backfill.missingPartitions]] does in production — expected =
    * the full calendar spine of the data's day range, existing = one
    * REAL filesystem listing of the planted layout (not the rule that
    * planted it) — and classifies each gap: `deleted` (data exists,
    * partition lost — the outage hole) vs `never_landed` (no source
    * rows for that calendar day — stays on every plan until data
    * shows up, the [[Backfill.Report]] `empty` contract). The oracle
    * replays the same listing algebra relationally. Scale: the plan
    * is metadata-only — one FS listing + a calendar-sized driver list
    * (days of the range, not rows); per-day row counts ride the same
    * bounded groupBy the spine is derived from. */
  private val backfillPlan = Q(
    "backfill_plan",
    """WITH days AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1
      |), span AS (
      |  SELECT min(day) AS d0, max(day) AS d1 FROM days
      |), expected AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span
      |), have AS (
      |  SELECT day FROM days WHERE date_part('day', day) % 5 <> 0
      |)
      |SELECT CAST(e.day AS VARCHAR) AS day,
      |       CASE WHEN d.day IS NULL THEN 'never_landed'
      |            ELSE 'deleted' END AS gap_kind,
      |       CAST(coalesce(d.n, 0) AS BIGINT) AS n_rows_expected
      |FROM expected e
      |LEFT JOIN days d ON d.day = e.day
      |LEFT JOIN have h ON h.day = e.day
      |WHERE h.day IS NULL
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val days = t.events.select(to_date(col("ts")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .cut()
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_backfill_events_${digest(dir)}")
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      t.events.withColumn("day", to_date(col("ts")))
        .filter(dayofmonth(col("day")) % 5 =!= 0)
        .write.mode("overwrite").partitionBy("day").parquet(root.toString)
    }
    val expected = days
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .collect().map(_.getDate(0).toString).toSeq
    val missing =
      Backfill.missingPartitions(s, root.toString, "day", expected)
    import s.implicits._
    missing.toDF("day")
      .join(days.select(col("day").cast("string").as("day"), col("n")),
        Seq("day"), "left")
      .select(col("day"),
        when(col("n").isNull, lit("never_landed"))
          .otherwise(lit("deleted")).as("gap_kind"),
        coalesce(col("n"), lit(0L)).as("n_rows_expected"))
      .orderBy("day")
  }

  val queries: Seq[Q] = Seq(
    scanProject, filterPredicate, colRenameSnake, flattenJson,
    enrichScalarRate, datetimeFormat, md5Prefix, validateConstraints,
    backfillPlan)
}

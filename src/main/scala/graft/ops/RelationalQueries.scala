package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps
import graft.util.Det
import graft.{Q, Tables}

/** Relational [EXT] surface (SURVEY.md §2.3-2.4): joins, aggregates,
  * windows, sort/limit, set ops. All built-in Spark operators — Catalyst
  * picks the physical strategy; we only pin the strategic choices that
  * matter at 100 TB (broadcast the small side, sort-merge the large-large
  * join, partial aggregation before shuffle).
  *
  * Float determinism: all double SUM/AVG aggregates go through
  * [[graft.util.Det]] (integerize-then-sum) so results are bit-identical
  * to the DuckDB oracle regardless of partitioning / summation order.
  */
object RelationalQueries {

  /** TPC-H Q1-shaped grouped aggregate. Map-side partial aggregation
    * (HashAggregate → shuffle by group key → HashAggregate) means the
    * shuffle carries one row per (key × partition), not per input row —
    * the pattern that survives a 100× scale-up.
    */
  private val aggGroup = Q(
    "agg_group",
    s"""SELECT l_returnflag, l_linestatus,
       |       ${Det.sqlDsum("l_quantity")} AS sum_qty,
       |       ${Det.sqlDsum("l_extendedprice")} AS sum_base_price,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |       ${Det.sqlDavg("l_quantity")} AS avg_qty,
       |       ${Det.sqlDavg("l_discount")} AS avg_disc,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Point-in-time (feature-store) join: every fact row joined to the
    * dimension VERSION that was valid at the fact's timestamp — the
    * training-data join that prevents feature leakage (a model trained
    * on features from the future of its label). Dimension = a planted
    * 3-version SCD history per customer (valid_from 1995/1997/1999,
    * balance stepped per version) so both engines build the identical
    * history; facts = orders on o_orderdate. Same engine as `join_asof`:
    * union-tag both sides, ONE ordered window per customer carries the
    * last version at-or-before each fact (version rows sort before
    * facts at equal timestamps — inclusive validity). One shuffle on
    * the entity key; never a per-fact subquery. Oracle: DuckDB ASOF
    * JOIN against the same planted history. */
  private val joinPointInTime = Q(
    "join_point_in_time",
    s"""WITH dim AS (
      |  SELECT c_custkey AS k, v.version,
      |         CASE v.version WHEN 0 THEN TIMESTAMP '1995-01-01'
      |                        WHEN 1 THEN TIMESTAMP '1997-01-01'
      |                        ELSE TIMESTAMP '1999-01-01' END AS valid_from,
      |         ${Det.sqlUnits("c_acctbal", 100)}
      |           + v.version * 100 AS bal_cents
      |  FROM customer, (SELECT unnest([0, 1, 2]) AS version) v
      |)
      |SELECT o_orderkey, o_custkey,
      |       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')
      |         AS order_date,
      |       CAST(d.version AS INTEGER) AS version, d.bal_cents
      |FROM orders o
      |ASOF JOIN dim d ON o.o_custkey = d.k
      |  AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val dim = t.customer
      .select(
        col("c_custkey").as("k"),
        Det.toUnits(col("c_acctbal"), 100L).cast("long").as("bal0"),
        explode(sequence(lit(0), lit(2))).as("version"))
      .select(
        col("k"),
        when(col("version") === 0, lit("1995-01-01"))
          .when(col("version") === 1, lit("1997-01-01"))
          .otherwise(lit("1999-01-01")).cast("timestamp").as("t"),
        lit(0).as("side"),
        col("version"),
        (col("bal0") + col("version") * 100).as("bal_cents"),
        lit(null).cast("long").as("o_orderkey"))
    val facts = t.orders.select(
      col("o_custkey").as("k"),
      col("o_orderdate").cast("timestamp").as("t"),
      lit(1).as("side"),
      lit(null).cast("int").as("version"),
      lit(null).cast("long").as("bal_cents"),
      col("o_orderkey"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.union(facts)
      .select(
        col("k"), col("t"), col("side"), col("o_orderkey"),
        last(col("version"), ignoreNulls = true).over(w).as("version"),
        last(col("bal_cents"), ignoreNulls = true).over(w).as("bal_cents"))
      // INNER semantics to mirror the oracle's ASOF JOIN: a fact with
      // no version at-or-before it (or an entity absent from the
      // dimension) drops, same null-guard as join_asof. The fixtures'
      // min orderdate equals v0's valid_from, so this currently never
      // fires — the guard is the contract, not the data.
      .filter(col("side") === 1 && col("version").isNotNull)
      .select(
        col("o_orderkey"), col("k").as("o_custkey"),
        date_format(col("t"), "yyyy-MM-dd").as("order_date"),
        col("version"), col("bal_cents"))
      .orderBy("o_orderkey")
  }

  /** Rollup over the Q1 grouping keys. NULL group markers are collapsed
    * with coalesce to sidestep cross-engine NULL-ordering differences
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST by default).
    */
  private val aggRollup = Q(
    "agg_rollup",
    s"""SELECT coalesce(l_returnflag, '_all_') AS return_flag,
       |       coalesce(l_linestatus, '_all_') AS line_status,
       |       ${Det.sqlDsum("l_quantity")} AS sum_qty,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY return_flag, line_status""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("_all_")).as("return_flag"),
        coalesce(col("l_linestatus"), lit("_all_")).as("line_status"),
        col("sum_qty"), col("count_order"))
      .orderBy("return_flag", "line_status")
  }

  /** Cube over the Q1 grouping keys — the full grouping-set lattice
    * (4 combinations), NULL markers collapsed like agg_rollup. */
  private val aggCube = Q(
    "agg_cube",
    s"""SELECT coalesce(l_returnflag, '_all_') AS return_flag,
       |       coalesce(l_linestatus, '_all_') AS line_status,
       |       ${Det.sqlDsum("l_quantity")} AS sum_qty,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY return_flag, line_status""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("_all_")).as("return_flag"),
        coalesce(col("l_linestatus"), lit("_all_")).as("line_status"),
        col("sum_qty"), col("count_order"))
      .orderBy("return_flag", "line_status")
  }

  /** Composed analytical query (TPC-H Q3 shape, public-domain):
    * dimension filter → broadcast ⋈ → large-large ⋈ → grouped revenue →
    * top-10. The plan every warehouse query decomposes into: customer
    * broadcasts, lineitem⋈orders shuffles once on the order key, the
    * final top-k is a TakeOrderedAndProject, never a global sort. */
  private val q3ShippingPriority = Q(
    "q3_shipping_priority",
    s"""SELECT l_orderkey,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |       o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(
        t.orders.filter(
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(
        broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(
        col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Composed 6-table analytical query (TPC-H Q5 shape, public domain):
    * revenue from orders where customer and supplier share a nation in
    * one region. The plan worth demonstrating at 100 TB: exactly ONE
    * big-big shuffle (lineitem ⋈ orders on the order key, the fact
    * spine), every other relation broadcast — region prunes nation,
    * nation prunes supplier, and the customer⋈supplier nation equality
    * rides the broadcast as a residual condition instead of a second
    * shuffle. Date filter pushed to the orders scan. */
  private val q5LocalSupplierVolume = Q(
    "q5_local_supplier_volume",
    s"""SELECT n_name,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val asiaSuppliers = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(
        broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    t.lineitem
      .join(
        t.orders.filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaSuppliers), col("l_suppkey") === col("s_suppkey"))
      .join(
        broadcast(t.customer),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Correlated-subquery analytical shape (TPC-H Q17 family, public
    * domain): line items whose quantity is below 0.2 × their own part's
    * average quantity — "small orders" per part. Written DECORRELATED,
    * the plan a per-row subquery must become at scale: filter part →
    * broadcast-prune lineitem ONCE (the pruned slice is localCheckpointed
    * so aggregate and probe share one scan) → per-part scalar aggregate
    * (one groupBy on the pruned slice) → broadcast the tiny aggregate
    * back onto the same slice. One aggregation + one join; no per-row
    * re-evaluation, no second fact scan. Cross-engine determinism:
    * quantities are integral, so sum/count is an exact-integer division
    * both engines compute bit-identically (Det only needed for the
    * price sum). */
  private val q17SmallQuantity = Q(
    "q17_small_quantity",
    s"""WITH p AS (
       |  SELECT p_partkey FROM part
       |  WHERE p_brand = 'Brand#23' AND p_size <= 25
       |), li AS (
       |  SELECT l_partkey, l_quantity, l_extendedprice
       |  FROM lineitem JOIN p ON l_partkey = p_partkey
       |), a AS (
       |  SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
       |  FROM li GROUP BY l_partkey
       |)
       |SELECT li.l_partkey AS p_partkey,
       |       min(a.avg_qty) AS avg_qty,
       |       CAST(count(*) AS BIGINT) AS n_small,
       |       ${Det.sqlDsum("l_extendedprice")} AS small_revenue
       |FROM li JOIN a ON li.l_partkey = a.l_partkey
       |WHERE li.l_quantity < CAST(0.2 AS DOUBLE) * a.avg_qty
       |GROUP BY li.l_partkey
       |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val parts = t.part
      .filter(col("p_brand") === "Brand#23" && col("p_size") <= 25)
      .select(col("p_partkey"))
    val li = t.lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .cut()
    val avgs = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      .withColumnRenamed("l_partkey", "pk")
    li.join(broadcast(avgs), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .groupBy(col("l_partkey"))
      .agg(
        min(col("avg_qty")).as("avg_qty"),
        count(lit(1)).as("n_small"),
        Det.dsum(col("l_extendedprice")).as("small_revenue"))
      .select(col("l_partkey").as("p_partkey"), col("avg_qty"),
        col("n_small"), col("small_revenue"))
      .orderBy("p_partkey")
  }

  /** Broadcast hash join: the dimension side (customer) ships to every
    * executor; the fact side (orders) never shuffles. This is the join
    * shape for fact×dim at any scale — explicitly hinted so the plan
    * does not degrade to SMJ if statistics mislead.
    */
  private val joinBroadcast = Q(
    "join_broadcast",
    """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
      .orderBy("o_orderkey")
  }

  /** Sort-merge join for large×large (lineitem ⋈ orders): both sides
    * shuffle on the join key once, then merge. Follow-up aggregation
    * groups on a low-cardinality key, so the second shuffle is tiny.
    */
  private val joinSortmerge = Q(
    "join_sortmerge",
    s"""SELECT o_orderpriority,
       |       count(*) AS line_count,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("line_count"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Left anti join (NOT EXISTS): customers with no urgent orders. The
    * filter on the right side is pushed below the join, so the anti
    * join's build side only carries matching keys. */
  private val joinAnti = Q(
    "join_anti",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(
        t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left semi join — the EXISTS twin of [[joinAnti]], declared in its
    * own right because its plan shape matters at scale: the probe side
    * streams, the build side deduplicates on the key before/while
    * joining, and no payload from the right side is ever carried. */
  private val joinSemi = Q(
    "join_semi",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(
        t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Per-group top-k (each customer's 2 largest orders) — the windowed
    * top-k whose plan differs fundamentally from the global [[topk]]:
    * one shuffle on the group key, then a rank filter evaluated
    * per-partition — no global ordering, no driver-side limit, the
    * shape that holds when "top k per key" spans billions of keys.
    * Ties broken by order key so both engines rank identically. */
  private val topkPerGroup = Q(
    "topk_per_group",
    """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders
      |) WHERE rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 2)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  /** Exact distinct count per group (shuffle on (group, distinct-key)
    * pairs — the expand+two-phase plan Spark generates survives skew
    * better than a naive global distinct).
    */
  private val distinctUsers = Q(
    "distinct_users",
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** Approximate distinct via HLL++ — the 100 TB path where exact
    * distinct would shuffle every pair. No DuckDB oracle (sketch
    * internals differ across engines); ScalaTest checks relative error
    * against the exact count.
    */
  private val approxDistinct = Q.noOracle("approx_distinct") { (s, dir) =>
    Tables(s, dir).events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .orderBy("event_type")
  }

  /** Approximate heavy hitters via the ApproxTopK sketch (Spark 4.1) —
    * the bounded-memory frequent-items pass a curation pipeline runs to
    * find the hottest domains/keys before deciding caps: each partition
    * tracks at most maxItemsTracked counters and the merged sketch
    * reports top-k, so memory is constant in corpus size where an exact
    * groupBy's shuffle is corpus-keyed. No DuckDB oracle (sketch
    * internals, engine-specific tie selection); ApproxTopKSpec pins the
    * reported counts against the exact aggregation — with the tracked
    * budget at/above the key cardinality the sketch admits no error, so
    * the spec demands exact count agreement, tie-tolerant on item
    * identity at the rank boundary. */
  private val aggApproxTopk = Q.noOracle("agg_approx_topk") { (s, dir) =>
    Tables(s, dir).lineitem
      .agg(expr("approx_top_k(l_partkey, 10, 65536)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("part_key"), col("e.count").as("n_rows"))
      .orderBy(col("n_rows").desc, col("part_key"))
  }

  /** The 100-TB form of [[aggQuantiles]]: Greenwald–Khanna sketches
    * (`percentile_approx`, accuracy 10000 → ~0.01% rank error) instead
    * of exact interpolated percentiles — the sketch merges map-side,
    * so the shuffle carries one bounded summary per group instead of
    * every distinct value. No-oracle (sketch internals are
    * engine-specific, and merge-order can shift an estimate a rank or
    * two); ApproxQuantilesSpec bounds each estimate by VALUE against
    * the exact query's output, the `approx_distinct` pattern. */
  private val aggQuantilesApprox = Q.noOracle("agg_quantiles_approx") { (s, dir) =>
    Tables(s, dir).events
      .select(col("event_type"), Det.toUnits(col("value"), 100).as("vu"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (expr("percentile_approx(vu, 0.25, 10000)") / 100.0).as("p25"),
        (expr("percentile_approx(vu, 0.5, 10000)") / 100.0).as("p50"),
        (expr("percentile_approx(vu, 0.75, 10000)") / 100.0).as("p75"))
      .orderBy("event_type")
  }

  /** Top-k by sort+limit: Spark plans this as TakeOrderedAndProject —
    * each partition keeps a k-heap, the driver merges k×partitions rows.
    * No global sort materializes, which is why top-k stays cheap at any
    * scale. Outer ORDER BY re-asserted for deterministic output order.
    */
  private val topk = Q(
    "topk",
    """SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 100
      |) ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Set ops with DISTINCT semantics on both engines:
    * (high-value ∩ high-priority) − finished, over order keys.
    */
  private val setOps = Q(
    "set_ops",
    """SELECT o_orderkey FROM (
      |  SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
      |  INTERSECT
      |  SELECT o_orderkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  EXCEPT
      |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      |) ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir).orders
    o.filter(col("o_totalprice") > 100000).select("o_orderkey")
      .intersect(
        o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey"))
      .except(o.filter(col("o_orderstatus") === "F").select("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Analytic window: per-user event sequence with lag-based delta.
    * Partition by user_id (the natural shuffle key), order by event time
    * with event_id tiebreak. DuckDB side casts ts to µs precision first —
    * the parquet column is ns but Spark reads µs, and the window order
    * must agree.
    */
  private val windowLagReturn = Q(
    "window_lag_return",
    """SELECT event_id, user_id, value,
      |       row_number() OVER w AS rn,
      |       lag(value, 1) OVER w AS prev_value,
      |       value - lag(value, 1) OVER w AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir).events
      .select(
        col("event_id"), col("user_id"), col("value"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy("event_id")
  }

  /** Tumbling-window aggregate (batch twin of the streaming hourly
    * pipeline, SURVEY.md §2.6). Spark's window() function; oracle uses
    * date_trunc. Emitted as a formatted string to avoid timestamp
    * precision mismatches.
    */
  private val windowTumbling = Q(
    "window_tumbling",
    s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
       |                '%Y-%m-%d %H:%M:%S') AS hour_start,
       |       count(*) AS n_events,
       |       ${Det.sqlDsum("value")} AS sum_value,
       |       ${Det.sqlDavg("value")} AS avg_value
       |FROM events
       |GROUP BY 1
       |ORDER BY hour_start""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("sum_value"),
        Det.davg(col("value")).as("avg_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("hour_start")
  }

  /** Batch sessionization (the oracle-checkable twin of the streaming
    * flatMapGroupsWithState Sessionize): gap-start flags via lag, then a
    * running sum numbers the sessions — two window passes over ONE
    * shuffle by user (both windows share the partitioning), then a
    * grouped rollup per session. */
  private val windowSession = Q(
    "window_session",
    """SELECT user_id, session_no,
      |       count(*) AS n_events,
      |       strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_end
      |FROM (
      |  SELECT user_id, event_id, ts,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id
      |                               ORDER BY CAST(ts AS TIMESTAMP), event_id
      |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      |  FROM (
      |    SELECT user_id, event_id, ts,
      |           CASE WHEN lag(epoch(CAST(ts AS TIMESTAMP))) OVER w IS NULL
      |                  OR epoch(CAST(ts AS TIMESTAMP))
      |                     - lag(epoch(CAST(ts AS TIMESTAMP))) OVER w > 1800
      |                THEN 1 ELSE 0 END AS new_s
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |  )
      |)
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val epochS = unix_timestamp(col("ts"))
    val newS = when(
      lag(epochS, 1).over(w).isNull ||
        epochS - lag(epochS, 1).over(w) > 1800L, 1L).otherwise(0L)
    Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("ts"), newS.as("new_s"))
      .select(
        col("user_id"), col("event_id"), col("ts"),
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("session_no"))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_no")
  }

  /** Skew-safe grouped aggregate through [[Salting.saltedSumCount]]:
    * each key's rows spread over 8 salted sub-keys, partially
    * aggregated on (key, salt), finished on key — the shape that keeps
    * one pathological hot key from flooding a single reducer at 100 TB.
    * Sum/count are algebraic, so the salted two-phase result is EXACTLY
    * the direct aggregate — which is what the plain-GROUP-BY oracle
    * proves. Summed in Det integer units (order-independent), divided
    * back once at the end. */
  private val aggSalted = Q(
    "agg_salted",
    s"""SELECT event_type,
       |       CAST(sum(${Det.sqlUnits("value", 100)}) AS BIGINT) / 100.0 AS sum_value,
       |       count(*) AS n_rows
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
      .select(col("event_type"), Det.toUnits(col("value"), 100).as("vu"))
    Salting.saltedSumCount(ev, Seq("event_type"), "vu", salts = 8)
      .select(
        col("event_type"),
        (col("sum_vu") / lit(100.0)).as("sum_value"),
        col("n_rows"))
      .orderBy("event_type")
  }

  /** Skew-safe equi-join through [[Salting.saltedJoin]] — the join twin
    * of agg_salted: lineitem's rows get a rotating salt, the small
    * supplier side is replicated once per salt, and the join key becomes
    * (suppkey, salt) — so one pathological hot supplier key spreads over
    * 8 reducers instead of flooding one. Join semantics are EXACTLY the
    * plain inner equi-join, which is what the unsalted oracle proves;
    * the aggregate on top collapses the result to a stable, totally
    * ordered shape. */
  private val joinSalted = Q(
    "join_salted",
    s"""SELECT s_nationkey,
       |       count(*) AS n_items,
       |       ${Det.sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    Salting.saltedJoin(
      t.lineitem, t.supplier, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("s_nationkey")
  }

  /** The planted power-law join key: ~70% of lineitem rows collapse
    * onto supplier key 1 (the hot key), the rest keep their real
    * supplier — the worst-case shape the salting machinery and AQE's
    * skew-join both exist for, derived deterministically from the
    * driver tables so both engines and every SF see the same skew. */
  private def skewKey: Column =
    when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1L))
      .otherwise(col("l_suppkey"))

  private val sqlSkewJoin =
    s"""SELECT s_nationkey,
       |       count(*) AS n_items,
       |       ${Det.sqlDsum("l_extendedprice")} AS sum_price
       |FROM (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1
       |                  ELSE l_suppkey END AS skew_key,
       |             l_extendedprice
       |      FROM lineitem)
       |JOIN supplier ON skew_key = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin

  /** The skewed join DECLARED PLAIN — the AQE path: no salting, the
    * optimizer's skew-join split handles the hot key at runtime
    * (SkewJoinSpec forces the thresholds locally and pins the
    * `skew=true` rewrite in the final adaptive plan; at 100 TB the
    * default thresholds trip on their own). Same oracle as the salted
    * twin — the equivalence the pair exists to prove. */
  private val joinSkewAqe = Q("join_skew_aqe", sqlSkewJoin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .select(skewKey.as("skew_key"), col("l_extendedprice"))
      .join(t.supplier, col("skew_key") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("s_nationkey")
  }

  /** The same skewed join through explicit salting ([[Salting
    * .saltedJoin]]) — the belt-and-suspenders path for engines or
    * shapes AQE doesn't cover (broadcast-disabled builds, non-SMJ
    * plans). Bit-identical results to [[joinSkewAqe]] by shared
    * oracle; the hot key's rows spread across 8 reducers by the
    * rotating salt. */
  private val joinSkewSalted = Q("join_skew_salted", sqlSkewJoin) { (s, dir) =>
    val t = Tables(s, dir)
    Salting.saltedJoin(
      t.lineitem.select(skewKey.as("skew_key"), col("l_extendedprice")),
      t.supplier, "skew_key", "s_suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("s_nationkey")
  }

  /** Exact interpolated quantiles (R-7, the definition both engines'
    * exact percentile implements) per group. Values go through Det
    * integer units first: with integer-valued doubles and dyadic
    * quantile fractions (.25/.5/.75) every interpolation step
    * (pos = p·(n−1), a + (b−a)·frac) is exact in IEEE-754, so the
    * result is bit-identical across engines — the same trick that makes
    * the sums deterministic. At scale this is the sort-based exact
    * path; the sketch-based alternative is approx_distinct's cousin
    * percentile_approx (declared no-oracle territory, not needed
    * here). */
  private val aggQuantiles = Q(
    "agg_quantiles",
    s"""SELECT event_type,
       |       count(*) AS n,
       |       quantile_cont(${Det.sqlUnits("value", 100)}, 0.25) / 100.0 AS p25,
       |       quantile_cont(${Det.sqlUnits("value", 100)}, 0.5) / 100.0 AS p50,
       |       quantile_cont(${Det.sqlUnits("value", 100)}, 0.75) / 100.0 AS p75
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(col("event_type"), Det.toUnits(col("value"), 100).as("vu"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (expr("percentile(vu, 0.25)") / 100.0).as("p25"),
        (expr("percentile(vu, 0.5)") / 100.0).as("p50"),
        (expr("percentile(vu, 0.75)") / 100.0).as("p75"))
      .orderBy("event_type")
  }

  /** Range join, composed scale-safe (preference (a) of the custom-op
    * ladder): events ⋈ 30 one-hour "audit windows" (daily 11:45-12:45)
    * on `ts ∈ [start, end)`. A naive theta join is a
    * BroadcastNestedLoopJoin — fine for 30 windows, a cluster-killer
    * when both sides are large. This formulation bins both sides to the
    * hour: each window explodes to the (two) hour buckets it overlaps,
    * the join becomes an EQUI-join on the bucket plus a residual range
    * filter — broadcastable here, shuffle-partitionable when the window
    * side grows, never a cartesian loop. */
  private val joinRange = Q(
    "join_range",
    s"""SELECT window_id,
       |       count(*) AS n_events,
       |       ${Det.sqlDsum("value")} AS sum_value
       |FROM events
       |JOIN (
       |  SELECT i AS window_id,
       |         TIMESTAMP '2024-01-01 11:45:00' + INTERVAL 1 DAY * (i - 1) AS ws
       |  FROM range(1, 31) t(i)
       |) w ON ts >= ws AND ts < ws + INTERVAL 60 MINUTE
       |GROUP BY window_id
       |ORDER BY window_id""".stripMargin) { (s, dir) =>
    val wins = s.range(1, 31).select(
      col("id").as("window_id"),
      expr("timestampadd(DAY, CAST(id - 1 AS INT), timestamp'2024-01-01 11:45:00')")
        .as("ws"))
    // Explode each window into the hour buckets it overlaps (a 60-min
    // window crossing :45 covers exactly two), equi-join on the bucket.
    val winBuckets = wins.select(
      col("window_id"), col("ws"),
      expr("timestampadd(MINUTE, 60, ws)").as("we"),
      explode(array(
        date_trunc("hour", col("ws")),
        date_trunc("hour", expr("timestampadd(MINUTE, 60, ws)")))).as("bucket"))
    Tables(s, dir).events
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .join(broadcast(winBuckets), Seq("bucket"))
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .groupBy(col("window_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy("window_id")
  }

  /** INTERVAL-OVERLAP join [EXT] — two interval sets, every pair that
    * overlaps (the genomics/session-overlap shape; `join_range` is the
    * point-in-window special case). The naive form is a cross join
    * with a range predicate — Spark plans it as
    * BroadcastNestedLoopJoin and it dies quadratically at scale. This
    * runs the standard BUCKETED decomposition: each interval explodes
    * into the hour buckets it covers (bounded ≤ 4 by the planted
    * max-3h lengths; a production caller picks the bucket width near
    * the max interval length), the join is an EQUI-join on the bucket,
    * the exact overlap predicate filters the collision frame, and a
    * distinct collapses pairs that share several buckets. Cost: one
    * shuffle per side on the bucket key + a pair-sized distinct —
    * never |A|·|B|. The two sets are deterministic sparse twins of
    * `events` (moduli 13/17 with 2h/3h max lengths), so both engines
    * construct identical inputs; overlap duration is exact integer
    * seconds of the clamped intersection. */
  private val joinIntervalOverlap = Q(
    "join_interval_overlap",
    """WITH a AS (
      |  SELECT event_id AS a_id, ts AS a_start,
      |         ts + INTERVAL 1 MINUTE * (1 + event_id % 120) AS a_end
      |  FROM events WHERE event_id % 13 = 0
      |), b AS (
      |  SELECT event_id AS b_id, ts AS b_start,
      |         ts + INTERVAL 1 MINUTE * (1 + event_id % 180) AS b_end
      |  FROM events WHERE event_id % 17 = 1
      |)
      |SELECT a_id, b_id,
      |       (epoch_us(CAST(least(a_end, b_end) AS TIMESTAMP))
      |        - epoch_us(CAST(greatest(a_start, b_start) AS TIMESTAMP)))
      |         // 1000000 AS overlap_sec
      |FROM a JOIN b ON a_start < b_end AND b_start < a_end
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
    def side(mod: Int, rem: Int, maxLen: Int,
        p: String): org.apache.spark.sql.DataFrame =
      ev.filter(pmod(col("event_id"), lit(mod)) === rem)
        .select(
          col("event_id").as(s"${p}_id"), col("ts").as(s"${p}_start"),
          expr(s"timestampadd(MINUTE, CAST(1 + event_id % $maxLen AS INT), ts)")
            .as(s"${p}_end"))
        .withColumn("bucket", explode(expr(
          s"sequence(date_trunc('HOUR', ${p}_start)," +
            s" date_trunc('HOUR', ${p}_end), interval 1 hour)")))
    side(13, 0, 120, "a")
      .join(side(17, 1, 180, "b"), Seq("bucket"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select(col("a_id"), col("b_id"),
        expr("(unix_micros(least(a_end, b_end)) -" +
          " unix_micros(greatest(a_start, b_start))) div 1000000")
          .as("overlap_sec"))
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** As-of join — the time-series operator Spark lacks natively (the
    * (a)-tier compose-existing-ops rung of the custom-op ladder): for
    * each event, the user's most recent order at or before the event
    * time. Composed as union → one window pass: both sides tagged and
    * unioned, sorted within each key by (time, side) with the right
    * side first at ties (as-of is ≤), then `last(_, ignoreNulls)` over
    * an unbounded-preceding frame carries the latest order attributes
    * forward onto every event row. The combined union crosses ONE
    * shuffle (the window's partition-by-key exchange; the right side's
    * small (key, time) pre-aggregation — which also makes the carried
    * row deterministic — adds its own map-side-combined shuffle of
    * order-side rows only). That beats a per-event range join at any
    * scale, and is exactly how a 1000-executor run would partition.
    * Oracle: DuckDB's native ASOF JOIN. */
  private val joinAsof = Q(
    "join_asof",
    """WITH r AS (
      |  SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS rt,
      |         max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT event_id, user_id, o_orderkey,
      |       strftime(rt, '%Y-%m-%d %H:%M:%S') AS order_ts
      |FROM events e
      |ASOF JOIN r ON e.user_id = r.k AND CAST(e.ts AS TIMESTAMP) >= r.rt
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val rhs = t.orders
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("rt"))
      .agg(max(col("o_orderkey")).as("ro"))
      .select(
        col("k"), col("rt").as("t"), lit(null).cast("long").as("event_id"),
        lit(0).as("side"), col("ro"), col("rt"))
    val lhs = t.events.select(
      col("user_id").as("k"), col("ts").as("t"), col("event_id"),
      lit(1).as("side"), lit(null).cast("long").as("ro"),
      lit(null).cast("timestamp").as("rt"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rhs.union(lhs)
      .select(
        col("k"), col("event_id"), col("side"),
        last(col("ro"), ignoreNulls = true).over(w).as("o_orderkey"),
        last(col("rt"), ignoreNulls = true).over(w).as("carried_rt"))
      .filter(col("side") === 1 && col("o_orderkey").isNotNull)
      .select(
        col("event_id"), col("k").as("user_id"), col("o_orderkey"),
        date_format(col("carried_rt"), "yyyy-MM-dd HH:mm:ss").as("order_ts"))
      .orderBy("event_id")
  }

  /** FORWARD as-of join — `join_asof`'s mirror: for each non-purchase
    * event, the same user's EARLIEST purchase at or after the event
    * time (the "time-to-next-conversion" lookup attribution and
    * churn models run). Identical union → one window pass shape with
    * the frame flipped: sorted by (time, side) with the LEFT side
    * first at ties (forward as-of is ≥, so a purchase at the exact
    * event time matches), `first(_, ignoreNulls)` over an
    * unbounded-FOLLOWING frame pulls the next purchase's attributes
    * back onto every event row. Same single-shuffle scale posture as
    * the backward form. Oracle: DuckDB ASOF JOIN with the `<=`
    * inequality. */
  private val joinAsofForward = Q(
    "join_asof_forward",
    """WITH p AS (
      |  SELECT user_id AS k, ts AS pt, max(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.user_id, purchase_id,
      |       strftime(pt, '%Y-%m-%d %H:%M:%S') AS purchase_ts
      |FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
      |ASOF JOIN p ON e.user_id = p.k AND e.ts <= p.pt
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val purchases = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k"), col("ts").as("pt"))
      .agg(max(col("event_id")).as("po"))
      .select(
        col("k"), col("pt").as("t"), lit(null).cast("long").as("event_id"),
        lit(1).as("side"), col("po"), col("pt"))
    val lhs = t.events.filter(col("event_type") =!= "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), col("event_id"),
      lit(0).as("side"), lit(null).cast("long").as("po"),
      lit(null).cast("timestamp").as("pt"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    purchases.union(lhs)
      .select(
        col("k"), col("event_id"), col("side"),
        first(col("po"), ignoreNulls = true).over(w).as("purchase_id"),
        first(col("pt"), ignoreNulls = true).over(w).as("carried_pt"))
      .filter(col("side") === 0 && col("purchase_id").isNotNull)
      .select(
        col("event_id"), col("k").as("user_id"), col("purchase_id"),
        date_format(col("carried_pt"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("event_id")
  }

  /** BOUNDED-STALENESS as-of join — the backward form with a match
    * tolerance: the user's most recent purchase at or before the event
    * time counts only if it happened within the last hour, else the
    * event goes unmatched (pandas `merge_asof(tolerance=...)`
    * semantics; the freshness contract feature-store lookups enforce).
    * Same backward carry as `join_asof` plus ONE post-carry filter on
    * the carried timestamp — tolerance adds zero shuffles. Oracle:
    * DuckDB ASOF JOIN with the filter applied OUTSIDE a MATERIALIZED
    * CTE (DuckDB folds a WHERE on the carried time into the ASOF ON
    * clause, which it rejects as a second inequality). */
  private val joinAsofTolerance = Q(
    "join_asof_tolerance",
    """WITH p AS (
      |  SELECT user_id AS k, ts AS pt, max(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |), m AS MATERIALIZED (
      |  SELECT e.event_id, e.user_id, e.ts AS et, pt, purchase_id
      |  FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
      |  ASOF JOIN p ON e.user_id = p.k AND e.ts >= p.pt
      |)
      |SELECT event_id, user_id, purchase_id,
      |       strftime(pt, '%Y-%m-%d %H:%M:%S') AS purchase_ts
      |FROM m WHERE pt >= et - INTERVAL 1 HOUR
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val purchases = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k"), col("ts").as("pt"))
      .agg(max(col("event_id")).as("po"))
      .select(
        col("k"), col("pt").as("t"), lit(null).cast("long").as("event_id"),
        lit(0).as("side"), col("po"), col("pt"))
    val lhs = t.events.filter(col("event_type") =!= "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), col("event_id"),
      lit(1).as("side"), lit(null).cast("long").as("po"),
      lit(null).cast("timestamp").as("pt"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.union(lhs)
      .select(
        col("k"), col("event_id"), col("side"), col("t"),
        last(col("po"), ignoreNulls = true).over(w).as("purchase_id"),
        last(col("pt"), ignoreNulls = true).over(w).as("carried_pt"))
      .filter(col("side") === 1 && col("purchase_id").isNotNull &&
        col("carried_pt") >= col("t") - expr("INTERVAL 1 HOUR"))
      .select(
        col("event_id"), col("k").as("user_id"), col("purchase_id"),
        date_format(col("carried_pt"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("event_id")
  }

  /** Equi-width histogram over order totals (width_bucket semantics:
    * bucket 0 below range, n+1 above, else floor(x·n/(hi−lo))+1) — the
    * binning aggregate dashboards and data-quality monitors run
    * constantly. The bucket expression is written out explicitly with
    * the SAME op order on both engines (DuckDB 1.0 has no
    * width_bucket), so assignment is bit-deterministic even at bin
    * edges; counts are integers. Same two-phase partial-agg shape as
    * every groupBy. */
  private val aggHistogram = Q(
    "agg_histogram",
    """SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
      |            WHEN o_totalprice >= 400000.0 THEN 21
      |            ELSE floor(o_totalprice * 20.0 / 400000.0) + 1 END AS BIGINT) AS bucket,
      |       count(*) AS n
      |FROM orders
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val x = col("o_totalprice")
    val bucket = when(x < 0.0, lit(0))
      .when(x >= 400000.0, lit(21))
      .otherwise(floor(x * lit(20.0) / lit(400000.0)) + 1)
    Tables(s, dir).orders
      .groupBy(bucket.cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Sliding-frame window aggregates: per-user 3-row moving average plus
    * a running cumulative sum over the event stream — the smoothing /
    * running-total family the lag/rank windows don't cover. One shuffle
    * on user_id (the same partitioning every per-user window reuses);
    * frames are evaluated within a partition with no further exchange.
    * Cross-engine determinism: DuckDB computes sliding SUMs with a
    * segment tree (different addition order than Spark's incremental
    * frame walk), so double sums are NOT safe here — both sides sum
    * exact integer units ([[Det.toUnits]]) and divide once at the end. */
  private val windowMovingAvg = Q(
    "window_moving_avg",
    s"""SELECT event_id, user_id, value,
       |       CAST(count(*) OVER w3 AS BIGINT) AS mov_n,
       |       CAST(sum(${Det.sqlUnits("value", 1000000L)}) OVER w3 AS BIGINT)
       |         / 1000000.0 / count(*) OVER w3 AS mov_avg_3,
       |       CAST(sum(${Det.sqlUnits("value", 1000000L)}) OVER wcum AS BIGINT)
       |         / 1000000.0 AS cum_sum
       |FROM events
       |WINDOW w3 AS (PARTITION BY user_id
       |              ORDER BY CAST(ts AS TIMESTAMP), event_id
       |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       |       wcum AS (PARTITION BY user_id
       |              ORDER BY CAST(ts AS TIMESTAMP), event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w3 = w.rowsBetween(-2, Window.currentRow)
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val units = Det.toUnits(col("value"), 1000000L)
    Tables(s, dir).events
      .select(
        col("event_id"), col("user_id"), col("value"),
        count(lit(1)).over(w3).as("mov_n"),
        (sum(units).over(w3) / lit(1000000.0) / count(lit(1)).over(w3))
          .as("mov_avg_3"),
        (sum(units).over(wcum) / lit(1000000.0)).as("cum_sum"))
      .orderBy("event_id")
  }

  /** Pivot (long → wide): quantity totals by return flag, one column per
    * line status. Values are enumerated explicitly
    * (`pivot(col, Seq("F","O"))`), so Spark skips the extra
    * distinct-values job and plans a single two-phase aggregate whose
    * shuffle carries one row per return flag — the conditional-
    * aggregation plan the oracle spells out by hand. A missing
    * (flag, status) cell is NULL on both engines (SUM over zero rows). */
  private val aggPivot = Q(
    "agg_pivot",
    s"""SELECT l_returnflag,
       |       CAST(sum(CASE WHEN l_linestatus = 'F'
       |                     THEN ${Det.sqlUnits("l_quantity", 100L)} END) AS BIGINT)
       |         / 100.0 AS qty_f,
       |       CAST(sum(CASE WHEN l_linestatus = 'O'
       |                     THEN ${Det.sqlUnits("l_quantity", 100L)} END) AS BIGINT)
       |         / 100.0 AS qty_o,
       |       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
       |       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(Det.dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        col("F_qty").as("qty_f"), col("O_qty").as("qty_o"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        coalesce(col("O_n"), lit(0L)).as("n_o"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q18 shape (public domain): customers whose orders exceed a
    * total-quantity threshold — the HAVING + IN-subquery pattern,
    * decorrelated by hand into the plan a 100 TB run needs: ONE shuffle
    * (the lineitem group-by on order key); the HAVING filter then
    * shrinks the key set by ~100× before it re-joins, so the join back
    * to orders and the customer lookup are both broadcasts, and the
    * fact table is never re-scanned or re-shuffled. Quantities are
    * integral doubles (< 2^53), so their sum is exact on both engines
    * without unit scaling. */
  private val q18LargeOrders = Q(
    "q18_large_orders",
    """SELECT c_custkey, c_name, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       o_totalprice,
      |       CAST(big.total_qty AS BIGINT) AS total_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
      |) big
      |JOIN orders ON o_orderkey = big.l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    t.orders
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"),
        col("total_qty").cast("long").as("total_qty"))
      .orderBy("o_orderkey")
  }

  /** Ordered-funnel analysis (signup → view → purchase with 2-day
    * conversion windows): the product-analytics sequence-matching
    * shape. Semantics: t1 = earliest signup; t2 = earliest view
    * strictly after t1 within the window; t3 = earliest purchase
    * strictly after t2 within the window; stage = furthest step
    * reached. Strict `>` comparisons make equal-timestamp ties
    * order-independent, so no secondary sort is needed. Plan: ONE
    * shuffle — three stacked Window passes over the same user_id
    * partitioning (each step's conditional min references the
    * previous step's column), then a per-user aggregate that reuses
    * the partitioning. The naive form (three self-joins through
    * per-step subqueries, as the oracle writes it) would scan the
    * fact three times at scale. */
  private val funnelSteps = Q(
    "funnel_steps",
    """WITH su AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id
      |), vw AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > su.t1
      |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(su.t1) <= 172800000000
      |  GROUP BY e.user_id
      |), pu AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      |  FROM events e JOIN vw ON e.user_id = vw.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > vw.t2
      |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(vw.t2) <= 172800000000
      |  GROUP BY e.user_id
      |)
      |SELECT su.user_id,
      |       strftime(su.t1, '%Y-%m-%d %H:%M:%S') AS signup_ts,
      |       coalesce(strftime(vw.t2, '%Y-%m-%d %H:%M:%S'), '') AS view_ts,
      |       coalesce(strftime(pu.t3, '%Y-%m-%d %H:%M:%S'), '') AS purchase_ts,
      |       CAST(CASE WHEN pu.t3 IS NOT NULL THEN 3
      |                 WHEN vw.t2 IS NOT NULL THEN 2
      |                 ELSE 1 END AS INTEGER) AS stage
      |FROM su LEFT JOIN vw ON su.user_id = vw.user_id
      |        LEFT JOIN pu ON su.user_id = pu.user_id
      |ORDER BY su.user_id""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id"))
    val winUs = 172800000000L // 2 days in µs
    def stepMin(cond: Column): Column = min(when(cond, col("ts"))).over(byUser)
    val staged = Tables(s, dir).events
      .withColumn("t1", stepMin(col("event_type") === "signup"))
      .withColumn("t2", stepMin(
        col("event_type") === "view" && col("ts") > col("t1") &&
          unix_micros(col("ts")) - unix_micros(col("t1")) <= winUs))
      .withColumn("t3", stepMin(
        col("event_type") === "purchase" && col("ts") > col("t2") &&
          unix_micros(col("ts")) - unix_micros(col("t2")) <= winUs))
    staged.filter(col("t1").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
      .select(
        col("user_id"),
        date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"),
        coalesce(date_format(col("t2"), "yyyy-MM-dd HH:mm:ss"), lit(""))
          .as("view_ts"),
        coalesce(date_format(col("t3"), "yyyy-MM-dd HH:mm:ss"), lit(""))
          .as("purchase_ts"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .otherwise(1).cast("int").as("stage"))
      .orderBy("user_id")
  }

  /** Cohort retention: users bucketed by first-touch week, activity
    * counted per (cohort, weeks-since-first-touch). Week indices are
    * exact integer division of microsecond epochs (`div`, not float
    * `/` — a boundary timestamp must land in the same week on both
    * engines). Plan: first-touch is a window min over the user_id
    * partitioning (no join back, no second scan), the retention matrix
    * is one map-side-combinable aggregate over (cohort, week) — tiny
    * output at any scale since cohorts × weeks is bounded by the
    * calendar, with the distinct-user count the only shuffle-heavy
    * term (partial distinct on user within each cell). */
  private val retentionCohorts = Q(
    "retention_cohorts",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS ft
      |  FROM events GROUP BY user_id
      |)
      |SELECT cohort_week, week_no, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM (
      |  SELECT e.user_id,
      |         (epoch_us(f.ft) - epoch_us(TIMESTAMP '2024-01-01')) // 604800000000 AS cohort_week,
      |         (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(f.ft)) // 604800000000 AS week_no
      |  FROM events e JOIN f USING (user_id))
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id"))
    Tables(s, dir).events
      .withColumn("ft", min(col("ts")).over(byUser))
      .select(
        col("user_id"),
        expr("(unix_micros(ft) - unix_micros(to_timestamp('2024-01-01'))) div 604800000000")
          .as("cohort_week"),
        expr("(unix_micros(ts) - unix_micros(ft)) div 604800000000")
          .as("week_no"))
      .groupBy(col("cohort_week"), col("week_no"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_no")
  }

  /** TPC-H Q20 shape (public domain), adapted to the tables at hand
    * (no partsupp in the corpus): suppliers who DOMINATE a promo
    * part's shipments — shipped more than 30% of that part's total
    * volume in a 3-year window. The textbook form is two nested IN
    * subqueries (parts by attribute → per-supplier-per-part shipped
    * quantity vs a per-part total → supplier names); written here
    * DECORRELATED as the plan those subqueries must lower to at scale:
    * the part filter broadcast-prunes the fact scan, ONE fact
    * aggregation on (suppkey, partkey), the per-part total is a
    * re-aggregation of that already-tiny result (never a second fact
    * scan), and the qualifying supplier set broadcast-semi-joins the
    * supplier dimension. Dominance compares integer-valued quantity
    * sums cross-multiplied by 10/3 — exact in doubles, no division. */
  private val q20ExcessSuppliers = Q(
    "q20_excess_suppliers",
    """WITH p AS (
      |  SELECT p_partkey FROM part WHERE p_type = 'PROMO'
      |), ship AS (
      |  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      |  FROM lineitem JOIN p ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1999-01-01'
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT l_partkey, sum(qty) AS tqty FROM ship GROUP BY 1
      |), excess AS (
      |  SELECT DISTINCT l_suppkey FROM ship JOIN tot USING (l_partkey)
      |  WHERE ship.qty * 10 > tot.tqty * 3
      |)
      |SELECT s.s_suppkey, s.s_name, s.s_acctbal
      |FROM supplier s JOIN excess e ON s.s_suppkey = e.l_suppkey
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val promoParts = t.part.filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val ship = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val tot = ship.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("tqty"))
      .withColumnRenamed("l_partkey", "pk")
    val excess = ship
      .join(broadcast(tot), col("l_partkey") === col("pk"))
      .filter(col("qty") * 10 > col("tqty") * 3)
      .select(col("l_suppkey")).distinct()
    t.supplier
      .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** Semi-join reduction (the runtime-filter shape, done by hand): a
    * selective dimension predicate yields a COMPACT key set; broadcast
    * that key set and left-semi-prune the fact BEFORE the real join,
    * so the fact shuffle carries only matching rows. This is the move
    * when the dimension is too wide to broadcast but its filtered key
    * set is small: at 100 TB it turns "shuffle the whole fact into a
    * sort-merge join" into "shuffle the ~1% that survives". Spark's
    * own runtime row-group filtering can inject this plan under AQE;
    * declaring it explicitly makes the reduction a contract, not an
    * optimizer maybe. The oracle is the plain join — the reduction
    * must not change the answer, only the plan. */
  private val joinSemireduced = Q(
    "join_semireduced",
    s"""SELECT o_orderkey, o_totalprice,
       |       count(*) AS n_lines,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
       |GROUP BY o_orderkey, o_totalprice
       |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val sel = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
    val keys = sel.select(col("o_orderkey").as("k")).distinct()
    val pruned = t.lineitem
      .join(broadcast(keys), col("l_orderkey") === col("k"), "left_semi")
    pruned
      .join(sel.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(
        count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderkey")
  }

  /** Explicit GROUPING SETS — the general form rollup/cube are sugar
    * for, with `grouping()` indicators so downstream consumers can
    * tell a real NULL from a rolled-up level. One shuffle: Spark
    * expands the sets map-side (Expand node) and aggregates once; at
    * scale that beats unioning three separate aggregates, which would
    * scan the fact three times. NULL-vs-value ordering differs across
    * engines, so the total order coalesces the rolled-up keys to a
    * sentinel above the value domain on BOTH sides. */
  private val aggGroupingSets = Q(
    "agg_grouping_sets",
    """SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
      |       l_returnflag, l_linestatus,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, coalesce(l_returnflag, chr(126)),
      |         coalesce(l_linestatus, chr(126))""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        floor(sum(col("l_quantity")) + lit(0.5)).cast("long").as("sum_qty"))
      .select("gid", "l_returnflag", "l_linestatus", "n", "sum_qty")
      .orderBy(col("gid"), coalesce(col("l_returnflag"), lit("~")),
        coalesce(col("l_linestatus"), lit("~")))
  }

  /** Unpivot/melt — wide metric columns to long (metric, value) rows,
    * the inverse of [[aggPivot]] and the standard reshape feeding
    * metric stores and per-metric aggregation. Purely narrow: each
    * input row expands to 4 output rows map-side (Spark's Expand
    * node), no shuffle until the caller aggregates. The oracle mirrors
    * it with UNION ALL of per-metric projections — semantically the
    * identical reshape. */
  private val unpivotLong = Q(
    "unpivot_long",
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
      |)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  /** TPC-H Q10 shape (public domain): returned-item revenue per
    * customer, top 20 — the classic "who returned the most value"
    * report. One fact shuffle (the per-customer aggregate); customer
    * and nation are broadcast; the returnflag filter lands in
    * PushedFilters so the scan skips non-returned rows at the parquet
    * level; the top-20 cut is TakeOrderedAndProject (no global sort
    * materialized). Revenue through Det on both sides, ties broken by
    * custkey so the DESC cut is engine-independent. */
  private val q10ReturnedItems = Q(
    "q10_returned_items",
    s"""SELECT c_custkey, c_name, n_name,
       |       CAST(count(*) AS BIGINT) AS n_items,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_returnflag") === "R")
      .join(t.orders.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
      .join(broadcast(t.nation), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Distribution-rank window suite — ntile / percent_rank / cume_dist
    * in one pass, e6-integerized so both engines agree bit-for-bit
    * (the float forms differ only by division; the integer forms are
    * (rank−1)·1e6 div (n−1) and rn·1e6 div n). The window ordering
    * includes the unique order key, so there are no rank peers and
    * cume_dist degenerates to row_number/n — which is exactly what
    * makes it integerizable. One shuffle: all three functions plus the
    * partition count share a single (priority)-partitioned sort. */
  private val windowRankSuite = Q(
    "window_rank_suite",
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |       CAST((rank() OVER w - 1) * 1000000 // (count(*) OVER win - 1) AS BIGINT) AS prank_e6,
      |       CAST(row_number() OVER w * 1000000 // count(*) OVER win AS BIGINT) AS cume_e6
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
      |       win AS (PARTITION BY o_orderpriority)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val win = Window.partitionBy(col("o_orderpriority"))
    Tables(s, dir).orders
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("int").as("quartile"),
        col("o_totalprice"),
        (rank().over(w) - 1).cast("long").as("rk0"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(win).cast("long").as("n"))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("quartile"),
        expr("rk0 * 1000000 div (n - 1)").as("prank_e6"),
        expr("rn * 1000000 div n").as("cume_e6"))
      .orderBy("o_orderkey")
  }

  /** Full outer join with both-side nulls: users with high-value
    * purchases ⟗ users with high-value errors — the reconciliation
    * shape (two partial aggregates stitched over a sparse key space,
    * unmatched keys surviving from EITHER side). Both inputs are
    * already aggregated (tiny), so at scale this is a join of two
    * aggregate outputs, never of facts; coalesce() restores the key
    * and zero-fills the missing side. */
  private val joinOuterFull = Q(
    "join_outer_full",
    """WITH p AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
      |  FROM events WHERE event_type = 'purchase' AND value > 190
      |  GROUP BY user_id
      |), e AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_err
      |  FROM events WHERE event_type = 'error' AND value > 190
      |  GROUP BY user_id
      |)
      |SELECT coalesce(p.user_id, e.user_id) AS user_id,
      |       coalesce(p.n_purch, 0) AS n_purch,
      |       coalesce(e.n_err, 0) AS n_err
      |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
    def side(kind: String, out: String) = ev
      .filter(col("event_type") === kind && col("value") > 190)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as(out))
    val p = side("purchase", "n_purch").withColumnRenamed("user_id", "pu")
    val e = side("error", "n_err").withColumnRenamed("user_id", "eu")
    p.join(e, col("pu") === col("eu"), "full_outer")
      .select(
        coalesce(col("pu"), col("eu")).as("user_id"),
        coalesce(col("n_purch"), lit(0L)).as("n_purch"),
        coalesce(col("n_err"), lit(0L)).as("n_err"))
      .orderBy("user_id")
  }

  /** Time-series gap filling: the hourly purchase-count series joined
    * onto a COMPLETE hour spine (min..max of the data), missing hours
    * zero-marked and forward-filled from the last observed value — the
    * resample-and-ffill primitive every metrics pipeline needs before
    * comparing periods. The spine is generated with sequence() from a
    * 1-row bounds aggregate (no driver-side loop). The forward-fill
    * window is GLOBAL-ordered but runs over the hour grid, which is
    * calendar-bounded (a decade ≈ 90k rows) — the documented
    * metadata-sized-window exception; a per-series variant adds the
    * series key to partitionBy and nothing else changes. */
  private val timeseriesFfill = Q(
    "timeseries_ffill",
    """WITH h AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), bounds AS (
      |  SELECT min(hour) AS h0, max(hour) AS h1 FROM h
      |), spine AS (
      |  -- spine bound derived from the data (datediff), not a magic
      |  -- cap: Spark's sequence(h0, h1) is complete, so the oracle
      |  -- must be too. unnest(range(...)) in the SELECT list is the
      |  -- lateral-range form (range() as a table function rejects
      |  -- correlated args).
      |  SELECT h0 + INTERVAL (s.i) HOUR AS hour
      |  FROM (SELECT h0, h1,
      |          unnest(range(0, CAST(datediff('hour', h0, h1) AS BIGINT) + 1)) AS i
      |        FROM bounds) s
      |)
      |SELECT strftime(spine.hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |       coalesce(h.n, 0) AS n,
      |       CAST(last_value(h.n IGNORE NULLS) OVER (ORDER BY spine.hour
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_ffill,
      |       CAST(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS was_gap
      |FROM spine LEFT JOIN h ON spine.hour = h.hour
      |ORDER BY spine.hour""".stripMargin) { (s, dir) =>
    val hourly = Tables(s, dir).events
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("hour"), "left")
      .select(
        col("hour"),
        coalesce(col("n"), lit(0L)).as("n_filled"),
        last(col("n"), ignoreNulls = true).over(w).as("n_ffill"),
        when(col("n").isNull, 1).otherwise(0).cast("int").as("was_gap"))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n_filled").as("n"), col("n_ffill"), col("was_gap"))
      .orderBy("hour")
  }

  /** Last-touch attribution: every purchase attributed to the user's
    * most recent STRICTLY-prior click (the marketing-analytics asof
    * shape). The oracle mirrors the union+window formulation verbatim
    * rather than DuckDB's ASOF LEFT JOIN: ASOF returns an arbitrary
    * matching row when two clicks share the max qualifying timestamp,
    * while both sides here tie-break on (t, side, cid) so the match is
    * engine-deterministic. Same union + one
    * ordered window pass as `join_asof` — never a per-purchase
    * subquery: clicks and purchases union-tag, and at equal timestamps
    * clicks sort AFTER purchases so the running last-click honors the
    * strict inequality; unattributed purchases survive with an empty
    * click (LEFT semantics). One shuffle on user_id. */
  private val attributionLastTouch = Q(
    "attribution_last_touch",
    """WITH u AS (
      |  SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, 1 AS side,
      |         CAST(NULL AS BIGINT) AS pid, event_id AS cid,
      |         CAST(ts AS TIMESTAMP) AS ct
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, CAST(ts AS TIMESTAMP), 0,
      |         event_id, CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP)
      |  FROM events WHERE event_type = 'purchase'
      |), w AS (
      |  SELECT k, side, pid, t,
      |         last_value(cid IGNORE NULLS) OVER (PARTITION BY k
      |             ORDER BY t, side, cid
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
      |         last_value(ct IGNORE NULLS) OVER (PARTITION BY k
      |             ORDER BY t, side, cid
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_t
      |  FROM u
      |)
      |SELECT pid AS purchase_id, k AS user_id,
      |       strftime(t, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |       click_id,
      |       coalesce(strftime(click_t, '%Y-%m-%d %H:%M:%S'), '') AS click_ts
      |FROM w WHERE side = 0
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
      lit(null).cast("long").as("pid"),
      col("event_id").as("cid"), col("ts").as("ct"))
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), lit(0).as("side"),
      col("event_id").as("pid"),
      lit(null).cast("long").as("cid"), lit(null).cast("timestamp").as("ct"))
    // At equal t the purchase (side 0) sorts BEFORE the click (side 1),
    // so the running last-click over rows ≤ current sees only strictly
    // earlier clicks — DuckDB ASOF's `<`.
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"), col("cid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(purchases)
      .select(
        col("k"), col("side"), col("pid"), col("t"),
        last(col("cid"), ignoreNulls = true).over(w).as("click_id"),
        last(col("ct"), ignoreNulls = true).over(w).as("click_t"))
      .filter(col("side") === 0)
      .select(
        col("pid").as("purchase_id"), col("k").as("user_id"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("click_id"),
        coalesce(date_format(col("click_t"), "yyyy-MM-dd HH:mm:ss"), lit(""))
          .as("click_ts"))
      .orderBy("purchase_id")
  }

  /** RFM customer scoring (recency / frequency / monetary quintile
    * bands), formulated the way it must be at scale: NOT a global
    * ntile over the customer dimension (a single-ordering sort of
    * every customer), but quintile THRESHOLDS from one 1-row
    * aggregate, broadcast back over the per-customer frame — each
    * band is then a narrow CASE count of thresholds below the metric.
    * Exactness: metrics are integers (days, counts, cents) and
    * interpolated quintiles of integers carry at most fifth fractions
    * ((n−1)·0.2 indexing), so ×5 makes every comparison pure int64.
    * Equal metrics get equal bands by construction — no tie-order
    * dependence at all, which ntile could not offer. */
  private val customerRfm = Q(
    "customer_rfm", {
      def bandSql(m: String, t: String) =
        s"""CAST(1 + (CASE WHEN $m*5 > ${t}20 THEN 1 ELSE 0 END)
           |       + (CASE WHEN $m*5 > ${t}40 THEN 1 ELSE 0 END)
           |       + (CASE WHEN $m*5 > ${t}60 THEN 1 ELSE 0 END)
           |       + (CASE WHEN $m*5 > ${t}80 THEN 1 ELSE 0 END) AS INTEGER)""".stripMargin
      def thrSql(m: String, t: String) = Seq(20, 40, 60, 80).map(p =>
        s"CAST(quantile_cont($m, 0.$p)*5 AS BIGINT) AS $t$p").mkString(",\n    ")
      s"""WITH r AS (
         |  SELECT o_custkey AS custkey,
         |         CAST((epoch_us(TIMESTAMP '2002-01-01') - epoch_us(max(o_orderdate))) // 86400000000 AS BIGINT) AS recency_days,
         |         CAST(count(*) AS BIGINT) AS frequency,
         |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_c
         |  FROM orders GROUP BY o_custkey
         |), th AS (
         |  SELECT
         |    ${thrSql("recency_days", "r")},
         |    ${thrSql("frequency", "f")},
         |    ${thrSql("monetary_c", "m")}
         |  FROM r
         |)
         |SELECT custkey, recency_days, frequency, monetary_c,
         |  ${bandSql("recency_days", "r")} AS r_band,
         |  ${bandSql("frequency", "f")} AS f_band,
         |  ${bandSql("monetary_c", "m")} AS m_band
         |FROM r, th ORDER BY custkey""".stripMargin
    }) { (s, dir) =>
    val refUs = java.time.LocalDate.of(2002, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val r = Tables(s, dir).orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        // o_orderdate is TIMESTAMP_NTZ; the cast interprets it in the
        // session TZ (pinned UTC), matching DuckDB's naive epoch_us.
        expr(s"($refUs - unix_micros(cast(max(o_orderdate) as timestamp))) div 86400000000")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(Det.toUnits(col("o_totalprice"), 100)).as("monetary_c"))
    // quintile·5 is mathematically an integer ((n−1)·p indexing with
    // p a fifth), but the double can sit 1 ulp low (35.999…); DuckDB's
    // CAST(double AS BIGINT) rounds while Spark's .cast("long")
    // truncates, so round explicitly on this side: floor(x·5 + 0.5).
    val th = r.agg(
      floor(expr("percentile(recency_days, 0.2)") * 5 + 0.5)
        .cast("long").as("r20"),
      Seq(("recency_days", "r", 40), ("recency_days", "r", 60),
        ("recency_days", "r", 80),
        ("frequency", "f", 20), ("frequency", "f", 40),
        ("frequency", "f", 60), ("frequency", "f", 80),
        ("monetary_c", "m", 20), ("monetary_c", "m", 40),
        ("monetary_c", "m", 60), ("monetary_c", "m", 80)).map {
        case (m, t, p) =>
          floor(expr(s"percentile($m, 0.$p)") * 5 + 0.5)
            .cast("long").as(s"$t$p")
      }: _*)
    def band(m: String, t: String): Column =
      (lit(1) + Seq(20, 40, 60, 80).map(p =>
        when(col(m) * 5 > col(s"$t$p"), 1).otherwise(0): Column)
        .reduce(_ + _)).cast("int")
    r.crossJoin(broadcast(th))
      .select(
        col("custkey"), col("recency_days"), col("frequency"),
        col("monetary_c"),
        band("recency_days", "r").as("r_band"),
        band("frequency", "f").as("f_band"),
        band("monetary_c", "m").as("m_band"))
      .orderBy("custkey")
  }

  /** Event-type transition matrix (first-order Markov counts): each
    * consecutive event pair per user contributes one (prev → next)
    * observation — the behavior-model fit step product analytics runs
    * before simulating journeys. One shuffle: the lag window on the
    * user_id partitioning; the 25-cell matrix aggregate is map-side
    * combined. Ties in ts are broken by event_id so the sequence — and
    * therefore the counts — is engine-deterministic. */
  private val eventsTransitions = Q(
    "events_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |  FROM events
      |)
      |SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir).events
      .select(col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** Tukey-fence (IQR) outlier flagging per group, exact to the last
    * bit: values integerize to cents, interpolated quartiles of
    * integers have at most quarter fractions ((n−1)·0.25 indexing), so
    * ×8 makes the quartiles integers and ×16 clears the 1.5·IQR
    * multiplier — the fence test `16c < 2·q1₈ − 3·(q3₈−q1₈)` is pure
    * int64 with no float boundary to flip cross-engine. The quartile
    * frame is one row per group, broadcast back over the facts (the
    * same shape as the z-score anomaly query, but per-group and
    * robust-statistic). */
  private val aggOutliersIqr = Q(
    "agg_outliers_iqr",
    """WITH v AS (
      |  SELECT event_id, event_type, value,
      |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events
      |), q AS (
      |  SELECT event_type,
      |         CAST(quantile_cont(c, 0.25) * 8 AS BIGINT) AS q1_8,
      |         CAST(quantile_cont(c, 0.75) * 8 AS BIGINT) AS q3_8
      |  FROM v GROUP BY event_type
      |)
      |SELECT v.event_id, v.event_type, v.value,
      |       CASE WHEN v.c * 16 < 2 * q.q1_8 - 3 * (q.q3_8 - q.q1_8)
      |            THEN 'low' ELSE 'high' END AS side
      |FROM v JOIN q USING (event_type)
      |WHERE v.c * 16 < 2 * q.q1_8 - 3 * (q.q3_8 - q.q1_8)
      |   OR v.c * 16 > 2 * q.q3_8 + 3 * (q.q3_8 - q.q1_8)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val v = Tables(s, dir).events
      .select(col("event_id"), col("event_type"), col("value"),
        Det.toUnits(col("value"), 100).as("c"))
    val q = v.groupBy(col("event_type"))
      .agg(
        (expr("percentile(c, 0.25)") * 8).cast("long").as("q1_8"),
        (expr("percentile(c, 0.75)") * 8).cast("long").as("q3_8"))
    val lowBound = lit(2) * col("q1_8") - lit(3) * (col("q3_8") - col("q1_8"))
    val highBound = lit(2) * col("q3_8") + lit(3) * (col("q3_8") - col("q1_8"))
    v.join(broadcast(q), Seq("event_type"))
      .filter(col("c") * 16 < lowBound || col("c") * 16 > highBound)
      .select(
        col("event_id"), col("event_type"), col("value"),
        when(col("c") * 16 < lowBound, "low").otherwise("high").as("side"))
      .orderBy("event_id")
  }

  /** Volume-anomaly detection on hourly event counts, EXACT-integer
    * z-score: flag hours where (n·N − S)² > k²·(N·Q − S²) with k=2 —
    * the algebraic form of |n − mean| > k·σ cleared of every division
    * and square root, so counts-based anomaly detection is
    * bit-reproducible across engines (a float mean/stddev pipeline
    * diverges in the last ulp and flips boundary hours). Terms stay in
    * int64: n ≤ 1e6 events/hour and N ≤ 1e4 hours keep (nN−S)² under
    * 2⁶³. Plan: one fact aggregate to hourly counts, a 1-row global
    * stats aggregate of THAT (tiny), broadcast back over the hours —
    * the same broadcast-scalar enrichment shape as
    * `enrich_scalar_rate`; the fact is scanned once. */
  private val eventsAnomalyHours = Q(
    "events_anomaly_hours",
    """WITH h AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1
      |), s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nh, CAST(sum(n) AS BIGINT) AS sn,
      |         CAST(sum(n * n) AS BIGINT) AS qn
      |  FROM h
      |)
      |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, n,
      |       CAST((n * s.nh - s.sn) * (n * s.nh - s.sn) AS BIGINT) AS dev2_num,
      |       CAST(4 * (s.nh * s.qn - s.sn * s.sn) AS BIGINT) AS thresh
      |FROM h, s
      |WHERE (n * s.nh - s.sn) * (n * s.nh - s.sn) > 4 * (s.nh * s.qn - s.sn * s.sn)
      |ORDER BY hour""".stripMargin) { (s, dir) =>
    val hours = Tables(s, dir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hours.agg(
      count(lit(1)).as("nh"), sum(col("n")).as("sn"),
      sum(col("n") * col("n")).as("qn"))
    val dev = col("n") * col("nh") - col("sn")
    val thresh = lit(4L) * (col("nh") * col("qn") - col("sn") * col("sn"))
    hours.crossJoin(broadcast(stats))
      .filter(dev * dev > thresh)
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"), (dev * dev).as("dev2_num"), thresh.as("thresh"))
      .orderBy("hour")
  }

  /** SCD2 (slowly-changing-dimension type 2) interval build: each
    * customer's order history becomes versioned rows with
    * [valid_from, valid_to) ranges — valid_to is the NEXT version's
    * start via lead(), open versions get the sentinel date and an
    * is_current flag. The standard warehouse dimension-history shape
    * (the reference's BigQuery target would express this as a MERGE +
    * window view). One shuffle: the lead() window partitioned by the
    * (high-cardinality) dimension key; ties broken by the version key
    * so the interval chain is total-ordered and engine-independent. */
  private val scd2Intervals = Q(
    "scd2_intervals",
    """SELECT o_custkey AS custkey, o_orderkey AS version_key,
      |       o_totalprice,
      |       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |       coalesce(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'), '9999-12-31') AS valid_to,
      |       CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY custkey, valid_from, version_key""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val nxt = lead(col("o_orderdate"), 1).over(w)
    Tables(s, dir).orders
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("version_key"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(nxt, "yyyy-MM-dd"), lit("9999-12-31"))
          .as("valid_to"),
        when(nxt.isNull, 1).otherwise(0).cast("int").as("is_current"))
      .orderBy("custkey", "valid_from", "version_key")
  }

  /** Fixed-iteration PageRank over the part↔supplier supply network
    * (bipartite graph off distinct lineitem (partkey, suppkey) pairs,
    * node ids disambiguated even/odd) — iterative graph analytics
    * beyond the connectivity the dedup family already does. Fully
    * integerized so both engines replay it bit-identically: ranks are
    * e6-scaled longs, each neighbor contribution is exact floor
    * division by out-degree, damping is (85·Σ) div 100 — no floats
    * anywhere, so no accumulation-order sensitivity. Plan: the
    * (src, dst, deg) contribution frame is built once and
    * localCheckpointed (three iterations must not re-derive the
    * distinct-pairs scan), then each iteration is exactly one join on
    * src + one aggregate on dst — the partition-by-node shape a
    * 1000-executor Pregel step has; 3 iterations = 3 chained
    * shuffles, no driver-side state, one action at the end. */
  private val graphPagerank = Q(
    "graph_pagerank", {
      def it(k: Int) =
        s""", r$k AS (
           |  SELECT e.dst AS node_id, 150000 + (85 * sum(r.r // d.deg)) // 100 AS r
           |  FROM edges e JOIN r${k - 1} r ON e.src = r.node_id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst
           |)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_partkey * 2 AS pnode, l_suppkey * 2 + 1 AS snode FROM lineitem
         |), edges AS (
         |  SELECT pnode AS src, snode AS dst FROM pairs
         |  UNION ALL
         |  SELECT snode, pnode FROM pairs
         |), deg AS (
         |  SELECT src, count(*) AS deg FROM edges GROUP BY src
         |), r0 AS (
         |  SELECT src AS node_id, CAST(1000000 AS BIGINT) AS r FROM deg
         |)${it(1)}${it(2)}${it(3)}
         |SELECT d.src AS node_id, CAST(d.deg AS BIGINT) AS degree,
         |       CAST(r3.r AS BIGINT) AS rank_e6
         |FROM deg d JOIN r3 ON d.src = r3.node_id
         |ORDER BY node_id""".stripMargin
    }) { (s, dir) =>
    val pairs = Tables(s, dir).lineitem
      .select((col("l_partkey") * 2).as("pnode"),
        (col("l_suppkey") * 2 + 1).as("snode"))
      .distinct()
    val edges = pairs.select(col("pnode").as("src"), col("snode").as("dst"))
      .unionAll(pairs.select(col("snode").as("src"), col("pnode").as("dst")))
    val deg0 = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contrib = edges.join(deg0, "src").cut()
    // Everything after this line reads the checkpointed frame: degrees
    // and the rank seed are re-derived from contrib (tiny), NOT from
    // deg0 — whose lineage would re-scan lineitem and re-run the
    // distinct once per consumer.
    val deg = contrib.select(col("src"), col("deg")).distinct()
    var ranks = deg.select(col("src").as("node_id"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      ranks = contrib
        .join(ranks, col("src") === col("node_id"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node_id"),
          expr("150000 + (85 * sc) div 100").as("r"))
    }
    deg.join(ranks, col("src") === col("node_id"))
      .select(col("node_id"), col("deg").cast("long").as("degree"),
        col("r").cast("long").as("rank_e6"))
      .orderBy("node_id")
  }

  /** Latest-wins merge/upsert (the warehouse CDC shape): a change batch
    * overlays a base snapshot, keyed rows resolved to the highest
    * version. Here the change batch is derived deterministically from
    * orders (every 7th key re-priced) so the oracle can rebuild it.
    * Plan: union is partition-local; the only shuffle is the window on
    * the merge key. At scale the base side of that shuffle is the whole
    * table — with a bucketed base (see [[StorageQueries]] /
    * [[Bucketing]]) the exchange drops to the delta only, which is the
    * standard MERGE layout; this query demonstrates the semantics on
    * plain parquet. Per-row `price * 1.1` is a single IEEE multiply on
    * identical inputs — bit-identical across engines, no Det needed. */
  private val mergeUpsert = Q(
    "merge_upsert",
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, 1 AS src_version
      |  FROM orders
      |), updates AS (
      |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
      |         'U' AS o_orderstatus, 2 AS src_version
      |  FROM orders WHERE o_orderkey % 7 = 0
      |), merged AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |                               ORDER BY src_version DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
      |)
      |SELECT o_orderkey, o_totalprice, o_orderstatus,
      |       CAST(src_version AS INTEGER) AS src_version
      |FROM merged WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val orders = Tables(s, dir).orders
    val base = orders.select(
      col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
      lit(1).as("src_version"))
    val updates = orders.filter(col("o_orderkey") % 7 === 0).select(
      col("o_orderkey"),
      (col("o_totalprice") * lit(1.1)).as("o_totalprice"),
      lit("U").as("o_orderstatus"),
      lit(2).as("src_version"))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("src_version").desc)
    base.unionAll(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "src_version")
      .orderBy("o_orderkey")
  }

  /** Snapshot diff (CDC between two table versions) — the day-over-day
    * audit every batch pipeline runs before publishing: classify every
    * key as added / removed / changed by FULL OUTER joining snapshot A
    * (the standing corpus, `doc_id % 20 <> 0` — the same convention as
    * the incremental dedup family) against snapshot B (next day's
    * corpus: some standing docs dropped, `% 23 = 5`; some re-crawled
    * with new content, `% 17 = 0`, modeled as an uppercase re-edit).
    * Rows compare by md5 content hash, never by payload, so the join
    * carries two narrow columns regardless of document size; unchanged
    * keys are filtered OUT before the determinism ORDER BY, so the
    * result is changes-sized. At 100 TB this is one sort-merge join on
    * the snapshot key with both scans pruned to (key, hash) — the
    * canonical reconciliation shape. */
  private val snapshotDiff = Q(
    "snapshot_diff",
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 20 <> 0
      |), b AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 17 = 0 THEN upper(text) ELSE text END) AS h
      |  FROM documents WHERE doc_id % 23 <> 5
      |), j AS (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |         CASE WHEN a.doc_id IS NULL THEN 'added'
      |              WHEN b.doc_id IS NULL THEN 'removed'
      |              WHEN a.h <> b.h THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |)
      |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val snapA = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("a_id"), md5(col("text")).as("a_h"))
    val snapB = docs.filter(col("doc_id") % 23 =!= 5)
      .select(col("doc_id").as("b_id"),
        md5(when(col("doc_id") % 17 === 0, upper(col("text")))
          .otherwise(col("text"))).as("b_h"))
    snapA.join(snapB, col("a_id") === col("b_id"), "full_outer")
      .select(
        coalesce(col("a_id"), col("b_id")).as("doc_id"),
        when(col("a_id").isNull, "added")
          .when(col("b_id").isNull, "removed")
          .when(col("a_h") =!= col("b_h"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy("doc_id")
  }

  /** Market-basket affinity — `text_collocations`' lift ranking
    * applied to order baskets: part pairs co-purchased in the same
    * order, ranked by corpus lift kept entirely in int64
    * (`n_both·n_orders·1e6 div (n_a·n_b)`, monotone in PMI, no libm).
    * The (order, part) item set is distinct-ed once and checkpointed
    * (consumed by the order count, the per-part counts, and both
    * sides of the pair join); the self-join shuffles on the order key
    * only, so pair expansion is bounded by basket size — linear in
    * items, never parts². Count attachments are plain key joins with
    * no broadcast hint: the per-part counts frame is dimension-sized,
    * so AQE size-gates it exactly like the dup-labels joins. Top-25
    * through TakeOrdered with full-key tie-break. */
  private val basketAffinity = Q(
    "basket_affinity",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS oid, l_partkey AS pid FROM lineitem
      |), n AS (
      |  SELECT CAST(count(DISTINCT oid) AS BIGINT) AS n_orders FROM items
      |), cx AS (
      |  SELECT pid, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY pid
      |), pairs AS (
      |  SELECT a.pid AS part_a, b.pid AS part_b,
      |         CAST(count(*) AS BIGINT) AS n_both
      |  FROM items a JOIN items b ON a.oid = b.oid AND a.pid < b.pid
      |  GROUP BY a.pid, b.pid
      |)
      |SELECT part_a, part_b, n_both, ca.c AS n_a, cb.c AS n_b,
      |       ((n_both * 1000000) // ca.c) * n_orders // cb.c AS lift_ppm
      |FROM pairs
      |JOIN cx ca ON ca.pid = part_a
      |JOIN cx cb ON cb.pid = part_b, n
      |WHERE n_both >= 2
      |ORDER BY lift_ppm DESC, part_a, part_b LIMIT 25""".stripMargin) {
    (s, dir) =>
    val items = Tables(s, dir).lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("pid"))
      .distinct()
      .cut(false)
    val nOrders = items.agg(countDistinct(col("oid")).as("n_orders"))
    val cx = items.groupBy(col("pid")).agg(count(lit(1)).as("c"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.oid") === col("b.oid") && col("a.pid") < col("b.pid"))
      .groupBy(col("a.pid").as("part_a"), col("b.pid").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    pairs
      .join(cx.select(col("pid").as("part_a"), col("c").as("n_a")), Seq("part_a"))
      .join(cx.select(col("pid").as("part_b"), col("c").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      // Staged division: n_both ≤ n_a keeps the first quotient ≤ 1e6,
      // so the n_orders product stays inside int64 at any corpus size —
      // the single-expression form overflows on both the numerator AND
      // the n_a·n_b denominator once counts reach ~1e10.
      .withColumn("lift_ppm",
        expr("((n_both * 1000000) DIV n_a) * n_orders DIV n_b"))
      .select("part_a", "part_b", "n_both", "n_a", "n_b", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))
      .limit(25)
  }

  /** Runtime-filter-eligible fact join: urgent-order line revenue by
    * order status. The SHAPE is the point — a selectively filtered
    * dimension leg (orders, 1/5 pass the priority predicate) joined to
    * the unfiltered fact spine (lineitem) on the order key. This is
    * exactly the pattern Spark's `InjectRuntimeFilter` rule targets at
    * scale: with `spark.sql.optimizer.runtime.bloomFilter.enabled` a
    * bloom filter built from the filtered creation side is pushed into
    * the lineitem scan as a `might_contain` semi-filter, so at 100 TB
    * the fact side sheds ~80% of its rows BEFORE the join shuffle
    * instead of after. Locally the 10 GB application-side threshold
    * keeps the injection off (results are threshold-invariant — the
    * filter is semantics-free); PlanShapeSpec drops the thresholds and
    * proves this exact plan takes the bloom filter. Aggregation is the
    * usual partial-agg groupBy on a 3-value key. */
  private val joinRuntimeFilter = Q(
    "join_runtime_filter",
    s"""SELECT o_orderstatus, count(*) AS n_lines,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Daily new-user accounting with a running total — the audience
    * growth curve. Scale shape: per-user first-seen date is one
    * user-keyed partial-agg groupBy (the only corpus-sized shuffle);
    * per-day news collapse that to ≤ one row per day, and the running
    * total's unpartitioned window runs over the DAY frame — bounded by
    * the calendar, not the corpus (a few thousand rows even for a
    * decade of data), the same metadata-window contract as the tier
    * report. Day emitted as a formatted string (timestamp-type
    * parquet/tz artifacts stay out of the hash compare). */
  private val eventsNewUsersCumulative = Q(
    "events_new_users_cumulative",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS d
      |  FROM events GROUP BY user_id
      |), nd AS (
      |  SELECT d, count(*) AS n_new FROM f GROUP BY d
      |)
      |SELECT strftime(d, '%Y-%m-%d') AS day, n_new,
      |       CAST(sum(n_new) OVER (ORDER BY d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum_users
      |FROM nd ORDER BY day""".stripMargin) { (s, dir) =>
    val perDay = Tables(s, dir).events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_new"), sum(col("n_new")).over(w).as("cum_users"))
      .orderBy("day")
  }

  /** 7-day rolling active users per active day (WAU) — EXACT rolling
    * distinct, computed scale-first: a rolling `count(distinct)` has
    * no distributive form, so each (user, day) presence row is
    * EXPLODED to the ≤ 7 report days it can serve (a fixed ×7 map-side
    * expansion, still linear) and the rest is one distinct + one
    * count aggregate on (report_day, user). The tempting alternative —
    * a day-spine range join — plans as a broadcast nested loop whose
    * probe side re-scans presence per day; the offset explode keeps
    * everything equi-keyed. Report days are restricted to days that
    * have activity themselves (a broadcast semi against the
    * metadata-sized day frame). */
  private val eventsWau = Q(
    "events_wau",
    """WITH p AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |), days AS (
      |  SELECT DISTINCT d FROM p
      |), w AS (
      |  SELECT p.d + CAST(o.o AS INTEGER) AS rd, p.user_id
      |  FROM p CROSS JOIN (SELECT unnest(range(0, 7)) AS o) o
      |)
      |SELECT strftime(w.rd, '%Y-%m-%d') AS day,
      |       count(DISTINCT w.user_id) AS wau
      |FROM w JOIN days ON w.rd = days.d
      |GROUP BY w.rd ORDER BY day""".stripMargin) { (s, dir) =>
    val p = Tables(s, dir).events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .cut()
    val days = p.select(col("d")).distinct()
    p.select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("o"), col("d"))
      .select(col("user_id"), date_add(col("d"), col("o")).as("rd"))
      .join(broadcast(days), col("rd") === col("d"), "left_semi")
      .groupBy(col("rd"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(date_format(col("rd"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy("day")
  }

  /** EXACT distributed OLS via sufficient statistics — the regression
    * analog of the engine's integerized-determinism discipline
    * (DuckDB ships `regr_slope`/`regr_intercept`, but float fold
    * order makes those engine-dependent; this is the cross-engine-
    * exact form). Inputs integerize first (quantity as units, price
    * as cents), then ONE map-side-combinable aggregation per group
    * collects the five sufficient statistics (n, Σx, Σy, Σx², Σxy) as
    * exact integers — at 100 TB this is a single partial-agg shuffle
    * of 5 numbers per group, the cheapest possible regression — and
    * the closed-form slope/intercept assemble driver-free from exact
    * DECIMAL(38,0) cross-products (n·Σxy − Σx·Σy can pass 2^63 at
    * warehouse scale, so the products stay decimal INTERNALLY on BOTH
    * engines; the quotient is the correctly-rounded double of two
    * exact integers — identical on any IEEE engine). The emitted
    * num/den columns are DOUBLE, each the correctly-rounded cast of
    * the exact decimal — identical on both engines at ANY magnitude
    * (IEEE round-to-nearest of the same exact integer). Two rejected
    * alternatives: emitting the decimal raw survives into Spark
    * parquet as `Decimal(…)` objects while the DuckDB oracle frame
    * float-coerces the same value, so the hash diverges on
    * representation despite bit-identical values (the round-6
    * `sql_q6` dtype incident, tools/check_oracle.py); emitting
    * BIGINT overflows DATA-DEPENDENTLY — slope_num ≈ n²·cov(x,y)
    * crosses 2^63 near ~5·10^5 rows per group on strongly-correlated
    * data (TPC-H-shaped cov ≈ 3e7 cents), throwing under ANSI and
    * silently nulling otherwise. A caller needing the full integer
    * past 2^53 reads the exact DECIMAL intermediates — the
    * arithmetic above the final cast is already exact. */
  private val regrOls = Q(
    "regr_ols",
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS HUGEINT) AS n,
      |         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)) AS sx,
      |         SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)) AS sy,
      |         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)
      |             * CAST(floor(l_quantity + 0.5) AS HUGEINT)) AS sxx,
      |         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)
      |             * CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)) AS sxy,
      |         SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
      |             * CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)) AS syy
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT l_returnflag,
      |       CAST(n AS BIGINT) AS n_rows,
      |       CAST(n * sxy - sx * sy AS DOUBLE) AS slope_num,
      |       CAST(n * sxx - sx * sx AS DOUBLE) AS slope_den,
      |       CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_qty,
      |       CAST(sy * sxx - sx * sxy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents,
      |       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
      |         / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
      |FROM s ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val ux = floor(col("l_quantity") + lit(0.5)).cast("long")
    val uy = floor(col("l_extendedprice") * 100.0 + lit(0.5)).cast("long")
    val dec = "decimal(38,0)"
    val stats = Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(dec).as("n"),
        // decimal BEFORE the sum, like the product stats: a long sum
        // of cents passes 2^63 around 10^13 rows and Spark's non-ANSI
        // sum wraps silently where the DuckDB twin's HUGEINT doesn't.
        sum(ux.cast(dec)).cast(dec).as("sx"),
        sum(uy.cast(dec)).cast(dec).as("sy"),
        sum(ux.cast(dec) * ux.cast(dec)).as("sxx"),
        sum(ux.cast(dec) * uy.cast(dec)).as("sxy"),
        sum(uy.cast(dec) * uy.cast(dec)).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val sden = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    stats.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        num.as("slope_num"),
        den.as("slope_den"),
        (num / den).as("slope_cents_per_qty"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / den).as("intercept_cents"),
        ((num * num) / (den * sden)).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Grouped MODE with a deterministic tie-break (max count, then min
    * value) — the categorical summary builtins leave engine-defined
    * (Spark's `mode` and DuckDB's pick arbitrary ties). Two map-side
    * combinable aggregates: counts per (group, value), then rank-1 per
    * group through a WindowGroupLimit-prunable row_number. */
  private val aggMode = Q(
    "agg_mode",
    """WITH c AS (
      |  SELECT o_orderstatus, o_orderpriority,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |             ORDER BY cnt DESC, o_orderpriority) AS rk,
      |         CAST(count(*) OVER (PARTITION BY o_orderstatus) AS BIGINT)
      |           AS n_distinct
      |  FROM c
      |)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority,
      |       cnt AS mode_count, n_distinct
      |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val counts = Tables(s, dir).orders
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("n_distinct",
        count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))))
      .filter(col("rk") === 1)
      .select(
        col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt").as("mode_count"), col("n_distinct"))
      .orderBy("o_orderstatus")
  }

  /** LISTAGG / string_agg with a PINNED order — the SQL-standard
    * string aggregation whose ordering both engines otherwise leave
    * to partition luck. Distinct values, sorted, comma-joined:
    * collect_set is order-free (map-side combinable), array_sort
    * restores determinism before the join — the only safe shape for
    * a distributed listagg. */
  private val aggListagg = Q(
    "agg_listagg",
    """SELECT o_orderstatus,
      |       string_agg(DISTINCT o_orderpriority, ','
      |                  ORDER BY o_orderpriority) AS priorities_csv,
      |       CAST(count(DISTINCT o_orderpriority) AS BIGINT)
      |         AS n_distinct,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities_csv"),
        countDistinct(col("o_orderpriority")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderstatus")
  }

  /** Revenue concentration (Lorenz/Pareto): customers ranked by exact
    * cent revenue, bucketed into spend deciles, each decile's share of
    * total revenue as one divide of exact integers — the "does 20% of
    * the base drive 80% of revenue" read.
    *
    * The global rank over the customer aggregate (~15M rows at TPC-H
    * sf100) is NOT a single-task window: it decomposes exactly via the
    * `curriculum_order` cell machinery. cell = cents DIV 10^6 is a
    * monotone function of the primary sort key, so cells are
    * CONTIGUOUS under the (cents DESC, o_custkey) order — the rank
    * window partitions by cell (distributed), and a cumulative
    * cells-after offset comes from the cell histogram (one row per
    * $10k revenue band — metadata-sized, windowed in one task,
    * broadcast back). global rank = offset(cell) + rank-in-cell
    * reproduces `row_number() OVER (ORDER BY cents DESC, o_custkey)`
    * bit-exactly; the oracle computes the naive global window and
    * must agree. Decile = (rank-1)*10/n so bucket boundaries are
    * exact integer arithmetic on both engines. */
  private val customerPareto = Q(
    "customer_pareto",
    s"""WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(sum(${Det.sqlUnits("o_totalprice", 100)}) AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey
      |), ranked AS (
      |  SELECT o_custkey, cents,
      |         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
      |         CAST(count(*) OVER () AS BIGINT) AS n,
      |         CAST(sum(cents) OVER () AS BIGINT) AS total
      |  FROM rev
      |)
      |SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(cents) AS BIGINT) AS cents,
      |       CAST(sum(cents) AS DOUBLE) / CAST(max(total) AS DOUBLE)
      |         AS revenue_share
      |FROM ranked GROUP BY (rk - 1) * 10 // n
      |ORDER BY decile""".stripMargin) { (s, dir) =>
    val rev = Tables(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(sum(Det.toUnits(col("o_totalprice"), 100L)).as("cents"))
      .withColumn("cell", expr("cents DIV 1000000"))
      .cut()
    // Per-cell rank: distributed (one window partition per $10k band).
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(col("cents").desc, col("o_custkey"))
    // Cells-before offset under DESC order, from the metadata-sized
    // cell histogram; totals ride the same tiny frame.
    val wOff = Window.orderBy(col("cell").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val hist = rev.groupBy(col("cell"))
      .agg(count(lit(1)).as("cn"), sum(col("cents")).as("ccents"))
    val offs = hist
      .withColumn("cell_off", coalesce(sum(col("cn")).over(wOff), lit(0L)))
      .select(col("cell"), col("cell_off"))
    val tot = hist.agg(sum(col("cn")).as("n"), sum(col("ccents")).as("total"))
    rev
      .withColumn("r_in_cell", row_number().over(wCell).cast("long"))
      .join(broadcast(offs), Seq("cell"))
      .crossJoin(broadcast(tot))
      .withColumn("rk", col("cell_off") + col("r_in_cell"))
      .groupBy(expr("(rk - 1) * 10 div n").as("decile"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("cents")).as("cents"),
        (sum(col("cents")).cast("double")
          / max(col("total")).cast("double")).as("revenue_share"))
      .orderBy("decile")
  }

  val queries: Seq[Q] = Seq(
    regrOls, aggMode, aggListagg, customerPareto,
    joinRuntimeFilter, eventsNewUsersCumulative, eventsWau,
    basketAffinity,
    snapshotDiff,
    aggGroup, aggRollup, aggCube, q3ShippingPriority,
    q5LocalSupplierVolume, q17SmallQuantity, q18LargeOrders,
    q20ExcessSuppliers, aggGroupingSets, unpivotLong, joinSemireduced,
    joinBroadcast,
    joinSortmerge, joinAnti, joinSemi, topkPerGroup, distinctUsers,
    approxDistinct, aggApproxTopk, aggQuantilesApprox, topk, setOps,
    windowLagReturn, windowMovingAvg, windowTumbling, windowSession,
    aggSalted, joinSalted, joinSkewAqe, joinSkewSalted, aggQuantiles, aggPivot, joinRange, joinIntervalOverlap, joinAsof,
    joinAsofForward, joinAsofTolerance, joinPointInTime,
    aggHistogram, mergeUpsert, funnelSteps, retentionCohorts,
    graphPagerank, scd2Intervals, q10ReturnedItems, windowRankSuite,
    joinOuterFull, eventsAnomalyHours, timeseriesFfill,
    attributionLastTouch, aggOutliersIqr, customerRfm, eventsTransitions)
}

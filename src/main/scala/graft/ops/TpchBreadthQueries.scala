package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps
import graft.util.Det
import graft.{Q, Tables}

/** TPC-H breadth shapes beyond the Q1/Q3/Q5/Q6/Q10/Q17/Q18/Q20 set in
  * [[RelationalQueries]] / [[graft.functions.SqlQueries]] — the remaining
  * public-domain analytical plan families expressible on the driver's
  * schema (no partsupp table, no shipmode/commitdate columns, so Q2/Q4/
  * Q9/Q11/Q12/Q16/Q21 have no faithful mapping and are omitted rather
  * than faked).
  *
  * Each query documents the plan that must hold at 100 TB: which side
  * broadcasts, where the one unavoidable fact-spine shuffle lands, and
  * how ratio aggregates stay engine-deterministic (numerator and
  * denominator as exact int64 unit sums, ONE double division at the end —
  * [[graft.util.Det]]).
  */
object TpchBreadthQueries {

  /** TPC-H Q7 shape (volume shipping between two nations): the
    * multi-dimension star with a post-join disjunction over attributes of
    * BOTH dimension legs. Plan at scale: supplier and customer each
    * pre-filtered to the two nations of interest (25× reduction) before
    * anything touches the fact table, so both legs broadcast; lineitem ⋈
    * orders on the order key is the single big-big shuffle. The
    * nation-pair disjunction cannot be pushed below the second dim join
    * (it relates the two legs), so it runs as the first post-join filter.
    */
  private val q7NationVolume = Q(
    "q7_nation_volume",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val nations = Seq("NATION_1", "NATION_2")
    val supp = t.supplier
      .join(broadcast(t.nation.filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t.customer
      .join(broadcast(t.nation.filter(col("n_name").isin(nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape (market share): a ratio aggregate — one nation's
    * share of total qualifying volume per order year. The determinism
    * trap in every ratio-of-sums: both sums must be exact int64 unit
    * sums, with the ONE double division at the end; summing doubles on
    * either side would make the hash partition-order-dependent.
    * Plan: part is the most selective dimension (1/6 of parts), so it
    * broadcasts onto lineitem FIRST, shrinking the fact spine before the
    * lineitem ⋈ orders shuffle; region→nation→customer collapses to a
    * broadcast customer-key set; supplier⋈nation broadcasts for the
    * numerator's nation name.
    */
  private val q8MarketShare = Q(
    "q8_market_share",
    s"""WITH slice AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |         ${Det.sqlUnits("l_extendedprice * (1.0 - l_discount)", 100)} AS vol_units,
       |         n1.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  JOIN region ON n2.n_regionkey = r_regionkey
       |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |)
       |SELECT o_year,
       |       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol_units ELSE 0 END) AS DOUBLE)
       |         / sum(vol_units) AS mkt_share
       |FROM slice GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val asiaCust = t.customer
      .join(broadcast(t.nation
          .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val volUnits =
      Det.toUnits(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100L)
    t.lineitem
      .join(broadcast(t.part.filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(
        t.orders.filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .select(
        year(col("o_orderdate")).cast("long").as("o_year"),
        volUnits.as("vol_units"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_2", col("vol_units"))
          .otherwise(lit(0L))).cast("double") / sum(col("vol_units")))
        .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q13 shape (customer distribution): LEFT OUTER join + two-level
    * aggregation — "how many customers placed k orders", zero-order
    * customers included. The outer join is the point: an inner join would
    * silently drop the k=0 bucket. Plan at scale: both sides are large,
    * so this is the canonical shuffle-on-custkey sort-merge LEFT join;
    * the first aggregate rides the join's partitioning (no extra
    * exchange), the second is a near-free re-aggregation of ≤ max-k rows
    * per partition. The order-side predicate lives in the JOIN condition,
    * not WHERE — pushing it to WHERE would turn the outer join inner.
    */
  private val q13CustomerDistribution = Q(
    "q13_customer_distribution",
    """WITH per_cust AS (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON c_custkey = o_custkey
      |                  AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(
        t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 shape (promo revenue): a conditional-share scalar over one
    * month — the simplest ratio aggregate, and the one that proves the
    * date filter reaches the lineitem scan (PushedFilters) so the
    * broadcast part join only sees the month slice. Same int64-units
    * ratio discipline as Q8.
    */
  private val q14PromoRevenue = Q(
    "q14_promo_revenue",
    s"""SELECT CAST(100 AS DOUBLE) *
       |       CAST(sum(CASE WHEN p_type = 'PROMO'
       |                THEN ${Det.sqlUnits("l_extendedprice * (1.0 - l_discount)", 100)}
       |                ELSE 0 END) AS DOUBLE)
       |         / sum(${Det.sqlUnits("l_extendedprice * (1.0 - l_discount)", 100)})
       |         AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val units =
      Det.toUnits(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100L)
    t.lineitem
      .filter(
        col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", units).otherwise(lit(0L)))
          .cast("double") / sum(units)).as("promo_revenue"))
  }

  /** TPC-H Q15 shape (top supplier): aggregate → global max → filter back
    * — the "argmax over an aggregate" family. Decorrelated the only way
    * that scales: the per-supplier revenue frame is computed ONCE
    * (localCheckpointed, so the max branch and the probe share one fact
    * scan + one aggregation — the q17 precedent), its 1-row max
    * broadcasts back onto it, and only the winners join the supplier
    * dimension. Catalyst rewrites the filtered cross join into a
    * broadcast EQUI-join on rev_units = max_units — strictly better
    * than a nested-loop pass, and pinned by PlanShapeSpec. Revenue
    * compares in exact int64 units so the max-equality is
    * bit-deterministic; the double conversion happens after selection.
    */
  private val q15TopSupplier = Q(
    "q15_top_supplier",
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |         sum(${Det.sqlUnits("l_extendedprice * (1.0 - l_discount)", 100)}) AS rev_units
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey
       |)
       |SELECT s_suppkey, s_name,
       |       CAST(rev_units AS DOUBLE) / 100.0 AS total_revenue
       |FROM rev JOIN supplier ON s_suppkey = l_suppkey
       |WHERE rev_units = (SELECT max(rev_units) FROM rev)
       |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val rev = t.lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(Det.toUnits(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100L))
        .as("rev_units"))
      .cut()
    val top = rev
      .crossJoin(broadcast(rev.agg(max(col("rev_units")).as("max_units"))))
      .filter(col("rev_units") === col("max_units"))
    top
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_units").cast("double") / lit(100.0)).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q19 shape (disjunctive predicate join): OR-of-ANDs spanning
    * both join sides. The scale lesson: the disjunction itself cannot be
    * a join key, but its per-side envelopes CAN be pushed down manually —
    * part pre-filters to the three brands and the size hull, lineitem to
    * the quantity hull — so the broadcast build side and the probe stream
    * both shrink before the residual OR evaluates. Catalyst keeps the
    * envelope filters in the scans (PushedFilters) and evaluates the
    * residual inside whole-stage codegen.
    */
  private val q19DisjunctivePred = Q(
    "q19_disjunctive_pred",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
       |       ${Det.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10
       |        AND l_quantity >= 1 AND l_quantity <= 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       |        AND l_quantity >= 5 AND l_quantity <= 30)
       |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 40
       |        AND l_quantity >= 10 AND l_quantity <= 40)""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val parts = t.part
      .filter(col("p_brand").isin("Brand#4", "Brand#2", "Brand#19") &&
        col("p_size").between(1, 40))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    t.lineitem
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 10) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
            col("l_quantity") >= 5 && col("l_quantity") <= 30) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(10, 40) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 40))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  /** TPC-H Q22 shape (global sales opportunity): scalar-average subquery
    * + anti join — "above-average-balance customers with no recent
    * orders", by nation (the recency predicate pushes to the orders scan
    * and keeps the anti-join build side a fraction of the order book).
    * Determinism: the average comparison is done entirely in
    * int64 (balance_units × count > sum_units) so no engine ever computes
    * a double average; Det only converts the final reported sum. Plan at
    * scale: the 1-row stats frame broadcasts (enrich pattern), the anti
    * join shuffles customer and orders on the customer key once — orders
    * projects to the bare key before the shuffle, the smallest possible
    * spine.
    */
  private val q22GlobalSales = Q(
    "q22_global_sales",
    s"""WITH stats AS (
       |  SELECT sum(${Det.sqlUnits("c_acctbal", 100)}) AS sum_units,
       |         CAST(count(*) AS BIGINT) AS n_pos
       |  FROM customer WHERE c_acctbal > 0.0
       |)
       |SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
       |       ${Det.sqlDsum("c_acctbal")} AS total_acctbal
       |FROM customer CROSS JOIN stats
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE ${Det.sqlUnits("c_acctbal", 100)} * n_pos > sum_units
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val stats = t.customer
      .filter(col("c_acctbal") > 0.0)
      .agg(
        sum(Det.toUnits(col("c_acctbal"), 100L)).as("sum_units"),
        count(lit(1)).as("n_pos"))
    t.customer
      .crossJoin(broadcast(stats))
      .filter(Det.toUnits(col("c_acctbal"), 100L) * col("n_pos") > col("sum_units"))
      .join(
        t.orders
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        Det.dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("n_name")
  }

  val queries: Seq[Q] = Seq(
    q7NationVolume, q8MarketShare, q13CustomerDistribution,
    q14PromoRevenue, q15TopSupplier, q19DisjunctivePred, q22GlobalSales)
}

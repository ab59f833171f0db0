package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Core relational inventory: SURVEY.md §2 B2 (projection/filter), B3
  * (joins), B4 (aggregation), B6-partial (distinct). Each query is written
  * declaratively so Catalyst pushes filters/pruning into the parquet scan;
  * dimension-side join inputs are explicitly `broadcast(...)` — at 100 TB
  * the fact table (lineitem/orders/events) is the only side that should
  * ever shuffle, and the TPC-H dims stay broadcast-size at every SF.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: multi-aggregate hash agg with
    * map-side partial aggregation (free from groupBy.agg). */
  private val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)      AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6)      AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** B2: projection, aliasing, computed columns, CASE WHEN, IN, BETWEEN,
    * LIKE, NOT — all pushed into the parquet scan as PushedFilters. */
  private val q02 = Q(
    "q02_filter_project",
    """SELECT p_partkey,
       upper(p_brand) AS brand,
       CASE WHEN p_size < 20 THEN 'small'
            WHEN p_size < 35 THEN 'medium'
            ELSE 'large' END AS size_class,
       round(p_retailprice * 1.1, 2) AS marked_up
       FROM part
       WHERE p_size BETWEEN 10 AND 40
         AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
         AND (p_type LIKE '%O%' OR p_name LIKE '%gear%')
         AND NOT (p_retailprice < 910.0)
       ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_size").between(10, 40)
        && col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5")
        && (col("p_type").like("%O%") || col("p_name").like("%gear%"))
        && !(col("p_retailprice") < 910.0))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand"),
        when(col("p_size") < 20, "small")
          .when(col("p_size") < 35, "medium")
          .otherwise("large").as("size_class"),
        round(col("p_retailprice") * 1.1, 2).as("marked_up"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q3-shaped shipping priority: 3-way join (broadcast the filtered
    * customer dim into orders, shuffle only lineitem), agg, top-k. */
  private val q03 = Q(
    "q03_shipping_priority",
    """SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS odate, o_orderpriority
       FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
       GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1996-03-15 00:00:00")))
    // broadcast only the true dim (customer); orders⋈lineitem is
    // fact⋈fact — shuffle join, AQE picks the physical strategy
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select("l_orderkey", "revenue", "odate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-shaped: EXISTS via left-semi join, then count by priority. */
  private val q04 = Q(
    "q04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
    val li = Tables.lineitem(s, d)
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-shaped: 6-way star join. All five dims broadcast; lineitem is
    * the only shuffled input (one shuffle for the final groupBy). */
  private val q05 = Q(
    "q05_local_supplier_volume",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name""") { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    // lineitem⋈orders is the one fact⋈fact shuffle; every other side is a
    // broadcast-size dim at any SF
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-shaped: global (no-key) aggregate over a tight scan filter. */
  private val q06 = Q(
    "q06_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.04 AND 0.08
         AND l_quantity < 24""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_discount").between(0.04, 0.08)
        && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q13-shaped: LEFT OUTER join + double aggregation — customers per
    * order count, exercising null semantics on the outer side. */
  private val q07 = Q(
    "q07_cust_order_histogram",
    """SELECT c_count, count(*) AS custdist FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         GROUP BY c_custkey) t
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "5-LOW",
        "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** B3: left-anti join (NOT EXISTS) + right outer join null handling:
    * suppliers with no 1995 shipments, bucketed by nation. */
  private val q08 = Q(
    "q08_anti_join",
    """SELECT n_name, count(*) AS idle_suppliers,
              round(sum(s_acctbal), 2) AS total_bal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE NOT EXISTS (
         SELECT 1 FROM lineitem
         WHERE l_suppkey = s_suppkey
           AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
       GROUP BY n_name ORDER BY n_name""") { (s, d) =>
    val li95 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")))
    Tables.supplier(s, d)
      .join(li95, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("idle_suppliers"), round(sum("s_acctbal"), 2).as("total_bal"))
      .orderBy("n_name")
  }

  /** B3: theta/range join — lineitem banded into quantity brackets by a
    * non-equi BETWEEN condition (BroadcastNestedLoopJoin physical). */
  private val q09 = Q(
    "q09_range_bracket_join",
    """SELECT b.bracket, count(*) AS n, round(avg(l.l_extendedprice), 4) AS avg_price
       FROM lineitem l
       JOIN (SELECT i AS bracket, i * 10 AS lo, i * 10 + 10 AS hi
             FROM range(5) t(i)) b
         ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
       GROUP BY b.bracket ORDER BY b.bracket""") { (s, d) =>
    val brackets = s.range(5).select(
      col("id").as("bracket"), (col("id") * 10).as("lo"), (col("id") * 10 + 10).as("hi"))
    Tables.lineitem(s, d)
      .join(broadcast(brackets),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("bracket")
      .agg(count(lit(1)).as("n"), round(avg("l_extendedprice"), 4).as("avg_price"))
      .orderBy("bracket")
  }

  /** B3: full outer join over two aggregated sides (order spend vs event
    * spend per key), with coalesce over the null sides. */
  private val q10 = Q(
    "q10_full_outer_join",
    """SELECT coalesce(o.k, e.k) AS k,
              round(coalesce(o.order_total, 0), 2) AS order_total,
              round(coalesce(e.event_total, 0), 2) AS event_total
       FROM (SELECT o_custkey AS k, sum(o_totalprice) AS order_total
             FROM orders WHERE o_custkey < 20 GROUP BY o_custkey) o
       FULL OUTER JOIN
            (SELECT user_id AS k, sum(value) AS event_total
             FROM events GROUP BY user_id) e
       ON o.k = e.k
       ORDER BY k""") { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_custkey") < 20)
      .groupBy(col("o_custkey").as("k")).agg(sum("o_totalprice").as("order_total"))
    val e = Tables.events(s, d)
      .groupBy(col("user_id").as("k")).agg(sum("value").as("event_total"))
    o.join(e, o("k") === e("k"), "full_outer")
      .select(coalesce(o("k"), e("k")).as("k"),
        round(coalesce(col("order_total"), lit(0)), 2).as("order_total"),
        round(coalesce(col("event_total"), lit(0)), 2).as("event_total"))
      .orderBy("k")
  }

  /** B4: ROLLUP with grouping-null labeling via coalesce (no nulls in the
    * underlying dims, so the labels are unambiguous). */
  private val q11 = Q(
    "q11_rollup",
    """SELECT coalesce(r_name, 'ALL') AS region_name,
              coalesce(n_name, 'ALL') AS nation_name,
              count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY region_name, nation_name""") { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"), col("total_bal"))
      .orderBy("region_name", "nation_name")
  }

  /** B4: CUBE over two independent dimensions. */
  private val q12 = Q(
    "q12_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(l_linestatus, 'ALL') AS ls,
              count(*) AS n, round(sum(l_quantity), 2) AS qty
       FROM lineitem
       GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY rf, ls""") { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy("rf", "ls")
  }

  /** B3: right outer join — event activity per customer, customers with
    * no events preserved on the right side. */
  private val q31 = Q(
    "q31_right_outer_join",
    """SELECT c_custkey, c_mktsegment,
              coalesce(e.n, 0) AS n_events,
              (e.n IS NULL) AS inactive
       FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id) e
       RIGHT OUTER JOIN customer ON e.user_id = c_custkey
       ORDER BY c_custkey""") { (s, d) =>
    val e = Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    e.join(Tables.customer(s, d), col("user_id") === col("c_custkey"), "right_outer")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n"), lit(0)).as("n_events"),
        col("n").isNull.as("inactive"))
      .orderBy("c_custkey")
  }

  /** B4: explicit GROUPING SETS through the SQL entry point. */
  private val q32 = Q(
    "q32_grouping_sets",
    """SELECT coalesce(r_name, 'ALL') AS region_name,
              coalesce(c_mktsegment, 'ALL') AS segment,
              count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
       FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
       GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
       ORDER BY region_name, segment""") { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_gs_cust")
    Tables.nation(s, d).createOrReplaceTempView("graft_gs_nation")
    Tables.region(s, d).createOrReplaceTempView("graft_gs_region")
    s.sql(
      """SELECT coalesce(r_name, 'ALL') AS region_name,
                coalesce(c_mktsegment, 'ALL') AS segment,
                count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
         FROM graft_gs_cust
           JOIN graft_gs_nation ON c_nationkey = n_nationkey
           JOIN graft_gs_region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
         ORDER BY region_name, segment""")
  }

  val defs: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q31, q32)
}

package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** B3 advanced joins: the as-of join (Spark has no built-in) composed from
  * union + running `last(_, ignoreNulls)` — the scalable formulation: ONE
  * shuffle on the join key, no per-row subquery, no range explosion. Also
  * the correlated-scalar-subquery surface via `spark.sql`.
  */
object AdvancedJoins {

  /** As-of join: for every event, the most recent order of the same
    * customer at-or-before the event time (ties: max o_orderkey).
    *
    * Union both sides tagged, sort within key by (ts, tag, orderkey), and
    * carry the last non-null order columns forward — at 100 TB this is a
    * single sort-shuffle by key; the window frame is running, so state per
    * key is O(1). */
  private val q30 = Q(
    "q30_asof_join",
    """WITH last_date AS (
         SELECT e.event_id, e.user_id, max(o.o_orderdate) AS ld
         FROM events e LEFT JOIN orders o
           ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         GROUP BY e.event_id, e.user_id),
       picked AS (
         SELECT l.event_id, l.user_id, max(o.o_orderkey) AS last_order_key
         FROM last_date l LEFT JOIN orders o
           ON o.o_custkey = l.user_id AND o.o_orderdate = l.ld
         GROUP BY l.event_id, l.user_id)
       SELECT event_id, user_id, last_order_key
       FROM picked
       WHERE event_id < 2000
       ORDER BY event_id""") { (s, d) =>
    val orders = Tables.orders(s, d).select(
      col("o_custkey").as("k"), col("o_orderdate").as("ts"),
      col("o_orderkey"), lit(0).as("tag"), lit(null).cast(LongType).as("event_id"))
    val events = Tables.events(s, d).select(
      col("user_id").as("k"), col("ts"),
      lit(null).cast(LongType).as("o_orderkey"), lit(1).as("tag"), col("event_id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("tag"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("last_order_key", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("event_id") < 2000)
      .select(col("event_id"), col("k").as("user_id"), col("last_order_key"))
      .orderBy("event_id")
  }

  /** Correlated scalar subquery through the spark.sql entry point
    * (Catalyst decorrelates it into an aggregate + join — SURVEY.md §4.2). */
  private val q29 = Q(
    "q29_correlated_subquery",
    """SELECT p_partkey, p_brand, p_retailprice
       FROM part p
       WHERE p_retailprice > 1.05 * (SELECT avg(p2.p_retailprice)
                                     FROM part p2 WHERE p2.p_brand = p.p_brand)
       ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("graft_part_v")
    s.sql(
      """SELECT p_partkey, p_brand, p_retailprice
         FROM graft_part_v p
         WHERE p_retailprice > 1.05 * (SELECT avg(p2.p_retailprice)
                                       FROM graft_part_v p2 WHERE p2.p_brand = p.p_brand)
         ORDER BY p_partkey""")
  }

  /** NOT IN subquery via spark.sql (rewritten to null-aware anti join by
    * Catalyst). */
  private val q38 = Q(
    "q38_not_in_subquery",
    """SELECT c_mktsegment, count(*) AS n_quiet
       FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_ni_cust")
    Tables.orders(s, d).createOrReplaceTempView("graft_ni_orders")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_quiet
         FROM graft_ni_cust
         WHERE c_custkey NOT IN (SELECT o_custkey FROM graft_ni_orders
                                 WHERE o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** LATERAL correlated subquery join (top-2 customers by balance per
    * nation). Catalyst decorrelates the per-row ORDER BY + LIMIT into a
    * window over a single join — no per-outer-row re-execution, which is
    * what makes the construct usable at scale. */
  private val q59 = Q(
    "q59_lateral_join",
    """SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal
       FROM nation, LATERAL (
         SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
       ORDER BY n_name, acctbal DESC, c_name""") { (s, d) =>
    Tables.nation(s, d).createOrReplaceTempView("graft_lat_nation")
    Tables.customer(s, d).createOrReplaceTempView("graft_lat_cust")
    s.sql(
      """SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal
         FROM graft_lat_nation, LATERAL (
           SELECT c_name, c_acctbal FROM graft_lat_cust
           WHERE c_nationkey = n_nationkey
           ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         ORDER BY n_name, acctbal DESC, c_name""")
  }

  /** EXISTS / NOT EXISTS correlated subqueries (planned as one semi and
    * one anti join — no subquery re-execution per row). */
  private val q63 = Q(
    "q63_exists_subquery",
    """SELECT c_mktsegment, count(*) AS n_big_no_low
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
         AND NOT EXISTS (SELECT 1 FROM orders o2
                         WHERE o2.o_custkey = c.c_custkey
                           AND o2.o_orderpriority = '5-LOW')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_ex_cust")
    Tables.orders(s, d).createOrReplaceTempView("graft_ex_orders")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_big_no_low
         FROM graft_ex_cust c
         WHERE EXISTS (SELECT 1 FROM graft_ex_orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
           AND NOT EXISTS (SELECT 1 FROM graft_ex_orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderpriority = '5-LOW')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** Interval-overlap join via grid bucketing — the scalable plan for
    * `A.start <= B.end AND B.start <= A.end`, which as written is a
    * theta join Spark can only execute as a nested-loop/cartesian (O(n·m)
    * and a single-task disaster at scale). The standard fix: quantize
    * time into day cells, explode each interval into the cells it covers
    * (bounded fan-out — sessions are intra-day, campaigns span ≤ 3
    * cells), EQUI-join on the cell, then verify the exact overlap
    * predicate on the survivors. The plan becomes a plain hash/SMJ join
    * keyed on the cell — shuffled, partitionable, AQE-skew-splittable —
    * and a pair can only meet in one cell here (sessions occupy exactly
    * one), so no dedup pass is needed.
    *
    * Day cells are pure integer math on epoch micros (`us div 86.4e9`) —
    * timezone-free and identical in both engines. Spec asserts the plan
    * contains no cartesian/nested-loop node.
    *
    * Shape: A = per-(user, day) activity windows [min ts, max ts]; B =
    * campaign windows [anchor, anchor + 36 h] from every 199th event. */
  private val q76 = Q(
    "q76_interval_join",
    """WITH a AS (
         SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
         FROM events GROUP BY 1, 2),
       b AS (
         SELECT event_id AS cid, epoch_us(ts) AS b_s,
                epoch_us(ts) + 129600000000 AS b_e
         FROM events WHERE event_id % 199 = 0),
       j AS (
         SELECT b.cid, a.user_id, a.d
         FROM a JOIN b ON a.s_us <= b.b_e AND b.b_s <= a.e_us)
       SELECT cid, count(*) AS n_sessions,
              count(DISTINCT user_id) AS n_users, min(d) AS first_day
       FROM j GROUP BY cid ORDER BY cid""") { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val a = ev.groupBy(col("user_id"), expr("us div 86400000000").as("d"))
      .agg(min("us").as("s_us"), max("us").as("e_us"))
    val b = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("cid"), col("us").as("b_s"),
        (col("us") + 129600000000L).as("b_e"))
      .withColumn("d", explode(expr(
        "sequence(b_s div 86400000000, b_e div 86400000000)")))
    a.join(b, Seq("d"))
      .filter(col("s_us") <= col("b_e") && col("b_s") <= col("e_us"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"), min(col("d")).as("first_day"))
      .orderBy("cid")
  }

  val defs: Seq[Q] = Seq(q29, q30, q38, q59, q63, q76)
}

package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Additional TPC-H-shaped depth for B2–B4: returned-items revenue,
  * promo share, large-order HAVING, disjunctive predicates, yearly share.
  */
object RelationalExtra {

  /** Q10-shaped: top returned-item customers (join + agg + top-k). */
  private val q33 = Q(
    "q33_returned_items",
    """SELECT c_custkey, c_name, n_name,
              sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
       FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast(LongType)) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14-shaped: promo revenue share — conditional aggregation ratio of
    * two fixed-point sums (single fp divide → cross-engine exact). */
  private val q34 = Q(
    "q34_promo_revenue_share",
    """SELECT round(
              100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                   ELSE 0 END)
              / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6)
              AS promo_share_pct,
              count(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1996-08-01 00:00:00'""") { (s, d) =>
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast(LongType)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-06-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1996-08-01 00:00:00")))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
          / sum(cents), 6).as("promo_share_pct"),
        count(lit(1)).as("n_lines"))
  }

  /** Q18-shaped: large orders via HAVING on a grouped sum. */
  private val q35 = Q(
    "q35_large_orders",
    """SELECT o_orderkey, o_custkey, round(total_qty, 2) AS total_qty
       FROM (SELECT l_orderkey AS o_orderkey, sum(l_quantity) AS total_qty
             FROM lineitem GROUP BY l_orderkey) li
       JOIN (SELECT o_orderkey AS ok, o_custkey FROM orders) o ON o.ok = li.o_orderkey
       WHERE total_qty > 150
       ORDER BY total_qty DESC, o_orderkey""") { (s, d) =>
    val li = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    li.join(Tables.orders(s, d).select(col("o_orderkey").as("ok"), col("o_custkey")),
        col("ok") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** Q19-shaped: disjunctive multi-attribute predicate (OR of AND-blocks)
    * — exercises CNF conversion and scan-level pushdown of the common
    * conjuncts. */
  private val q36 = Q(
    "q36_disjunctive_predicates",
    """SELECT count(*) AS n,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5 AND l_quantity <= 25)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15 AND l_quantity <= 35)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25 AND l_quantity <= 45)""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity") >= 5 && col("l_quantity") <= 25) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)
          && col("l_quantity") >= 15 && col("l_quantity") <= 35) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)
          && col("l_quantity") >= 25 && col("l_quantity") <= 45))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast(LongType)).as("price_cents"))
  }

  /** Q8-flavored: yearly revenue share of one region across order years —
    * ratio of two conditional fixed-point sums per group. */
  private val q37 = Q(
    "q37_region_share_by_year",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
              round(sum(CASE WHEN r_name = 'ASIA'
                        THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                        ELSE 0 END) * 1.0
                    / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6)
                AS asia_share,
              count(*) AS n
       FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
       GROUP BY CAST(year(o_orderdate) AS BIGINT)
       ORDER BY o_year""") { (s, d) =>
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast(LongType)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        round(sum(when(col("r_name") === "ASIA", cents).otherwise(0L)) * lit(1.0)
          / sum(cents), 6).as("asia_share"),
        count(lit(1)).as("n"))
      .orderBy("o_year")
  }

  /** TPC-H Q22-shaped: uncorrelated scalar subquery (global average) +
    * NOT EXISTS anti join — wealthy customers with no urgent orders. */
  private val q47 = Q(
    "q47_wealthy_inactive",
    """SELECT c_mktsegment, count(*) AS n_cust,
              round(sum(c_acctbal), 2) AS total_bal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_q47_cust")
    Tables.orders(s, d).createOrReplaceTempView("graft_q47_orders")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_cust,
                round(sum(c_acctbal), 2) AS total_bal
         FROM graft_q47_cust
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM graft_q47_cust WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM graft_q47_orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** MERGE/upsert semantics as a batch transform (no table format with
    * MERGE INTO here, so the engine expresses it as the canonical
    * full-outer-join merge — matched rows updated, unmatched source rows
    * inserted, unmatched target rows carried through). At scale this is
    * one co-partitioned shuffle join; with bucketed tables (src06) even
    * that exchange disappears. Source = per-customer order revenue, plus
    * shifted keys standing in for brand-new customers. */
  private val q66 = Q(
    "q66_merge_upsert",
    """WITH src0 AS (
         SELECT o_custkey AS k,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
       src AS (
         SELECT k, rev_cents FROM src0
         UNION ALL
         SELECT k + 100000, rev_cents FROM src0 WHERE k < 50),
       merged AS (
         SELECT coalesce(c.c_custkey, s.k) AS k,
                CASE WHEN c.c_custkey IS NULL THEN 'inserted'
                     WHEN s.k IS NULL THEN 'unchanged'
                     ELSE 'updated' END AS status,
                CASE WHEN c.c_custkey IS NULL THEN s.rev_cents
                     WHEN s.k IS NULL THEN CAST(round(c.c_acctbal * 100) AS BIGINT)
                     ELSE CAST(round(c.c_acctbal * 100) AS BIGINT) + s.rev_cents
                END AS balance_cents
         FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k)
       SELECT status, count(*) AS n,
              CAST(sum(balance_cents) AS BIGINT) AS total_cents,
              min(k) AS min_key, max(k) AS max_key
       FROM merged GROUP BY status ORDER BY status""") { (s, d) =>
    val src0 = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("rev_cents"))
    val src = src0.unionAll(
      src0.filter(col("k") < 50).select((col("k") + 100000).as("k"), col("rev_cents")))
    val tgt = Tables.customer(s, d)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast(LongType).as("bal_cents"))
    tgt.join(src, col("c_custkey") === col("k"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("k")).as("mk"),
        when(col("c_custkey").isNull, "inserted")
          .when(col("k").isNull, "unchanged")
          .otherwise("updated").as("status"),
        when(col("c_custkey").isNull, col("rev_cents"))
          .when(col("k").isNull, col("bal_cents"))
          .otherwise(col("bal_cents") + col("rev_cents")).as("balance_cents"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col("balance_cents")).as("total_cents"),
        min(col("mk")).as("min_key"), max(col("mk")).as("max_key"))
      .orderBy("status")
  }

  /** Recursive CTE (new in Spark 4) — the one query family Spark
    * historically could not express: an iterative month spine built by
    * the recursion itself (no `sequence()` crutch), left-joined to
    * monthly order volume so empty months surface as zeros. The
    * recursion is driver-bounded (84 iterations of a 1-row frontier);
    * the data-side work is a single pass over orders — recursive CTEs at
    * scale are for SMALL iterative frontiers (spines, hierarchies, BOM
    * walks), never for corpus-sized state, and this query is shaped
    * accordingly. */
  private val q68 = Q(
    "q68_recursive_cte",
    """WITH RECURSIVE months(mon) AS (
         SELECT DATE '1995-01-01'
         UNION ALL
         SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM months
         WHERE mon < DATE '2001-12-01')
       SELECT strftime(mon, '%Y-%m') AS month,
              count(o_orderkey) AS n_orders,
              CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents
       FROM months LEFT JOIN orders ON strftime(o_orderdate, '%Y-%m') = strftime(mon, '%Y-%m')
       GROUP BY 1 ORDER BY 1""") { (s, d) =>
    s.sql(
      s"""WITH RECURSIVE months(mon) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT add_months(mon, 1) FROM months WHERE mon < DATE '2001-12-01')
          SELECT date_format(mon, 'yyyy-MM') AS month,
                 count(o_orderkey) AS n_orders,
                 CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents
          FROM months LEFT JOIN parquet.`$d/orders.parquet`
            ON date_format(o_orderdate, 'yyyy-MM') = date_format(mon, 'yyyy-MM')
          GROUP BY 1 ORDER BY 1""")
  }

  /** SCD2 history build — the CDC batch transform that turns an ordered
    * change feed into effective-dated dimension rows: each customer's
    * order-value tier (H/M/L by total price) becomes [valid_from,
    * valid_to) intervals via gaps-and-islands (the difference of two
    * row_numbers identifies consecutive same-tier runs), with lead() over
    * run starts supplying the closing date and NULL→'9999-12-31' marking
    * the open (current) row. All windows partition by customer — millions
    * of small partitions at scale, never one task per anything; dates are
    * emitted as strings (the no-raw-timestamp oracle contract). */
  private val q69 = Q(
    "q69_scd2_history",
    """WITH t AS (
         SELECT o_custkey AS custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
                CASE WHEN o_totalprice >= 300000 THEN 'H'
                     WHEN o_totalprice >= 150000 THEN 'M' ELSE 'L' END AS tier
         FROM orders),
       g AS (
         SELECT custkey, o_orderkey, od, tier,
                row_number() OVER (PARTITION BY custkey ORDER BY od, o_orderkey)
              - row_number() OVER (PARTITION BY custkey, tier ORDER BY od, o_orderkey) AS grp
         FROM t),
       runs AS (
         SELECT custkey, tier, grp, min(od) AS valid_from,
                count(*) AS n_orders, min(o_orderkey) AS first_order
         FROM g GROUP BY custkey, tier, grp),
       scd AS (
         SELECT custkey, tier, valid_from, n_orders,
                lead(valid_from) OVER (PARTITION BY custkey
                  ORDER BY valid_from, first_order) AS valid_to
         FROM runs)
       SELECT custkey, tier, CAST(valid_from AS VARCHAR) AS valid_from,
              coalesce(CAST(valid_to AS VARCHAR), '9999-12-31') AS valid_to,
              n_orders, (valid_to IS NULL) AS is_current
       FROM scd ORDER BY custkey, valid_from, tier""") { (s, d) =>
    val t = Tables.orders(s, d).select(
      col("o_custkey").as("custkey"), col("o_orderkey"),
      col("o_orderdate").cast("date").as("od"),
      when(col("o_totalprice") >= 300000, "H")
        .when(col("o_totalprice") >= 150000, "M").otherwise("L").as("tier"))
    val wAll = Window.partitionBy(col("custkey")).orderBy(col("od"), col("o_orderkey"))
    val wTier = Window.partitionBy(col("custkey"), col("tier"))
      .orderBy(col("od"), col("o_orderkey"))
    val runs = t
      .withColumn("grp", row_number().over(wAll) - row_number().over(wTier))
      .groupBy("custkey", "tier", "grp")
      .agg(min(col("od")).as("valid_from"), count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("first_order"))
    val wLead = Window.partitionBy(col("custkey"))
      .orderBy(col("valid_from"), col("first_order"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
      .select(col("custkey"), col("tier"),
        col("valid_from").cast("string").as("valid_from"),
        coalesce(col("valid_to").cast("string"), lit("9999-12-31")).as("valid_to"),
        col("n_orders"), col("valid_to").isNull.as("is_current"))
      .orderBy("custkey", "valid_from", "tier")
  }

  /** Conversion-funnel analysis (view → click → purchase, each step
    * within 30 minutes of the previous): per view, the FIRST qualifying
    * click (min over a bounded range join), then per completed step the
    * first qualifying purchase — the sequential-pattern query every
    * event warehouse runs. Scale shape: every join keys on user_id with
    * a watermark-style ±30min bound, so state per key is a bounded time
    * slice; the min-per-step is an aggregate after the range join, never
    * a sort. */
  private val q70 = Q(
    "q70_funnel",
    """WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
       c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
       p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
       vc AS (
         SELECT v.user_id, v.event_id, min(c.ts) AS c_ts
         FROM v LEFT JOIN c
           ON c.user_id = v.user_id AND c.ts >= v.ts
          AND c.ts <= v.ts + INTERVAL 30 MINUTE
         GROUP BY v.user_id, v.event_id),
       vcp AS (
         SELECT vc.user_id, vc.event_id, vc.c_ts, min(p.ts) AS p_ts
         FROM vc LEFT JOIN p
           ON vc.c_ts IS NOT NULL AND p.user_id = vc.user_id
          AND p.ts >= vc.c_ts AND p.ts <= vc.c_ts + INTERVAL 30 MINUTE
         GROUP BY vc.user_id, vc.event_id, vc.c_ts)
       SELECT user_id, count(*) AS n_views,
              CAST(sum(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
              CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
       FROM vcp GROUP BY user_id ORDER BY user_id""") { (s, d) =>
    val ev = Tables.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val vc = v.join(c,
        col("cu") === col("user_id") && col("cts") >= col("ts")
          && col("cts") <= col("ts") + expr("interval 30 minutes"), "left")
      .groupBy("user_id", "event_id")
      .agg(min(col("cts")).as("c_ts"))
    val vcp = vc.join(p,
        col("c_ts").isNotNull && col("pu") === col("user_id")
          && col("pts") >= col("c_ts")
          && col("pts") <= col("c_ts") + expr("interval 30 minutes"), "left")
      .groupBy("user_id", "event_id", "c_ts")
      .agg(min(col("pts")).as("p_ts"))
    vcp.groupBy("user_id")
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("c_ts").isNotNull, 1L).otherwise(0L)).as("n_clicked"),
        sum(when(col("p_ts").isNotNull, 1L).otherwise(0L)).as("n_purchased"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention — the activation/engagement matrix every
    * product warehouse derives from its event stream: users are
    * cohorted by the week of their FIRST event, and each (cohort,
    * week-offset) cell counts how many came back that week, as a share
    * of the cohort. Scale shape: first-event per user is one hash agg;
    * the activity join keys on user_id (the cohort map is a narrow
    * two-column table, broadcastable when users ≪ events); the matrix
    * itself is weeks² rows. */
  private val q71 = Q(
    "q71_retention_cohorts",
    """WITH f AS (
         SELECT user_id,
                CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
         FROM events GROUP BY user_id),
       act AS (
         SELECT DISTINCT e.user_id, f.cohort_week,
                CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week AS week_offset
         FROM events e JOIN f ON e.user_id = f.user_id),
       cs AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week)
       SELECT a.cohort_week AS cohort_week, a.week_offset, cs.cohort_size,
              count(*) AS n_active,
              round(count(*) * 1.0 / cs.cohort_size, 4) AS retention
       FROM act a JOIN cs ON a.cohort_week = cs.cohort_week
       GROUP BY a.cohort_week, a.week_offset, cs.cohort_size
       ORDER BY 1, 2""") { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"),
        floor(unix_timestamp(col("ts")) / 604800).cast(LongType).as("week"))
    val f = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val act = ev.join(broadcast(f), "user_id")
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
    val cs = f.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    act.join(broadcast(cs), "cohort_week")
      .groupBy("cohort_week", "week_offset", "cohort_size")
      .agg(count(lit(1)).as("n_active"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        round(col("n_active") * lit(1.0) / col("cohort_size"), 4).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** First-touch / last-touch attribution — the marketing-analytics
    * sibling of q70's funnel: each purchase is attributed to the
    * earliest AND latest view in its trailing 24-hour window, in one
    * pass (min/max over the same user-keyed bounded range join; a
    * per-purchase sort would compute the same thing at a sort's cost).
    * Unattributed purchases stay visible via the left join. */
  private val q73 = Q(
    "q73_touch_attribution",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
       a AS (
         SELECT p.event_id, p.user_id,
                CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
                min(v.ts) AS first_touch, max(v.ts) AS last_touch
         FROM p LEFT JOIN v
           ON v.user_id = p.user_id
          AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 24 HOUR
         GROUP BY p.event_id, p.user_id, p.ts)
       SELECT event_id, user_id, purchase_us,
              CAST(epoch_us(first_touch) AS BIGINT) AS first_touch_us,
              CAST(epoch_us(last_touch) AS BIGINT) AS last_touch_us,
              (first_touch IS NOT NULL) AS attributed
       FROM a ORDER BY user_id, purchase_us, event_id""") { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    p.join(v,
        col("vu") === col("user_id") && col("vts") < col("ts")
          && col("vts") >= col("ts") - expr("interval 24 hours"), "left")
      .groupBy("event_id", "user_id", "ts")
      .agg(min(col("vts")).as("first_touch"), max(col("vts")).as("last_touch"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("first_touch")).as("first_touch_us"),
        unix_micros(col("last_touch")).as("last_touch_us"),
        col("first_touch").isNotNull.as("attributed"))
      .orderBy("user_id", "purchase_us", "event_id")
  }

  /** Join pre-flight costing census: everything a planner (or a human
    * sizing a 100 TB job) needs to know about `events ⋈ orders ON
    * user_id = o_custkey` WITHOUT executing the join — exact output
    * cardinality (Σ_k cntA(k)·cntB(k) over the per-key censuses), key
    * overlap, the heaviest key's share of the output (the salt-or-not
    * signal), and whether either side fits a broadcast. The HLL
    * distinct-key estimates ride alongside and are verified within
    * tolerance (x03's pattern) — at scale the exact distinct count IS
    * the census, so the sketch is a consistency check, not a shortcut.
    *
    * Scale shape: both inputs collapse to (key, cnt) map-side-combined
    * censuses before anything joins — the costing join touches #keys
    * rows, never #rows, and no payload column is ever read (column
    * pruning to one int each side). This is how you answer "will this
    * join OOM?" for two 50 TB tables with two key scans. */
  private val q75 = Q(
    "q75_join_preflight",
    """WITH a AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
       b AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
       j AS (SELECT a.k, a.cnt * b.cnt AS pairs FROM a JOIN b USING (k))
       SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM a) AS rows_a,
              (SELECT CAST(sum(cnt) AS BIGINT) FROM b) AS rows_b,
              (SELECT count(*) FROM a) AS n_keys_a,
              (SELECT count(*) FROM b) AS n_keys_b,
              CAST(count(*) AS BIGINT) AS n_keys_common,
              CAST(sum(pairs) AS BIGINT) AS exact_join_rows,
              CAST(round(1000000.0 * max(pairs) / sum(pairs)) AS BIGINT)
                AS top_key_share_micro,
              true AS hll_a_ok, true AS hll_b_ok
       FROM j ORDER BY rows_a""") { (s, d) =>
    val a = Tables.events(s, d).groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("cnt_a"))
    val b = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("cnt_b"))
    // side censuses (rows, exact + HLL distinct keys) aggregate the tiny
    // (key, cnt) tables, then cross into the one-row summary — nothing
    // here re-reads the base tables
    val sa = a.agg(sum("cnt_a").as("rows_a"), count(lit(1)).as("n_keys_a"),
      approx_count_distinct(col("k")).as("hll_a"))
    val sb = b.agg(sum("cnt_b").as("rows_b"), count(lit(1)).as("n_keys_b"),
      approx_count_distinct(col("k")).as("hll_b"))
    a.join(b, "k")
      .select((col("cnt_a") * col("cnt_b")).as("pairs"))
      .agg(count(lit(1)).as("n_keys_common"),
        sum(col("pairs")).as("exact_join_rows"),
        round(lit(1000000.0) * max(col("pairs")) / sum(col("pairs")))
          .cast(LongType).as("top_key_share_micro"))
      .crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("rows_a"), col("rows_b"), col("n_keys_a"), col("n_keys_b"),
        col("n_keys_common"), col("exact_join_rows"), col("top_key_share_micro"),
        (abs(col("hll_a") - col("n_keys_a")) <= col("n_keys_a") * 0.15).as("hll_a_ok"),
        (abs(col("hll_b") - col("n_keys_b")) <= col("n_keys_b") * 0.15).as("hll_b_ok"))
      .orderBy("rows_a")
  }

  val defs: Seq[Q] = Seq(q33, q34, q35, q36, q37, q47, q66, q68, q69, q70, q71,
    q73, q75)
}

package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pivot/unpivot, statistical aggregates, extended string functions, and
  * time-series gap filling — rounding out B4/B6/B7 with the reshaping and
  * stats surfaces an analytics engine is expected to carry.
  */
object PivotStats {

  /** B4: pivot (wide aggregation) with an explicit value list — at scale
    * the explicit list avoids the extra distinct-values job. */
  private val q42 = Q(
    "q42_pivot",
    """SELECT l_returnflag,
              CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
              CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_cents
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum("cents"))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("f_cents"),
        coalesce(col("O"), lit(0L)).as("o_cents"))
      .orderBy("l_returnflag")
  }

  /** B6: unpivot/melt — wide columns back to (metric, value) rows. */
  private val q43 = Q(
    "q43_unpivot",
    """SELECT p_partkey, metric, val FROM (
         SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part) t
       WHERE p_partkey < 100
       ORDER BY p_partkey, metric""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "metric", "val")
      .orderBy("p_partkey", "metric")
  }

  /** B4: statistical aggregate family — stddev/variance (sample+pop),
    * correlation, covariance. Rounding chosen per magnitude so the
    * numerically-stable merge formulas of both engines agree. */
  private val q44 = Q(
    "q44_stats_aggs",
    """SELECT l_returnflag,
              round(stddev_samp(l_extendedprice), 3) AS sd_price,
              round(var_samp(l_extendedprice), 1) AS var_price,
              round(stddev_pop(l_quantity), 4) AS sd_qty,
              round(var_pop(l_quantity), 3) AS var_qty,
              round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
              round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
              round(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covar_pop
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_extendedprice")), 3).as("sd_price"),
        round(var_samp(col("l_extendedprice")), 1).as("var_price"),
        round(stddev_pop(col("l_quantity")), 4).as("sd_qty"),
        round(var_pop(col("l_quantity")), 3).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar_pop"))
      .orderBy("l_returnflag")
  }

  /** B7 string extras: levenshtein, translate, repeat, reverse,
    * split_part-equivalent, prefix/substring predicates. */
  private val q45 = Q(
    "q45_string_extra",
    """SELECT p_partkey,
              levenshtein(p_name, 'blue bolt') AS dist_bb,
              translate(p_name, 'aeiou', 'AEIOU') AS vowelcaps,
              repeat(p_brand, 2) AS brand2,
              reverse(p_name) AS rev_name,
              string_split(p_name, ' ')[2] AS second_token,
              starts_with(p_name, 'blue') AS is_blue,
              contains(p_name, 'gear') AS has_gear
       FROM part WHERE p_partkey < 300 ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") < 300)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), lit("blue bolt")).cast(LongType).as("dist_bb"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowelcaps"),
        repeat(col("p_brand"), 2).as("brand2"),
        reverse(col("p_name")).as("rev_name"),
        element_at(split(col("p_name"), " "), 2).as("second_token"),
        col("p_name").startsWith("blue").as("is_blue"),
        col("p_name").contains("gear").as("has_gear"))
      .orderBy("p_partkey")
  }

  /** Time-series gap fill: a generated calendar LEFT JOINed to daily
    * activity, zeros for silent days, forward-filled last-active day via
    * a running last(ignoreNulls) window. */
  private val q46 = Q(
    "q46_gap_fill",
    """WITH cal AS (
         SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                            INTERVAL 1 DAY)) AS DATE) AS day),
       daily AS (
         SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
         FROM orders WHERE o_custkey < 5 GROUP BY 1)
       SELECT cal.day, coalesce(daily.n, 0) AS n,
              max(CASE WHEN daily.n > 0 THEN cal.day END)
                OVER (ORDER BY cal.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS last_active_day
       FROM cal LEFT JOIN daily ON cal.day = daily.day
       ORDER BY cal.day""") { (s, d) =>
    val cal = s.range(1)
      .select(explode(sequence(
        to_date(lit("1996-01-01")), to_date(lit("1996-03-31")),
        expr("interval 1 day"))).as("day"))
    val daily = Tables.orders(s, d)
      .filter(col("o_custkey") < 5)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n0"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily.withColumnRenamed("day", "dday"), col("day") === col("dday"), "left")
      .select(col("day"), coalesce(col("n0"), lit(0L)).as("n"))
      .withColumn("last_active_day", max(when(col("n") > 0, col("day"))).over(w))
      .orderBy("day")
  }

  /** Equal-width histogram: data-driven [min,max] split into 10 bins —
    * the two-pass stats-then-bucket pattern (stats side broadcast). */
  private val q54 = Q(
    "q54_histogram",
    """WITH stats AS (
         SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
       SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9) AS bin,
              count(*) AS n,
              round(min(o_totalprice), 2) AS bin_min,
              round(max(o_totalprice), 2) AS bin_max
       FROM orders, stats
       GROUP BY 1 ORDER BY bin""") { (s, d) =>
    val o = Tables.orders(s, d)
    val stats = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    o.crossJoin(broadcast(stats))
      .select(least(floor((col("o_totalprice") - col("lo"))
        / ((col("hi") - col("lo")) / 10.0)), lit(9L)).as("bin"),
        col("o_totalprice"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("bin_min"),
        round(max("o_totalprice"), 2).as("bin_max"))
      .orderBy("bin")
  }

  /** Percent-of-total (ratio_to_report): share of revenue per nation.
    * Done scale-correctly with a broadcast global total — an empty-
    * partition window (`sum() over ()`) would funnel every row through
    * one task at 100 TB. */
  private val q55 = Q(
    "q55_percent_of_total",
    """WITH rev AS (
         SELECT n_name,
                sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS cents
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name),
       total AS (SELECT sum(cents) AS t FROM rev)
       SELECT n_name,
              round(cents / 10000.0, 2) AS revenue,
              round(cents * 100.0 / t, 6) AS pct
       FROM rev, total ORDER BY n_name""") { (s, d) =>
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
      .cast(org.apache.spark.sql.types.LongType)
    val rev = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(cents).as("cents"))
    val total = rev.agg(sum("cents").as("t"))
    rev.crossJoin(broadcast(total))
      .select(col("n_name"),
        round(col("cents") / 10000.0, 2).as("revenue"),
        round(col("cents") * 100.0 / col("t"), 6).as("pct"))
      .orderBy("n_name")
  }

  /** B4: DYNAMIC pivot — the value list is discovered from the data (an
    * extra distinct-values job before the pivot aggregation; q42 is the
    * explicit-list variant that skips it). Null cells → 0 so the shape is
    * stable regardless of which (priority, year) combos exist.
    *
    * Oracle invariant (spec-pinned in RoundFourSpec): the fixed 1995-2001
    * column list in the oracle SQL matches dynamic discovery because the
    * orders fixture contains all seven order-years at every SF — the
    * generator draws o_orderdate uniformly from that range. A fixture
    * missing a year would shrink the discovered schema and rightly fail
    * the compare; that's the dynamic-pivot contract, not a bug. */
  private val q61 = Q(
    "q61_dynamic_pivot",
    """SELECT o_orderpriority,
              count(*) FILTER (WHERE year(o_orderdate) = 1995) AS "1995",
              count(*) FILTER (WHERE year(o_orderdate) = 1996) AS "1996",
              count(*) FILTER (WHERE year(o_orderdate) = 1997) AS "1997",
              count(*) FILTER (WHERE year(o_orderdate) = 1998) AS "1998",
              count(*) FILTER (WHERE year(o_orderdate) = 1999) AS "1999",
              count(*) FILTER (WHERE year(o_orderdate) = 2000) AS "2000",
              count(*) FILTER (WHERE year(o_orderdate) = 2001) AS "2001"
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("o_orderpriority")
      .pivot("yr") // dynamic: values discovered, sorted → stable columns
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")
  }

  /** B4: ordered string aggregation (`listagg ... WITHIN GROUP`) — the
    * within-group ORDER BY makes the concatenation deterministic under
    * any partitioning (unordered listagg would be partition-order-
    * dependent and unverifiable). */
  private val q64 = Q(
    "q64_listagg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
              count(*) AS n_nations
       FROM nation JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name""") { (s, d) =>
    Tables.nation(s, d).createOrReplaceTempView("graft_la_nation")
    Tables.region(s, d).createOrReplaceTempView("graft_la_region")
    s.sql(
      """SELECT r_name,
                listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
                count(*) AS n_nations
         FROM graft_la_nation JOIN graft_la_region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""")
  }

  val defs: Seq[Q] = Seq(q42, q43, q44, q45, q46, q54, q55, q61, q64)
}

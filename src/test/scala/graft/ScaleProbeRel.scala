package graft

import org.apache.spark.sql.functions._

/** The RELATIONAL sf1 scaling datapoint (round-8 verdict item 5): the
  * q-family had no >sf0.1 measurement, so its 100 TB story rested on
  * plan shape alone. This probe synthesizes an sf1-EQUIVALENT star
  * schema — 10× sf0.1: 6M lineitem / 1.5M orders / 150k customer / 10k
  * supplier / 1M events, nation+region copied from the fixture —
  * deterministically from md5 (ScaleProbe's no-RNG discipline), with
  * each query's selectivity structure preserved (BUILDING segment ≈ 1/5,
  * date windows inside the generated ranges, 4 lines per order,
  * overlapping user/customer key spaces for the join-costing census),
  * then times the six headline relational queries at sf0.1 and sf1 and
  * reports per-decade ratios plus whether AQE's skew-join machinery
  * fired (`skew=true` in any executed plan).
  *
  * Near-linear ratios mean the shuffles scale with the data: the
  * broadcast dims stay broadcast (customer at 150k rows is still far
  * under the 10 MB threshold), the fact-fact joins shuffle 10× the
  * rows through the same partitioning, and no plan silently flips to a
  * quadratic strategy.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeRel'; the JSON line is copied
  * into BENCH_SCALE_r09.json and summarized in SURVEY §6.
  */
object ScaleProbeRel {

  import ScaleProbe.h // md5-derived positive long

  def synthStar(spark: org.apache.spark.sql.SparkSession, scale: Int,
      dirName: String, parts: Int): String = {
    val dir = Scratch.dir(dirName)
    val nCust = 15000L * scale
    val nOrders = 150000L * scale
    val nLine = nOrders * 4
    val nSupp = 1000L * scale
    val nEvents = 100000L * scale
    // 1995-01-01 .. 1998-01-01 in epoch seconds — every query's date
    // window (1996-03-15, 1996-07-01 .. +3mo, 1998-03-15) cuts a real
    // fraction of it, as in the fixture
    val t0 = 788918400L
    val span = 94608000L

    spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      (h(concat(col("id"), lit("|cn"))) % 25).cast("int").as("c_nationkey"),
      ((h(concat(col("id"), lit("|cb"))) % 1099999) / 100.0 - 999.99).as("c_acctbal"),
      element_at(typedLit(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")),
        (h(concat(col("id"), lit("|cm"))) % 5 + 1).cast("int")).as("c_mktsegment"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/customer.parquet")

    spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), col("id")).as("s_name"),
      (h(concat(col("id"), lit("|sn"))) % 25).cast("int").as("s_nationkey"),
      ((h(concat(col("id"), lit("|sb"))) % 1099999) / 100.0 - 999.99).as("s_acctbal"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      (h(concat(col("id"), lit("|oc"))) % nCust).as("o_custkey"),
      element_at(typedLit(Seq("O", "F", "P")),
        (h(concat(col("id"), lit("|os"))) % 3 + 1).cast("int")).as("o_orderstatus"),
      ((h(concat(col("id"), lit("|ot"))) % 50000000) / 100.0).as("o_totalprice"),
      (lit(t0) + h(concat(col("id"), lit("|od"))) % span).cast("timestamp").as("o_orderdate"),
      element_at(typedLit(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        (h(concat(col("id"), lit("|op"))) % 5 + 1).cast("int")).as("o_orderpriority"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    spark.range(nLine).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      (h(concat(col("id"), lit("|lp"))) % (20000L * scale)).as("l_partkey"),
      (h(concat(col("id"), lit("|ls"))) % nSupp).as("l_suppkey"),
      (col("id") % 4 + 1).cast("int").as("l_linenumber"),
      (h(concat(col("id"), lit("|lq"))) % 50 + 1).cast("double").as("l_quantity"),
      ((h(concat(col("id"), lit("|le"))) % 9000000) / 100.0 + 900.0).as("l_extendedprice"),
      ((h(concat(col("id"), lit("|ld"))) % 11) / 100.0).as("l_discount"),
      ((h(concat(col("id"), lit("|lt"))) % 9) / 100.0).as("l_tax"),
      element_at(typedLit(Seq("A", "N", "R")),
        (h(concat(col("id"), lit("|lr"))) % 3 + 1).cast("int")).as("l_returnflag"),
      element_at(typedLit(Seq("O", "F")),
        (h(concat(col("id"), lit("|ll"))) % 2 + 1).cast("int")).as("l_linestatus"),
      (lit(t0) + h(concat(col("id"), lit("|lsd"))) % span).cast("timestamp").as("l_shipdate"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    spark.range(nEvents).select(
      col("id").as("event_id"),
      (lit(t0) + h(concat(col("id"), lit("|et"))) % span).cast("timestamp").as("ts"),
      (h(concat(col("id"), lit("|eu"))) % nCust).as("user_id"),
      element_at(typedLit(Seq("click", "view", "purchase", "error")),
        (h(concat(col("id"), lit("|ek"))) % 4 + 1).cast("int")).as("event_type"),
      ((h(concat(col("id"), lit("|ev"))) % 100000) / 100.0).as("value"),
      concat(lit("""{"k":"""), col("id") % 10, lit("}")).as("props"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/events.parquet")

    // tiny dims: the fixture's own
    for (t <- Seq("nation", "region", "part"))
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-rel")
    val sf01 = "/root/testdata/sf0.1"
    val dir = synthStar(spark, scale = 10, "graft_sf1_star", parts = 32)

    val names = Seq("q01_pricing_summary", "q03_shipping_priority",
      "q05_local_supplier_volume", "q16_topk_per_group",
      "q75_join_preflight", "q76_interval_join")
    val onlyFilter = args.headOption.map(_.split(',').toSet)
    val selected = onlyFilter.fold(names)(f => names.filter(f))
    selected.foreach(nm =>
      SparkEntry.queries(nm)(spark, "/root/testdata/sf0.001").count())

    def time(nm: String, d: String): (Double, Long, Boolean) = {
      import org.apache.spark.sql.classic.ClassicConversions.castToImpl
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(nm)(spark, d)
        val rows = df.count()
        val skew = castToImpl(df).queryExecution.executedPlan.toString.contains("skew=true")
        ((System.nanoTime() - t0) / 1e9, rows, skew)
      }
      (ts.map(_._1).min, ts.head._2, ts.exists(_._3))
    }
    val entries = selected.map { nm =>
      val (tA, rA, _) = time(nm, sf01)
      val (tB, rB, skewB) = time(nm, dir)
      println(s"== $nm done: $tA / $tB s (skew=$skewB)")
      s""""$nm":{"sec_sf01":${f"$tA%.2f"},"sec_sf1":${f"$tB%.2f"},""" +
        s""""ratio":${f"${tB / tA}%.2f"},"rows_sf01":$rA,"rows_sf1":$rB,""" +
        s""""aqe_skew_sf1":$skewB}"""
    }
    println(s"""{"metric":"scale_rel_sf1","scale":10,""" +
      s""""queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}

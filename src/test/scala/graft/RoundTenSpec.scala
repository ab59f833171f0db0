package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Round-10 additions: the decontamination family's shared
  * broadcast-by-premise knob (the r9 verdict's task 5 — p01's measured
  * conf-gated fallback inherited by d10/d13/d42/d48). */
class RoundTenSpec extends SparkTestBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("Dedup.benchSide routes the benchmark join by conf: forced " +
    "broadcast by default (the tiny-benchmark premise), a real shuffled " +
    "join under graft.decontam.broadcastBench=false (or the legacy " +
    "pipeline spelling), identical rows on both routes") {
    import ops.Dedup
    val corpus = spark.range(0, 2000).select(
      col("id").as("doc_id"), (col("id") % 97).as("gh"))
    val bench = spark.range(0, 12).select((col("id") * 7).as("gh"))

    def planOf(df: DataFrame) = castToImpl(df).queryExecution.executedPlan
    def hasBroadcastJoin(df: DataFrame): Boolean = planOf(df).collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isDefined

    val expected = rows(corpus.join(bench, "gh"))
    assert(expected.nonEmpty, "bench/corpus overlap vacuous")

    // default: the premise holds, the hint forces a broadcast even with
    // size-based auto-broadcast off
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val q = corpus.join(Dedup.benchSide(bench), "gh")
      assert(hasBroadcastJoin(q), "default route lost the forced broadcast")
      assert(rows(q) == expected)

      // corpus-scale-benchmark deployment: the hint is withheld, the
      // planner shuffles both sides on the gram hash
      withConfs("graft.decontam.broadcastBench" -> "false") {
        val q2 = corpus.join(Dedup.benchSide(bench), "gh")
        assert(!hasBroadcastJoin(q2),
          "conf=false still forced a broadcast — the driver-OOM path is back")
        assert(rows(q2) == expected, "shuffled route changed the rows")
      }
      // the legacy p01 spelling keeps working (probes/docs reference it)
      withConfs("graft.pipeline.broadcastBench" -> "false") {
        val q3 = corpus.join(Dedup.benchSide(bench), "gh")
        assert(!hasBroadcastJoin(q3), "legacy conf spelling ignored")
        assert(rows(q3) == expected)
      }
    }
  }

  test("p01 stage 3 is audit-gated: on this fixture the router's measured " +
    "precision (43.7%) fails the 50% gate so routing passes everything " +
    "through; lowering the gate to 0 makes the same prediction act") {
    def stage3(census: Array[org.apache.spark.sql.Row]) =
      census.find(_.getAs[String]("name") == "lang_route").get
    val fn = SparkEntry.queries("p01_full_curation")
    val dflt = stage3(fn(spark, sf0001).collect())
    assert(dflt.getAs[Long]("n_out") == dflt.getAs[Long]("n_in"),
      "gate failed open: an uncertified router dropped documents")
    withConfs("graft.pipeline.langGatePrecision" -> "0") {
      spark.catalog.clearCache()
      val acted = stage3(fn(spark, sf0001).collect())
      assert(acted.getAs[Long]("n_out") < acted.getAs[Long]("n_in"),
        "gate at 0 should let the router act — routing never fired")
    }
    spark.catalog.clearCache()
  }

  test("d10/d13/d42/d48 produce byte-identical results on the shuffled " +
    "fallback route — the conf flips the plan, never the answer") {
    for (name <- Seq("d10_decontaminate", "d13_ngram_decontaminate",
      "d42_contamination_fraction", "d48_benchmark_exposure")) {
      val fn = SparkEntry.queries(name)
      val expected = rows(fn(spark, sf0001))
      withConfs("graft.decontam.broadcastBench" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        spark.catalog.clearCache()
        assert(rows(fn(spark, sf0001)) == expected,
          s"$name diverged on the shuffled decontamination route")
      }
      spark.catalog.clearCache()
    }
  }
}

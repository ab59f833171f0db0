package graft

/** The DEDUP-family sf1 scaling datapoint (round-9 verdict item 8): the
  * relational six have ScaleProbeRel's 10× run and the flagships have
  * vocab-scaled probes, but d03/d08/d15/d22 had no measurement beyond
  * sf0.1. This probe times them on the sf0.1 fixture (5k docs) and on a
  * 10× synthetic corpus (50k docs via [[ScaleProbe.synthCorpus]], vocab
  * ∝ N^(1/3) = 67 — the established discipline: a fixed 31-token vocab
  * at 50k docs saturates the 3-gram space and floods LSH buckets, which
  * measures the cap guard, not the operator), reporting per-decade
  * ratios. Near-linear ratios mean the banding self-joins, verification
  * joins, and the d22 anchor-gram machinery scale with the data — no
  * plan silently flips quadratic.
  *
  * Measured (r10): d03 1.38×, d15 2.32×, d22 1.90×, d08 7.21×. d08's
  * outlier was diagnosed by replaying the banding in DuckDB: this
  * generator's LSH candidate-edge set grows 8.6× at 10× docs
  * (32,073 → 275,402 pairs — denser shingle collisions as the corpus
  * outgrows the vocab), so d08's wall is SUB-linear in its own edge
  * input and CC round count is stable. Cost tracks edges — the
  * operator is fine; the generator is collision-dense vs real text.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeDedup'; the JSON line is
  * merged into BENCH_SCALE_r10.json and summarized in SURVEY §6/§8.
  */
object ScaleProbeDedup {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-dedup")
    val names = Seq("d03_minhash_lsh", "d08_dedup_groups",
      "d15_verified_dedup_groups", "d22_exact_substring")

    val sf01 = "/root/testdata/sf0.1"
    val dir50k = ScaleProbe.synthCorpus(spark, 50000L, 1000L,
      "graft_spdedup_50k", parts = 32, vocabSize = 67)

    // JIT/codegen warm
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())

    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val results = names.map { n =>
      val a = time(n, sf01)
      val b = time(n, dir50k)
      println(f"== $n: sf0.1 $a%.2f s, 50k $b%.2f s, ratio ${b / a}%.2f")
      (n, a, b)
    }
    val qs = results.map { case (n, a, b) =>
      s""""${n.takeWhile(_ != '_')}":{"sf01_sec":${f"$a%.2f"},"x10_sec":${f"$b%.2f"},""" +
        s""""ratio_10x":${f"${b / a}%.2f"}}"""
    }.mkString(",")
    println(s"""{"metric":"scale_dedup_10x","docs":[5000,50000],$qs}""")

    // d08 under the candidate-edge budget (r10 verdict item 5): this
    // generator's edge set grows 8.6× at 10× docs and d08's wall tracks
    // it; the budget knob trades tail recall for bounded edges. Census:
    // edges with/without the budget at both scales, plus the capped wall.
    import org.apache.spark.sql.functions.col
    def edges(dir: String): Long = {
      val buckets = graft.ops.Dedup.lshBuckets(
        Tables.documents(spark, dir), "doc_id", "text", 3, 4, 2)
      graft.ops.Dedup.candidatePairs(buckets).count()
    }
    val budget = 60000L
    val e5k = edges(sf01)
    val e50k = edges(dir50k)
    spark.conf.set(graft.ops.Dedup.DefaultEdgeBudgetConf, budget.toString)
    val e50kB = edges(dir50k)
    val d08a = time("d08_dedup_groups", sf01)
    val d08b = time("d08_dedup_groups", dir50k)
    spark.conf.unset(graft.ops.Dedup.DefaultEdgeBudgetConf)
    println(s"""{"metric":"scale_d08_edge_budget","docs":[5000,50000],""" +
      s""""budget_edges":$budget,"cand_edges":[$e5k,$e50k],"cand_edges_budgeted_50k":$e50kB,""" +
      f""""d08_budgeted":{"sf01_sec":$d08a%.2f,"x10_sec":$d08b%.2f,"ratio_10x":${d08b / d08a}%.2f}}""")
    // sanity: the budget must actually bind at 50k and not at 5k
    assert(e50kB <= budget, s"budgeted edge count $e50kB exceeds $budget")
    assert(e5k <= budget, s"5k baseline $e5k already over budget — probe miscalibrated")
    spark.stop(): Unit
  }
}

package graft

/** Scale datapoints for the FLAGSHIP composed pipeline (p01) — round 9's
  * bench entry prices it at sf0.1 (5k docs); this probe answers "would
  * the composition hold at 100×?" the same way ScaleProbe100 answers it
  * for the solo operators: 5k / 50k / 500k docs with the shingle
  * universe scaled with the corpus (vocab ∝ N^(1/3): 31/67/144 — see
  * [[ScaleProbe.synthCorpus]] for why a fixed vocab is a regime change,
  * not scaling). Per-decade wall ratios ≲ 10× mean no stage of the
  * nine-stage composition hides super-linear work the solo probes missed
  * (the coupling hazards: the ann snapshot build, the f6 fan-out, and
  * the stage-7 gram join).
  *
  * Stage 7's broadcast-by-premise is ALSO measured at the scale its
  * conf-gate exists for: the fixture synthesizes the benchmark FROM the
  * corpus (1/7 of it), so at 500k docs the "benchmark" gram set is
  * ~2.4M hashes — exactly the corpus-scale-benchmark deployment the
  * `graft.pipeline.broadcastBench=false` shuffled route was added for
  * (Pipeline.scala stage 7). The knob entry times the 500k run BOTH
  * ways; the decade ratios use the default broadcast route so they stay
  * comparable to the 5k/50k runs.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeP01'; the JSON line is merged
  * into BENCH_SCALE_r09.json and summarized in SURVEY §6/§8.
  */
object ScaleProbeP01 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-p01")

    val sf01 = "/root/testdata/sf0.1"
    val dir50k = ScaleProbe.synthCorpus(spark, 50000L, 1000L,
      "graft_spp01_50k", parts = 8, vocabSize = 67)
    val dir500k = ScaleProbe.synthCorpus(spark, 500000L, 1000L,
      "graft_spp01_500k", parts = 32, vocabSize = 144)

    // JIT/codegen warm at the smallest SF (Bench methodology)
    SparkEntry.queries("p01_full_curation")(spark, "/root/testdata/sf0.001").count()

    def time(d: String, broadcastBench: Boolean): (Double, Long) = {
      spark.conf.set("graft.pipeline.broadcastBench", broadcastBench.toString)
      try {
        val ts = (1 to 2).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          val rows = SparkEntry.queries("p01_full_curation")(spark, d).count()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        (ts.map(_._1).min, ts.head._2)
      } finally spark.conf.unset("graft.pipeline.broadcastBench")
    }

    val (t5k, r5k) = time(sf01, broadcastBench = true)
    println(s"== 5k done: $t5k s")
    val (t50k, r50k) = time(dir50k, broadcastBench = true)
    println(s"== 50k done: $t50k s")
    val (t500k, r500k) = time(dir500k, broadcastBench = true)
    println(s"== 500k (broadcast) done: $t500k s")
    val (t500kSh, r500kSh) = time(dir500k, broadcastBench = false)
    println(s"== 500k (shuffled) done: $t500kSh s")
    require(r5k == 9 && r50k == 9 && r500k == 9 && r500kSh == 9,
      s"census must be 9 rows at every scale: $r5k/$r50k/$r500k/$r500kSh")

    println(s"""{"metric":"scale_p01","docs":[5000,50000,500000],""" +
      """"vocab":[31,67,144],"p01_full_curation":{""" +
      s""""sec_5k":${f"$t5k%.2f"},"sec_50k":${f"$t50k%.2f"},""" +
      s""""sec_500k":${f"$t500k%.2f"},""" +
      s""""ratio_decade1":${f"${t50k / t5k}%.2f"},""" +
      s""""ratio_decade2":${f"${t500k / t50k}%.2f"}},""" +
      s""""bench_route_knob_500k":{"sec_broadcast":${f"$t500k%.2f"},""" +
      s""""sec_shuffled":${f"$t500kSh%.2f"},""" +
      s""""ratio":${f"${t500kSh / t500k}%.2f"}}}""")
    spark.stop()
  }
}

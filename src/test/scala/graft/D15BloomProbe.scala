package graft

/** Measures the d15 candidate-restriction routes at the 100×-probe corpus
  * (500k docs, vocab 144 — ScaleProbe100's "same statistics, more volume"
  * regime): exact left-semi (threshold forced high) vs map-side bloom
  * (threshold 0). The decade-2 super-linearity recorded in
  * BENCH_SCALE_r07.json (5.28× per 10×) is the semi-join's full-stream
  * shuffle; this probe prices the bloom fix in one machine state.
  *
  * Run: sbt 'Test/runMain graft.D15BloomProbe'
  */
object D15BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-d15-bloom-probe")
    val dir = ScaleProbe.synthCorpus(spark, 500000L, 1000L,
      "graft_d15bloom_500k", parts = 32, vocabSize = 144)
    // JIT warm
    SparkEntry.queries("d15_verified_dedup_groups")(spark, "/root/testdata/sf0.001").count()
    def time(threshold: Option[String]): (Double, Long) = {
      threshold match {
        case Some(t) => spark.conf.set("graft.dedup.bloomCandidateThreshold", t)
        case None    => spark.conf.unset("graft.dedup.bloomCandidateThreshold")
      }
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries("d15_verified_dedup_groups")(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (ts.map(_._1).min, ts.head._2)
    }
    val (tSemi, rSemi) = time(None)       // default: exact, count-free
    val (tBloom, rBloom) = time(Some("0"))
    spark.conf.unset("graft.dedup.bloomCandidateThreshold")
    require(rSemi == rBloom, s"routes disagree: $rSemi vs $rBloom")
    println(s"""{"metric":"d15_bloom_500k","sec_semi":${f"$tSemi%.2f"},""" +
      s""""sec_bloom":${f"$tBloom%.2f"},"ratio":${f"${tBloom / tSemi}%.3f"},""" +
      s""""rows":$rSemi}""")
    spark.stop()
  }
}

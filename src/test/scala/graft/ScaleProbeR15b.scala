package graft

/** 100×-decade end-to-end walls for the round-13 follow-on operators
  * (the ScaleProbeR13 discipline): d75's pruned two-tier funnel and
  * s43's in-stream cell-growth gate. At the 100× corpus s43's census
  * fires the ladder's 1024-cell cap and the stream performs the REAL
  * 200k-row migration in its maintenance window — the streaming twin
  * of d73's measured 100× run.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR15b' → BENCH_SCALE_r13. */
object ScaleProbeR15b {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-r15b")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def wall(name: String)(sf: String): Double = {
      spark.catalog.clearCache(); System.gc()
      time { SparkEntry.queries(name)(spark, sf).collect(): Unit }
    }
    val names = Seq("d75_cell_local_refine", "s43_stream_cell_growth_gate")

    // JIT/codegen warm pass at the smallest SF
    names.foreach(n => wall(n)("/root/testdata/sf0.001"))

    val sf01 = "/root/testdata/sf0.1"
    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spr15b", parts = 32, vocabSize = 144)
    val e2e = names.map { n =>
      val a = wall(n)(sf01)
      val b = wall(n)(dir100)
      f""""$n":{"sf01_sec":$a%.2f,"x100_sec":$b%.2f,"ratio_100x":${b / a}%.2f}"""
    }
    println(s"""{"metric":"scale_r15_e2e_100x","docs":[5000,500000],""" +
      s""""vecs":[2000,200000],""" + e2e.mkString(",") + "}")
    spark.stop()
  }
}

package graft

/** End-to-end 10× walls for the second-round-11-session streaming /
  * orchestration queries (the BENCH_SCALE "streaming lifecycle" series
  * continued): each query runs its full store build + lifecycle
  * in-query, so the expectation is the same as the r11 set — near-flat
  * walls dominated by the fixed per-job floor, with only the store-build
  * terms growing sub-linearly at these SFs.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeStreamR12'; the JSON line is
  * merged into BENCH_SCALE_r11.json and summarized in SURVEY §8. */
object ScaleProbeStreamR12 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-stream-r12")
    val names = Seq(
      "s37_stream_drift_retrain",
      "s38_stream_bm25_maintenance",
      "s39_stream_ivfpq_maintained_index",
      "d68_cross_surface_takedown")

    def wall(name: String, sf: String): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    // JIT/codegen warm pass
    names.foreach(wall(_, "/root/testdata/sf0.001"))

    val entries = names.map { n =>
      val a = wall(n, "/root/testdata/sf0.01")
      val b = wall(n, "/root/testdata/sf0.1")
      f""""$n":{"sf001_sec":$a%.2f,"sf01_sec":$b%.2f,"ratio_10x":${b / a}%.2f}"""
    }
    println(s"""{"metric":"scale_streaming_lifecycle_r12_10x",""" +
      s""""sf_dirs":["sf0.01","sf0.1"],"docs":[500,5000],"vecs":[500,2000],""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}

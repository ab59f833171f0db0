package graft

/** End-to-end 10× walls for the round-12 queries (the BENCH_SCALE
  * series continued): the CAS commit drill (d69), the posting-store
  * schema migration (d70), phrase-from-index (t58), the pinned-read
  * stream (s40), and the tokenizer re-train stream (s41). Each runs its
  * full store build + lifecycle in-query, so the expectation matches
  * the r11 streaming-lifecycle set: near-flat to batch-proportional
  * walls dominated by the fixed per-job floor. s41's re-train term is
  * the t30 merge loop, whose cost is O(vocab × k) — corpus-independent
  * by design (the word-TYPE table insight), so its wall should be the
  * flattest of the set.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR12New'; the JSON line goes
  * into BENCH_SCALE_r12.json and SURVEY §8. */
object ScaleProbeR12New {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-r12-new")
    val names = Seq(
      "d69_cas_catalog_commit",
      "d70_posting_schema_evolution",
      "t58_phrase_from_index",
      "s40_stream_pinned_generation_read",
      "s41_stream_tokenizer_retrain",
      "d71_cross_surface_atomic_takedown",
      "d72_index_tier_migration",
      "s42_stream_concurrent_maintenance")

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
    println(s"""{"metric":"scale_r12_new_queries_10x",""" +
      s""""sf_dirs":["sf0.01","sf0.1"],"docs":[500,5000],""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}

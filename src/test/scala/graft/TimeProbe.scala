package graft

/** Dev probe: wall-clock one query (post-warmup) at a given SF.
  * Usage: sbt 'Test/runMain graft.TimeProbe d11_simhash_dedup /root/testdata/sf0.1'
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session(32, "graft-timeprobe")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm codegen/classes
    val times = (1 to reps).map { _ =>
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: best ${times.min}%.2f s of ${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cardinalities of the d15 pipeline at 500k
  * synthetic docs, to locate the stage that exploded the 100× probe.
  * Usage: sbt 'Test/runMain graft.SP100Debug [dir]'
  */
object SP100Debug {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-sp100-debug")
    val dir = if (args.nonEmpty) args(0) else {
      val d = "/tmp/graft_sp100_debug_500k"
      if (!new java.io.File(s"$d/documents.parquet").exists()) {
        val tmp = ScaleProbe.synthCorpus(spark, 500000L, 1000L, "sp100dbg", parts = 32)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        spark.read.parquet(s"$tmp/documents.parquet")
          .write.mode("overwrite").parquet(s"$d/documents.parquet")
      }
      d
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: $r  [${(System.nanoTime() - t0) / 1e9}%.1f s]")
      r
    }
    val docs = Tables.documents(spark, dir)
    t("docs")(docs.count())
    import graft.ops.Dedup
    val (buckets, shingles) = Dedup.lshBucketsAndShingles(
      docs, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
    val b = Dedup.reuse(buckets)
    t("buckets")(b.count())
    t("top bucket sizes")(
      b.groupBy("band", "band_key").count().orderBy(desc("count"))
        .limit(10).collect().map(_.getLong(2)).mkString(","))
    val pairs = Dedup.reuse(Dedup.candidatePairs(b, materialize = false))
    t("candidate pairs")(pairs.count())
    val candIds = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    t("candidate docs")(candIds.count())
    val sh = Dedup.reuse(shingles.join(candIds, Seq("id"), "left_semi").distinct())
    t("candidate shingle set")(sh.count())
    val inter = pairs
      .join(sh.select(col("id").as("id_a"), col("h")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
    t("intersections")(inter.count())
    t("d15 end-to-end")(SparkEntry.queries("d15_verified_dedup_groups")(spark, dir).count())
    spark.stop()
  }
}

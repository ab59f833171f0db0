package graft

import org.apache.spark.sql.functions._

/** Dev profile: where does p02's wall clock go at sf0.1 — store init
  * (the once-per-corpus cost) vs the three delta admissions (the
  * recurring cost)? Run: sbt 'Test/runMain graft.P02Profile'. */
object P02Profile {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-p02-profile")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    // warm
    SparkEntry.queries("p02_incremental_curation")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), expr(ops.Incremental.plantSqlForProbe).as("t"))
    val corpus = docs.filter(col("doc_id") % 11 =!= 5)

    (1 to 2).foreach { it =>
      println(s"---- iteration $it")
      spark.catalog.clearCache(); System.gc()
      val idxTable = s"graft_band_index_p02prof$it"
      val exDir = Scratch.dir("graft_p02prof_exact")
      val shDir = Scratch.dir("graft_p02prof_shingles")
      t("init total") {
        val (cb, cs) = t("init: digest (hv reuse)") {
          ops.Dedup.lshBucketsAndShingles(
            corpus, "doc_id", "t", shingleWords = 3, bands = 4, rowsPerBand = 2) }
        t("init: band index write") { ops.Dedup.writeBandIndex(spark, cb, idxTable) }
        t("init: shingle store write") {
          cs.distinct().write.mode("overwrite").parquet(shDir) }
        t("init: exact store write") {
          corpus.select(md5(col("t")).as("h")).distinct()
            .write.mode("overwrite").parquet(exDir) }
      }
      (0 to 2).foreach { k =>
        t(s"delta $k") {
          val (row, _) = ops.Incremental.deltaStep(spark, docs, k, idxTable, exDir, shDir)
          t(s"delta $k census collect") { row.collect() }
        }
      }
    }
    spark.stop()
  }
}

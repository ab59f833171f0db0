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
      // per-JOB breakdown: which Spark jobs a delta actually launches and
      // what each costs (the fixed-overhead census behind task 6)
      val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
      val starts = new scala.collection.mutable.HashMap[Int, (Long, String)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = (System.nanoTime(),
            js.stageInfos.map(si => si.name.takeWhile(_ != '\n')).mkString(" | "))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, desc) =>
            jobs.synchronized { jobs += ((je.jobId, System.nanoTime() - t0, desc)) }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      (0 to 2).foreach { k =>
        jobs.synchronized(jobs.clear())
        t(s"delta $k") {
          val (row, _) = ops.Incremental.deltaStep(spark, docs, k, idxTable, exDir, shDir)
          t(s"delta $k census collect") { row.collect() }
        }
        jobs.synchronized {
          println(s"   delta $k: ${jobs.size} jobs")
          jobs.foreach { case (id, ns, desc) =>
            println(f"   job $id%4d ${ns / 1e9}%6.2f s  $desc")
          }
        }
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    spark.stop()
  }
}

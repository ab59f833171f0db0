package graft

import org.apache.spark.sql.functions._

/** 100×-decade datapoints for the CROSS-SURFACE lifecycle family (r13
  * verdict task 5) — the last catalog rows with no entry at the 100×
  * decade: d68/d71 (four-surface takedown: what is the takedown's wall
  * proportional to?), d66 (catalog history + time travel at volume),
  * d67 (reclamation-gated compaction), and the portable-handle
  * registration path (exportHandle → encode → registerHandle on a
  * store two decades larger — the claim is that registration is a
  * METADATA operation, flat in corpus size, and the first probe
  * through the registered table matches the native one).
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR16' → BENCH_SCALE_r14. */
object ScaleProbeR16 {
  def main(args: Array[String]): Unit = {
    import ops.{Dedup, Incremental, Similarity}
    val spark = Engine.session(appName = "graft-scale-probe-r16")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def wall(name: String)(sf: String): Double = {
      spark.catalog.clearCache(); System.gc()
      time { SparkEntry.queries(name)(spark, sf).collect(): Unit }
    }
    val names = Seq("d66_catalog_history_timetravel",
      "d67_reclamation_gated_compaction", "d68_cross_surface_takedown",
      "d71_cross_surface_atomic_takedown")

    // JIT/codegen warm pass at the smallest SF
    names.foreach(n => wall(n)("/root/testdata/sf0.001"))

    val sf01 = "/root/testdata/sf0.1"
    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spr16", parts = 32, vocabSize = 144)
    val e2e = names.map { n =>
      val a = wall(n)(sf01)
      val b = wall(n)(dir100)
      f""""$n":{"sf01_sec":$a%.2f,"x100_sec":$b%.2f,"ratio_100x":${b / a}%.2f}"""
    }

    // portable-handle registration at both decades: build a real
    // cell-bucketed store from the corpus, export the handle, DROP the
    // metastore entry (files survive), re-register from the handle, and
    // probe through the registration. Registration must be FLAT (it
    // writes metastore metadata over existing files); store build and
    // probe scale with the corpus and are priced separately.
    graft.functions.LongDot.register(spark)
    graft.plans.TopKPerGroup.install(spark)
    def handleLeg(sf: String, tag: String): String = {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
        .withColumn("n2", Similarity.norm2Q(col("v")))
      var table: String = null
      val tBuild = time {
        table = Similarity.writeIvfIndex(spark,
          Dedup.reuse(Similarity.ivfAssign(e)), s"ivf_$tag")
      }
      val h = Incremental.exportHandle(spark, table)
      spark.sql(s"DROP TABLE `$table`"): Unit
      var back: String = null
      val tReg = time {
        back = Incremental.registerHandle(spark,
          Incremental.PortableHandle.decode(h.encoded))
      }
      val cents = spark.table(back).filter(col("cid") < 8)
        .select(col("cid").as("cent_id"), col("cv2").as("cv"))
      val probes = Similarity.ivfAssignAgainst(
          e.filter(col("vec_id") >= 10 && col("vec_id") < 15), cents)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("qn2"), col("cell").as("qcell"))
      val tProbe = time {
        Similarity.probeIvfTopK(spark.table(back), probes, k = 3)
          .collect(): Unit
      }
      f""""store_build_sec":$tBuild%.2f,"register_sec":$tReg%.3f,""" +
        f""""probe_sec":$tProbe%.2f"""
    }
    val hA = handleLeg(sf01, "spr16a")
    val hB = handleLeg(dir100, "spr16b")

    println(s"""{"metric":"scale_r16_cross_surface_100x","docs":[5000,500000],""" +
      s""""vecs":[2000,200000],""" + e2e.mkString(",") +
      s""","portable_handle":{"sf01":{$hA},"x100":{$hB}}}""")
    spark.stop()
  }
}

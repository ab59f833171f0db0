package graft

import org.apache.spark.sql.functions._

/** The IVF-PQ probe's 100× mitigation datapoint. ScaleProbeLifecycle100
  * measures the probe at 100× corpus under FIXED 8 cells: per-cell
  * population grows 100×, so a fixed query set costs ~linear-in-corpus
  * (measured 74.9×) — which is precisely the regime the d65 layout
  * ladder exists to exit: cells ∝ N keeps per-cell population constant
  * (the d32 scaled-cell rule). This probe re-lays the SAME 100× corpus
  * at 800 cells (200k vectors → ~250/cell, the sf0.1 fixture's own
  * per-cell population at 2000/8) and re-times the same fixed query
  * set: the probe should fall back to the sf0.1 wall, proving the
  * migration (d64/d65 machinery) — not hardware — is the scale path.
  * Assignment cost against 800 broadcast anchors is also reported (a
  * one-time migration cost, ∝ corpus × cells).
  *
  * Run: sbt 'Test/runMain graft.ScaleProbePqCells'; JSON goes into
  * BENCH_SCALE_r12.json next to scale_lifecycle_phases_100x. */
object ScaleProbePqCells {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-pq-cells")
    import graft.ops.{Dedup, Similarity}
    import graft.ops.Similarity.{norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    graft.functions.LongL2.register(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def probeWall(sf: String, numCents: Int, tag: String): (Double, Double) = {
      spark.catalog.clearCache(); System.gc()
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), quantize(col("embedding")).as("v"))
        .withColumn("n2", norm2Q(col("v")))
      var assign: org.apache.spark.sql.DataFrame = null
      val tAssign = time {
        assign = Dedup.reuse(Similarity.ivfAssign(e, numCents))
        assign.count(): Unit
      }
      val cb = Similarity.pqCodebook(e)
      val isProbe = col("vec_id") % 7 === 5 && col("vec_id") < 2100 * 7
      val encAll = assign.withColumn("codes", Similarity.pqCodesCol(cb))
      val idx = Similarity.writeIvfPqIndex(spark, encAll.filter(!isProbe), tag)
      val probes = assign.filter(isProbe)
        .select(col("vec_id").as("qid"), col("cell").as("qcell"),
          Similarity.pqLutCol(cb).as("lut"))
      val queryVecs = assign.filter(isProbe)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      val corpus = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("n2").as("cn2"))
      val tProbe = time {
        Similarity.probeIvfPqTopK(spark.table(idx), probes, queryVecs,
          corpus, kAdc = 10, k = 3).count(): Unit
      }
      (tAssign, tProbe)
    }

    // warm
    probeWall("/root/testdata/sf0.001", 8, "pqc_w"): Unit

    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_pqc100", parts = 32, vocabSize = 144)
    val (_, pBase) = probeWall("/root/testdata/sf0.1", 8, "pqc_base")
    val (aFixed, pFixed) = probeWall(dir100, 8, "pqc_fixed8")
    val (aScaled, pScaled) = probeWall(dir100, 800, "pqc_scaled800")

    println(f"""{"metric":"scale_ivfpq_cell_migration_100x","vecs":[2000,200000],""" +
      f""""probe_sf01_8cells_sec":$pBase%.2f,""" +
      f""""probe_100x_8cells_sec":$pFixed%.2f,"ratio_vs_sf01":${pFixed / pBase}%.2f,""" +
      f""""probe_100x_800cells_sec":$pScaled%.2f,"ratio_vs_sf01_after_migration":${pScaled / pBase}%.2f,""" +
      f""""assign_100x_8cells_sec":$aFixed%.2f,"assign_100x_800cells_sec":$aScaled%.2f}""")
    spark.stop()
  }
}

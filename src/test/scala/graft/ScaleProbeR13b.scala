package graft

import org.apache.spark.sql.functions._

/** The COMPOSED cure for the one remaining 100× pathology: the
  * compressed-tier probe under fixed 8 cells reads 47-75× at a 100×
  * corpus (per-cell candidate population is 100× — linear by
  * construction; measured again in ScaleProbeR13). The production fix
  * is d73's cell migration followed by d72's encode: re-lay the raw
  * tier at the gate's target count (200k vectors → the ladder's 1024),
  * train/encode the compressed tier FROM the migrated store, probe the
  * same fixed query set. This prices that composition end-to-end —
  * the claim is the probe returns to fixture-level per-cell population
  * cost, paid for by a one-time corpus-∝ migration + encode.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR13b' → BENCH_SCALE_r13. */
object ScaleProbeR13b {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-r13b")
    import graft.ops.{Dedup, Similarity}
    import graft.ops.Similarity.{norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    graft.functions.LongL2.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spr13b", parts = 32, vocabSize = 144)
    val e = Tables.embeddings(spark, dir100)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("n2", norm2Q(col("v")))
    val raw8 = Similarity.writeIvfIndex(spark,
      Dedup.reuse(Similarity.ivfAssign(e)), "r13b_raw8")

    // the d73 action at the ladder's 200k-vector target
    var migrated: String = null
    val tMigrate = time {
      migrated = Similarity.migrateIvfIndexCells(spark, raw8, 1024, "r13b_m")
    }
    // the d72 encode, fed from the MIGRATED store
    val stored = spark.table(migrated)
      .select(col("cell"), col("cid").as("vec_id"), col("cv2").as("v"))
    val cb = Similarity.pqCodebook(stored.select(col("vec_id"), col("v")))
      .map(_.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) })
    var pq: String = null
    val tEncode = time {
      pq = Similarity.writeIvfPqIndex(spark,
        stored.withColumn("codes", Similarity.pqCodesCol(cb)), "r13b_pq")
    }
    // the SAME fixed query set as the pathology measurement, assigned
    // against the migrated generation's stored centroids
    val cents = spark.table(migrated).filter(col("cid") < 1024)
      .select(col("cid").as("cent_id"), col("cv2").as("cv"))
    val isProbe = col("vec_id") % 7 === 5 && col("vec_id") < 2100 * 7
    val assignQ = Similarity.ivfAssignAgainst(e.filter(isProbe), cents)
    val probes = assignQ.select(col("vec_id").as("qid"), col("cell").as("qcell"),
      Similarity.pqLutCol(cb).as("lut"))
    val queryVecs = assignQ.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("n2").as("qn2"))
    val corpus = e.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("n2").as("cn2"))
    def probe(): Unit =
      Similarity.probeIvfPqTopK(spark.table(pq), probes, queryVecs,
        corpus, kAdc = 10, k = 3).count(): Unit
    probe() // warm
    val tProbe = time { probe() }

    println(f"""{"metric":"scale_r13_pq_probe_after_cell_migration",""" +
      f""""vecs":200000,"cells":1024,"migrate_sec":$tMigrate%.2f,""" +
      f""""encode_sec":$tEncode%.2f,"probe_fixedq_sec":$tProbe%.2f}""")
    spark.stop()
  }
}

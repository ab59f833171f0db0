package graft

import org.apache.spark.sql.functions._

/** The 100× lifecycle datapoint (r11 verdict item 7): the maintained
  * BM25 stores (t53), the compressed IVF-PQ index (d63), and the
  * streaming BM25 lifecycle (s38) were priced at 10× only; this probe
  * adds the second decade on a synthetic corpus 100× sf0.1 (500k docs,
  * vocab ∝ N^(1/3) per the ScaleProbe100 rule; 200k vectors).
  *
  * Expected shapes, per phase:
  *  - bm25: init/compact ∝ corpus (the rebuild-equivalent passes),
  *    append ∝ batch (a fixed fixture fraction, so ≈ the corpus ratio —
  *    the CLAIM is append ≪ rebuild at the same decade), takedown ∝
  *    one store scan, probe ∝ the query terms' posting lists (linear in
  *    corpus via df growth, nothing quadratic).
  *  - ivfpq: build/rebuild ∝ corpus (code-encode is map-side), append
  *    ∝ batch, probe measured against a FIXED query set (the
  *    operational shape: query volume does not grow with the corpus;
  *    fixed anchors at 100× would otherwise make probe cost ∝
  *    corpus/cells × queries — the d62/d65 migration exists precisely
  *    to re-size cells, and is priced separately).
  *  - s38: the end-to-end two-wave stream (store init + both waves +
  *    the mid-stream takedown/compact/publish) — dominated by the init
  *    and per-job floors; the claim is no super-linear term.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeLifecycle100'; the JSON line
  * goes into BENCH_SCALE_r12.json and SURVEY §8. */
object ScaleProbeLifecycle100 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-lifecycle-100x")
    import graft.ops.{Dedup, Similarity, TextAnalysis}
    import graft.ops.Similarity.{norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    graft.functions.LongL2.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def bm25Phases(sf: String, tag: String): Map[String, Double] = {
      spark.catalog.clearCache(); System.gc()
      import spark.implicits._
      val queryTerms = Seq("q01" -> "merge", "q01" -> "sort",
        "q02" -> "stream", "q02" -> "window", "q03" -> "customer", "q03" -> "value")
      val qt = queryTerms.toDF("query_id", "term")
      val vocab = queryTerms.map(_._2).distinct
      val docs = Tables.documents(spark, sf)
      val dfDir = graft.Scratch.dir(s"graft_${tag}_df")
      val statsDir = graft.Scratch.dir(s"graft_${tag}_st")
      val p0 = Dedup.reuse(TextAnalysis.postingsOf(docs.filter(col("doc_id") % 5 =!= 3)))
      var table: String = null
      val tInit = time {
        table = TextAnalysis.writePostingStore(spark, p0, tag)
        TextAnalysis.logStatDeltas(p0, dfDir, statsDir, 0, 1)
      }
      val p1 = Dedup.reuse(TextAnalysis.postingsOf(docs.filter(col("doc_id") % 5 === 3)))
      val tAppend = time {
        TextAnalysis.appendPostingStore(spark, p1, table)
        TextAnalysis.logStatDeltas(p1, dfDir, statsDir, 1, 1)
      }
      val tomb = docs.filter(col("doc_id") % 7 === 2).select("doc_id")
      val tTakedown = time {
        val removed = spark.table(table).join(broadcast(tomb), Seq("doc_id"))
          .select("term", "doc_id", "tf", "dl").distinct()
        TextAnalysis.logStatDeltas(removed, dfDir, statsDir, 2, -1)
      }
      var table2: String = null
      val tCompact = time {
        table2 = TextAnalysis.compactPostingStore(spark, table, tomb, tag + "c")
      }
      val tProbe = time {
        TextAnalysis.bm25Probe("p", spark.table(table2), qt, vocab,
          dfDir, statsDir, spark).count(): Unit
      }
      Map("init" -> tInit, "append" -> tAppend, "takedown" -> tTakedown,
        "compact" -> tCompact, "probe" -> tProbe)
    }

    def pqPhases(sf: String, tag: String): Map[String, Double] = {
      spark.catalog.clearCache(); System.gc()
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), quantize(col("embedding")).as("v"))
        .withColumn("n2", norm2Q(col("v")))
      val assign = Dedup.reuse(Similarity.ivfAssign(e))
      val cb = Similarity.pqCodebook(e)
      val isDay1 = col("vec_id") % 7 === 3
      // FIXED query set (~300 vectors at every decade): query volume is
      // operational load, not corpus state
      val isProbe = col("vec_id") % 7 === 5 && col("vec_id") < 2100 * 7
      val encAll = assign.withColumn("codes", Similarity.pqCodesCol(cb))
      var idx: String = null
      val tBuild = time {
        idx = Similarity.writeIvfPqIndex(spark, encAll.filter(!isDay1 && !isProbe), tag)
      }
      val tAppend = time {
        Similarity.appendIvfPqIndex(spark, encAll.filter(isDay1), idx)
      }
      val tRebuild = time {
        Similarity.writeIvfPqIndex(spark, encAll.filter(!isProbe), tag + "r"): Unit
      }
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
      Map("build" -> tBuild, "append" -> tAppend,
        "rebuild" -> tRebuild, "probe" -> tProbe)
    }

    def s38Wall(sf: String): Double = {
      spark.catalog.clearCache(); System.gc()
      time { SparkEntry.queries("s38_stream_bm25_maintenance")(spark, sf).collect(): Unit }
    }

    // JIT/codegen warm at the smallest SF
    bm25Phases("/root/testdata/sf0.001", "bm_w100"): Unit
    pqPhases("/root/testdata/sf0.001", "pq_w100"): Unit
    s38Wall("/root/testdata/sf0.001"): Unit

    val sf01 = "/root/testdata/sf0.1"
    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spl100", parts = 32, vocabSize = 144)

    val b1 = bm25Phases(sf01, "bm_spl1x")
    val b100 = bm25Phases(dir100, "bm_spl100x")
    val p1 = pqPhases(sf01, "pq_spl1x")
    val p100 = pqPhases(dir100, "pq_spl100x")
    val s1 = s38Wall(sf01)
    val s100 = s38Wall(dir100)

    def j(a: Map[String, Double], b: Map[String, Double]): String =
      a.keys.toSeq.sorted.map { k =>
        f""""$k":{"sf01_sec":${a(k)}%.2f,"x100_sec":${b(k)}%.2f,"ratio_100x":${b(k) / a(k)}%.2f}"""
      }.mkString(",")

    println(s"""{"metric":"scale_lifecycle_phases_100x","docs":[5000,500000],""" +
      s""""vecs":[2000,200000],"bm25_stores":{${j(b1, b100)}},""" +
      s""""ivfpq_index":{${j(p1, p100)}},""" +
      f""""s38_end_to_end":{"sf01_sec":$s1%.2f,"x100_sec":$s100%.2f,"ratio_100x":${s100 / s1}%.2f}}""")
    spark.stop()
  }
}

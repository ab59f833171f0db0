package graft

import org.apache.spark.sql.functions._

/** The r12-verdict 100× datapoints (item 4): the round-12 surfaces were
  * priced at 10× only — this probe adds the second decade on the
  * ScaleProbeLifecycle100 synthetic corpus (500k docs / 200k vectors,
  * vocab ∝ N^(1/3)).
  *
  *  - d70 per-phase: v1 store init ∝ corpus, the POSITIONS BACKFILL
  *    rewrite ∝ corpus (it re-reads the source lake by design), the
  *    schema-checked append ∝ batch, and the t58 phrase probe ∝ the two
  *    phrase terms' posting rows (not the corpus).
  *  - d72 per-phase: raw-tier build ∝ corpus, codebook train (driver-
  *    bounded seed collect), the ENCODE MIGRATION pass ∝ corpus
  *    (map-side codes), and the compressed probe against a FIXED query
  *    set (query volume is operational load, not corpus state — the
  *    corpus-proportional-queries shape was priced, with its cure, in
  *    ScaleProbePqCells).
  *  - s40 / s42 end-to-end: the full pinned-read and racing-publishers
  *    streams at 100× (store init + waves + CAS maintenance in-query).
  *  - d73 end-to-end: at 200k vectors the census fires the ladder's cap
  *    (1024 cells) and the query runs the REAL 200k-row migration — the
  *    gate exercising exactly the mitigation ScaleProbePqCells measured.
  *  - t59 end-to-end: chained 3-term phrase from the positional store.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR13'; the JSON lines go into
  * BENCH_SCALE_r13.json and SURVEY §8. */
object ScaleProbeR13 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-r13")
    import graft.ops.{Dedup, Similarity, TextAnalysis}
    import graft.ops.Similarity.{norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    graft.functions.LongL2.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // ---- d70 phases: schema evolution on the posting store ----
    def d70Phases(sf: String, tag: String): Map[String, Double] = {
      spark.catalog.clearCache(); System.gc()
      val docs = Tables.documents(spark, sf)
      val base = docs.filter(col("doc_id") % 5 =!= 3)
      var t1: String = null
      val tInit = time {
        t1 = TextAnalysis.writePostingStore(spark,
          Dedup.reuse(TextAnalysis.postingsOf(base)), tag)
      }
      var t2: String = null
      val tBackfill = time {
        t2 = TextAnalysis.writePostingStore(spark,
          Dedup.reuse(TextAnalysis.postingsWithPositions(base)), tag + "v2")
      }
      val batch = TextAnalysis.postingsWithPositions(docs.filter(col("doc_id") % 5 === 3))
      val tAppend = time {
        TextAnalysis.appendPostingStoreTagged(spark, batch, t2, declaredTag = "v2")
      }
      // the t58 lookup shape: ONLY the two phrase terms' rows leave the
      // bucketed scan; phrase pinned (selection is user input)
      import spark.implicits._
      val phrase = Seq(("the", "of")).toDF("u", "v")
      val stored = spark.table(t2)
      val tProbe = time {
        val pu = stored.join(broadcast(phrase), stored("term") === phrase("u"))
          .select(col("doc_id"), explode(col("positions")).as("pos"))
        val pv = stored.join(broadcast(phrase.select(col("v").as("v2"))),
            stored("term") === col("v2"))
          .select(col("doc_id").as("doc_id2"), explode(col("positions")).as("pos2"))
        pu.join(pv, col("doc_id") === col("doc_id2") && col("pos2") === col("pos") + 1)
          .groupBy("doc_id").agg(count(lit(1))).count(): Unit
      }
      Map("init_v1" -> tInit, "positions_backfill" -> tBackfill,
        "checked_append" -> tAppend, "phrase_probe" -> tProbe)
    }

    // ---- d72 phases: raw → IVF-PQ tier migration ----
    def d72Phases(sf: String, tag: String): Map[String, Double] = {
      spark.catalog.clearCache(); System.gc()
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), quantize(col("embedding")).as("v"))
        .withColumn("n2", norm2Q(col("v")))
      val assign = Dedup.reuse(Similarity.ivfAssign(e))
      var raw: String = null
      val tBuild = time { raw = Similarity.writeIvfIndex(spark, assign, tag) }
      val stored = spark.table(raw)
        .select(col("cell"), col("cid").as("vec_id"), col("cv2").as("v"))
      var cb: Array[Array[(Long, Array[Long])]] = null
      val tTrain = time {
        cb = Similarity.pqCodebook(stored.select(col("vec_id"), col("v")))
          .map(_.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) })
      }
      var pq: String = null
      val tEncode = time {
        pq = Similarity.writeIvfPqIndex(spark,
          stored.withColumn("codes", Similarity.pqCodesCol(cb)), tag + "pq")
      }
      // FIXED query set (~300 vectors at every decade)
      val isProbe = col("vec_id") % 7 === 5 && col("vec_id") < 2100 * 7
      val probes = assign.filter(isProbe)
        .select(col("vec_id").as("qid"), col("cell").as("qcell"),
          Similarity.pqLutCol(cb).as("lut"))
      val queryVecs = assign.filter(isProbe)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      val corpus = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("n2").as("cn2"))
      val tProbe = time {
        Similarity.probeIvfPqTopK(spark.table(pq), probes, queryVecs,
          corpus, kAdc = 10, k = 3).count(): Unit
      }
      Map("raw_build" -> tBuild, "codebook_train" -> tTrain,
        "encode_migrate" -> tEncode, "pq_probe_fixedq" -> tProbe)
    }

    def wall(name: String)(sf: String): Double = {
      spark.catalog.clearCache(); System.gc()
      time { SparkEntry.queries(name)(spark, sf).collect(): Unit }
    }
    val e2eNames = Seq(
      "s40_stream_pinned_generation_read",
      "s42_stream_concurrent_maintenance",
      "d73_cell_growth_gate",
      "t59_kterm_phrase_from_index")

    // JIT/codegen warm pass at the smallest SF
    d70Phases("/root/testdata/sf0.001", "d70w"): Unit
    d72Phases("/root/testdata/sf0.001", "d72w"): Unit
    e2eNames.foreach(n => wall(n)("/root/testdata/sf0.001"))

    val sf01 = "/root/testdata/sf0.1"
    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spr13", parts = 32, vocabSize = 144)

    val d70a = d70Phases(sf01, "d70a")
    val d70b = d70Phases(dir100, "d70b")
    val d72a = d72Phases(sf01, "d72a")
    val d72b = d72Phases(dir100, "d72b")
    def j(a: Map[String, Double], b: Map[String, Double]): String =
      a.keys.toSeq.sorted.map { k =>
        f""""$k":{"sf01_sec":${a(k)}%.2f,"x100_sec":${b(k)}%.2f,"ratio_100x":${b(k) / a(k)}%.2f}"""
      }.mkString(",")
    println(s"""{"metric":"scale_r13_phases_100x","docs":[5000,500000],""" +
      s""""vecs":[2000,200000],"d70_schema_evolution":{${j(d70a, d70b)}},""" +
      s""""d72_tier_migration":{${j(d72a, d72b)}}}""")

    val e2e = e2eNames.map { n =>
      val a = wall(n)(sf01)
      val b = wall(n)(dir100)
      f""""$n":{"sf01_sec":$a%.2f,"x100_sec":$b%.2f,"ratio_100x":${b / a}%.2f}"""
    }
    println(s"""{"metric":"scale_r13_e2e_100x","docs":[5000,500000],""" +
      s""""vecs":[2000,200000],""" + e2e.mkString(",") + "}")

    spark.stop()
  }
}

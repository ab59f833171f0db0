package graft

import org.apache.spark.sql.functions._

/** Prices d75's cell-local refine at the 100× decade. ScaleProbeR13b
  * showed the composed cell cure restores the compressed probe to
  * 11.9 s — and attributed the residual to the corpus-∝ exact-refine
  * fetch (`corpus.join(broadcast(cand))` streams all 200k vectors).
  * d75 feeds the refine from the cell-bucketed raw tier instead, pruned
  * to the probed cells. Two batch shapes, because the win is locality:
  *
  *   - the R13b 2100-query batch (its cells cover most of the 1024
  *     buckets — pruning helps little BY DESIGN; this bounds the
  *     regression risk of the new shape on bulk probes), and
  *   - a 32-query serving batch (the deployed lookup shape: ≤32 of
  *     1024 buckets read — this is where the corpus fetch pays the
  *     full corpus scan for a handful of candidates).
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeR15' → BENCH_SCALE_r13. */
object ScaleProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-r15")
    import graft.ops.{Dedup, Similarity}
    import graft.ops.Similarity.{norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    graft.functions.LongL2.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val dir100 = ScaleProbe.synthCorpus(spark, 500000L, 200000L,
      "graft_spr15", parts = 32, vocabSize = 144)
    val e = Tables.embeddings(spark, dir100)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("n2", norm2Q(col("v")))
    val raw8 = Similarity.writeIvfIndex(spark,
      Dedup.reuse(Similarity.ivfAssign(e)), "r15_raw8")
    val migrated = Similarity.migrateIvfIndexCells(spark, raw8, 1024, "r15_m")
    val stored = spark.table(migrated)
      .select(col("cell"), col("cid").as("vec_id"), col("cv2").as("v"))
    val cb = Similarity.pqCodebook(stored.select(col("vec_id"), col("v")))
      .map(_.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) })
    val pq = Similarity.writeIvfPqIndex(spark,
      stored.withColumn("codes", Similarity.pqCodesCol(cb)), "r15_pq")
    val cents = spark.table(migrated).filter(col("cid") < 1024)
      .select(col("cid").as("cent_id"), col("cv2").as("cv"))
    val corpus = e.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("n2").as("cn2"))

    def shapes(isProbe: org.apache.spark.sql.Column, tag: String): Unit = {
      val assignQ = Similarity.ivfAssignAgainst(e.filter(isProbe), cents)
        .localCheckpoint(true)
      val nQ = assignQ.count()
      val probes = assignQ.select(col("vec_id").as("qid"),
        col("cell").as("qcell"), Similarity.pqLutCol(cb).as("lut"))
      val queryVecs = assignQ.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("n2").as("qn2"))
      val cells = assignQ.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val localFetch = spark.table(migrated)
        .filter(col("cell").isin(cells.map(Long.box): _*))
        .select(col("cid"), col("cv2").as("cv"), col("cn2"))
      // the local variant prunes BOTH tiers' scans, as d75 ships it
      val prunedPq = spark.table(pq)
        .filter(col("cell").isin(cells.map(Long.box): _*))
      def run(idx: org.apache.spark.sql.DataFrame,
          fetch: org.apache.spark.sql.DataFrame): Unit =
        Similarity.probeIvfPqTopK(idx, probes, queryVecs,
          fetch, kAdc = 10, k = 3).count(): Unit
      run(spark.table(pq), corpus); run(prunedPq, localFetch) // warm both
      val tCorpus = time { run(spark.table(pq), corpus) }
      val tLocal = time { run(prunedPq, localFetch) }
      println(f"""{"metric":"scale_r15_refine_$tag%s","vecs":200000,""" +
        f""""cells":1024,"queries":$nQ%d,"probed_cells":${cells.size}%d,""" +
        f""""corpus_fetch_sec":$tCorpus%.2f,"cell_local_sec":$tLocal%.2f}""")
    }

    // the R13b bulk shape: 2100 queries, cells mostly covered
    shapes(col("vec_id") % 7 === 5 && col("vec_id") < 2100 * 7, "bulk2100q")
    // the serving shape: 32 queries, <=32 of 1024 buckets read
    shapes(col("vec_id") % 7 === 5 && col("vec_id") < 32 * 7, "serve32q")

    // the refine leg in ISOLATION (the full funnel buries it under the
    // shared ADC leg): same 32-query candidate set, fetch source the
    // only variable — wall PLUS the scan's files/bytes, because at this
    // SF a 1024-bucket tier holds ~195 rows per file and per-file
    // constants dominate wall; the bytes column is the quantity that
    // scales to a 100 TB tier
    {
      import org.apache.spark.sql.classic.ClassicConversions.castToImpl
      val assignQ = Similarity.ivfAssignAgainst(
        e.filter(col("vec_id") % 7 === 5 && col("vec_id") < 32 * 7), cents)
        .localCheckpoint(true)
      val probes = assignQ.select(col("vec_id").as("qid"),
        col("cell").as("qcell"), Similarity.pqLutCol(cb).as("lut"))
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("ad").asc, col("cid"))
      val cand = spark.table(pq)
        .join(broadcast(probes), col("cell") === col("qcell") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cell"), col("cid"),
          Similarity.pqAdcCol(col("lut"), col("codes")).as("ad"))
        .distinct()
        .withColumn("rk", row_number().over(wa))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("cid"), col("ad"))
        .localCheckpoint(true)
      val cells = assignQ.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val localFetch = spark.table(migrated)
        .filter(col("cell").isin(cells.map(Long.box): _*))
        .select(col("cid"), col("cv2").as("cv"), col("cn2"))
      def selected(df: org.apache.spark.sql.DataFrame): String =
        "SelectedBucketsCount: (\\d+) out of (\\d+)".r
          .findFirstMatchIn(castToImpl(df).queryExecution.executedPlan.toString)
          .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("full-scan")
      def fetch(src: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val j = src.join(broadcast(cand), Seq("cid"))
        j.collect(): Unit // warm
        val t = time { j.collect(): Unit }
        println(f"""{"metric":"scale_r15_refine_leg_$tag%s","vecs":200000,""" +
          f""""cells":1024,"queries":32,"fetch_sec":$t%.2f,""" +
          f""""selected_buckets":"${selected(j)}%s"}""")
      }
      fetch(corpus, "corpusfetch")
      fetch(localFetch, "celllocal")

      // the ADC leg: pruned vs unpruned compressed-tier scan. Both
      // schedule one task per bucket (1024); pruning only changes bytes
      def adcLeg(src: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val a = src
          .join(broadcast(probes), col("cell") === col("qcell") && col("cid") =!= col("qid"))
          .select(col("qid"), col("cid"),
            Similarity.pqAdcCol(col("lut"), col("codes")).as("ad"))
        a.collect(): Unit // warm
        val t = time { a.collect(): Unit }
        println(f"""{"metric":"scale_r15_adc_leg_$tag%s","vecs":200000,""" +
          f""""cells":1024,"queries":32,"adc_sec":$t%.2f,""" +
          f""""selected_buckets":"${selected(a)}%s"}""")
      }
      adcLeg(spark.table(pq), "full")
      adcLeg(spark.table(pq).filter(col("cell").isin(cells.map(Long.box): _*)),
        "pruned")
    }
    spark.stop()
  }
}

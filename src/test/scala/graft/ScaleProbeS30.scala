package graft

import org.apache.spark.sql.functions._

/** Streaming-ingest scale datapoint for the composed s30 pipeline: the
  * claim its docstring makes — "per-batch work ∝ BATCH size" — measured
  * against corpora 10× and 100× bigger. A FIXED ~500-doc arriving batch
  * runs [[graft.streaming.StreamingQueries.curationBatch]] (the exact
  * foreachBatch body s30 executes) against the sf0.1 fixture corpus and
  * the two vocab-scaled synthetic corpora (50k / 500k docs,
  * [[ScaleProbe.synthCorpus]]), each with its band index stored, its
  * full shingle digest as the verification side, and the frontier SEEN
  * store pre-seeded with every corpus URL — so the three ∝-corpus terms
  * a naive composition could hide (frontier anti-join, index probe,
  * candidate-restricted digest semi-join) all face corpus-scale state.
  *
  * The arriving batch is the same at every scale: the fixture's
  * %11 = 5 split (ids offset so they collide with no corpus doc) plus
  * 50 docs COPIED from the current corpus (offset ids, identical text)
  * so the dup path verifies non-vacuously everywhere. The benchmark
  * chunk set is the fixture's %13 = 7 split at every scale — a real
  * benchmark is fixed, it does not grow with the corpus.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeS30'; the JSON line is merged
  * into BENCH_SCALE_r09.json and summarized in SURVEY §6/§8.
  */
object ScaleProbeS30 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-s30")
    import graft.ops.{CurationExtra, Dedup}
    import graft.streaming.StreamingQueries

    val sf01 = "/root/testdata/sf0.1"
    val dir50k = ScaleProbe.synthCorpus(spark, 50000L, 1000L,
      "graft_sps30_50k", parts = 8, vocabSize = 67)
    val dir500k = ScaleProbe.synthCorpus(spark, 500000L, 1000L,
      "graft_sps30_500k", parts = 32, vocabSize = 144)

    // the FIXED arriving batch: fixture %11=5 split, ids offset clear of
    // every corpus id range; the per-scale dup plant is added below
    // ids are SPREAD (×997), not just offset: synthUrl buckets 140
    // consecutive ids into one article path, so consecutive offset ids
    // would collapse in stage 1's within-batch canonical dedup — the
    // probe needs the batch to SURVIVE stage 1, not measure it shrinking
    val fixedArrivals = Tables.documents(spark, sf01)
      .filter(col("doc_id") % 11 === 5)
      .select((col("doc_id") * 997L + 10000000L).as("doc_id"), col("text"), col("source"))
    // fixed benchmark chunk set (the fixture's %13=7 split) at every scale
    val benchSet = Dedup.reuse(StreamingQueries.chunkHashes(
      Tables.documents(spark, sf01).filter(col("doc_id") % 13 === 7)
        .select(col("doc_id"), col("text")))
      .select(col("chunk_hash").as("bh")).distinct())

    def scalePoint(tag: String, dir: String): (Double, Long, Long, Long) = {
      val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 11 =!= 5)
        .select(col("doc_id"), col("text"), col("source"))
      val (corpusBuckets, corpusShingles) = Dedup.lshBucketsAndShingles(
        corpus, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
      val idxTable = s"graft_band_index_sps30_$tag"
      Dedup.writeBandIndex(spark, corpusBuckets, idxTable)
      val nCorpus = corpus.count()
      // 50 corpus docs re-arrive under new ids: guaranteed dup candidates
      val plants = corpus.orderBy("doc_id").limit(50)
        .select((col("doc_id") * 991L + 50000000L).as("doc_id"), col("text"), col("source"))
      val batch = fixedArrivals.unionByName(plants).localCheckpoint(true)
      val nBatch = batch.count()
      def seedSeen(i: Int): String = {
        val d = Scratch.dir(s"graft_sps30_seen_${tag}_$i")
        corpus.select(CurationExtra.canonicalUrl(CurationExtra.synthUrl).as("cu"))
          .distinct().write.mode("overwrite").parquet(d)
        d
      }
      var lastVer = 0L
      val ts = (1 to 2).map { i =>
        val seen = seedSeen(i)     // fresh per run: the batch body APPENDS
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val out = StreamingQueries.curationBatch(
          spark, batch, idxTable, benchSet, corpusShingles, seen)
        lastVer = out.filter(col("verdict") === "duplicate").count()
        val sec = (System.nanoTime() - t0) / 1e9
        out.unpersist()
        sec
      }
      require(lastVer >= 40, s"$tag: only $lastVer verified dups of 50 planted")
      println(f"== $tag done: ${ts.min}%.2f s, corpus $nCorpus, dups $lastVer")
      (ts.min, nCorpus, nBatch, lastVer)
    }

    // JIT/codegen warm
    scalePoint("warm", "/root/testdata/sf0.001")
    val (t5, c5, b5, v5) = scalePoint("5k", sf01)
    val (t50, c50, _, v50) = scalePoint("50k", dir50k)
    val (t500, c500, _, v500) = scalePoint("500k", dir500k)

    println(s"""{"metric":"scale_s30_ingest","batch_docs":$b5,""" +
      s""""corpus_docs":[$c5,$c50,$c500],""" +
      s""""sec":[${f"$t5%.2f"},${f"$t50%.2f"},${f"$t500%.2f"}],""" +
      s""""ratio_10x_corpus":${f"${t50 / t5}%.2f"},""" +
      s""""ratio_100x_corpus":${f"${t500 / t5}%.2f"},""" +
      s""""verified_dups":[$v5,$v50,$v500]}""")
    spark.stop()
  }
}

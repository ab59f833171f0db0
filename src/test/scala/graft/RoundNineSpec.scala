package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-9 specs: the ManifestSink crash-residue TTL sweep (the r8
  * advisor's reclamation gap) and the rendered tokenizer-application
  * oracles' structural invariants. */
class RoundNineSpec extends SparkTestBase {

  private def writeOnce(dir: String, n: Long, ttl: Option[Long] = None): Unit = {
    val w = spark.range(0, n)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .write.format("graft-manifest-sink").option("path", dir)
    ttl.fold(w)(t => w.option("residueTtlMs", t.toString))
      .mode("overwrite").save()
  }

  test("manifest sink sweeps hard-crash residue by age: an orphaned " +
    "stage file older than the TTL is reclaimed by the next commit, a " +
    "fresh foreign in-flight file is NOT, and committed data is intact") {
    val dir = Scratch.dir("graft_sink_ttl_spec")
    writeOnce(dir, 10)
    // two foreign-job orphans (abort() never ran — JVM died): one ancient,
    // one fresh enough to be a live concurrent writer's in-flight file
    val ancient = new File(dir, "stage-dead0000-0-1-aaaa.tsv")
    Files.writeString(ancient.toPath, "1\tghost\n")
    assert(ancient.setLastModified(
      System.currentTimeMillis() - 25L * 60 * 60 * 1000))
    val fresh = new File(dir, "stage-live0000-0-2-bbbb.tsv")
    Files.writeString(fresh.toPath, "2\tinflight\n")

    writeOnce(dir, 7)
    val onDisk = new File(dir).listFiles().map(_.getName).toSet
    assert(!onDisk.contains(ancient.getName),
      "25h-old crash residue survived the default-TTL sweep")
    assert(onDisk.contains(fresh.getName),
      "a fresh foreign staging file was swept — a live concurrent " +
        "writer's in-flight data would be clobbered")
    val read = spark.read.schema("k LONG, v STRING").option("sep", "\t")
      .csv(sources.ManifestSink.committedFiles(dir): _*)
    assert(read.count() == 7)

    // per-write TTL override: the fresh orphan ages past a 1ms TTL
    writeOnce(dir, 3, ttl = Some(1L))
    val onDisk2 = new File(dir).listFiles().map(_.getName).toSet
    assert(!onDisk2.contains(fresh.getName),
      "residueTtlMs option was not honored")
    assert(spark.read.schema("k LONG, v STRING").option("sep", "\t")
      .csv(sources.ManifestSink.committedFiles(dir): _*).count() == 3)
  }

  test("s30 composed streaming curation: stream result equals the same " +
    "three-stage program run as one batch, and the benchmark chunk set " +
    "broadcast into every micro-batch join") {
    streaming.StreamingQueries.s30ProbeBroadcasts = Nil
    val streamed = SparkEntry.queries("s30_stream_curation_pipeline")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    // stream ≡ batch: the identical curationBatch program over the whole
    // ingest split in ONE batch job, fresh external state
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val docsStatic = Tables.documents(spark, sf0001)
    val corpus = docsStatic.filter(col("doc_id") % 11 =!= 5)
    val (corpusBuckets, corpusShingles) = Dedup.lshBucketsAndShingles(
      corpus, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
    Dedup.writeBandIndex(spark, corpusBuckets, "graft_band_index_r9eq")
    val benchSet = streaming.StreamingQueries.chunkHashes(
      docsStatic.filter(col("doc_id") % 13 === 7))
      .select(col("chunk_hash").as("bh")).distinct()
    val batched = streaming.StreamingQueries.curationBatch(spark,
      docsStatic.filter(col("doc_id") % 11 === 5),
      "graft_band_index_r9eq", benchSet, corpusShingles,
      Scratch.dir("graft_r9eq_seen"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batched,
      s"stream/batch divergence: ${streamed.diff(batched).take(3)} vs " +
        s"${batched.diff(streamed).take(3)}")
    // per-batch broadcast evidence (the s19 pattern): the benchmark chunk
    // set went over a BroadcastExchange, the corpus never did
    assert(streaming.StreamingQueries.s30ProbeBroadcasts.exists(_.contains("bh")),
      "benchmark chunk set was not broadcast into the micro-batch join")
  }

  test("s30 frontier state is external and exactly-once: replaying the " +
    "same documents as newly-arriving files yields ZERO new frontier " +
    "rows and the seen store does not grow") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.ops.Dedup
    val docsStatic = Tables.documents(spark, sf0001)
    val corpus = docsStatic.filter(col("doc_id") % 11 =!= 5)
    val (corpusBuckets, corpusShingles) = Dedup.lshBucketsAndShingles(
      corpus, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
    Dedup.writeBandIndex(spark, corpusBuckets, "graft_band_index_r9replay")
    val benchSet = streaming.StreamingQueries.chunkHashes(
      docsStatic.filter(col("doc_id") % 13 === 7))
      .select(col("chunk_hash").as("bh")).distinct()
    val watched = Scratch.dir("graft_r9_watched")
    val seenDir = Scratch.dir("graft_r9_seen")
    val outDir = Scratch.dir("graft_r9_out")
    val ckpt = Scratch.dir("graft_r9_ckpt")
    val src = new java.io.File(sf0001, "documents.parquet").toPath
    def runOnce(): Unit = {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val q = spark.readStream.schema(schema).parquet(watched)
        .filter(col("doc_id") % 11 === 5)
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          streaming.StreamingQueries.curationBatch(spark, b.toDF(),
            "graft_band_index_r9replay", benchSet, corpusShingles, seenDir)
            .write.mode("append").parquet(outDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    java.nio.file.Files.copy(src,
      new java.io.File(watched, "arrival1.parquet").toPath)
    runOnce()
    val rows1 = spark.read.parquet(outDir).count()
    val seen1 = spark.read.schema("cu STRING").parquet(seenDir).count()
    assert(rows1 > 0 && seen1 > 0)
    // re-discovery: the SAME docs arrive again as a new file; every cu is
    // already in the external store, so the frontier admits nothing
    java.nio.file.Files.copy(src,
      new java.io.File(watched, "arrival2.parquet").toPath)
    runOnce()
    assert(spark.read.parquet(outDir).count() == rows1,
      "replayed documents re-entered the pipeline past the frontier")
    assert(spark.read.schema("cu STRING").parquet(seenDir).count() == seen1,
      "seen store grew on a pure re-discovery batch")
  }

  test("rendered tokenizer oracles: merge/piece tables are interpolated " +
    "as escaped VALUES and the generated SQL is corpus-dependent") {
    val t31 = SparkEntry.dynamicOracleSql(spark, sf0001)
    assert(Set("t31_bpe_segment", "t37_unigram_segment",
      "t39_tokenizer_fertility").subsetOf(t31.keySet))
    val bpe = t31("t31_bpe_segment")
    val uni = t31("t37_unigram_segment")
    val both = t31("t39_tokenizer_fertility")
    // the learned tables actually landed in the SQL (not empty sentinels)
    assert(bpe.contains("merges(rank, l, r) AS (VALUES (1, "),
      "t31 oracle does not start its VALUES at rank 1 — training output missing")
    assert(uni.contains("pieces(piece, cost) AS (VALUES ("),
      "t37 oracle has no rendered piece table")
    assert(both.contains("merges(rank, l, r)") && both.contains("pieces(piece, cost)"),
      "t39 oracle must embed BOTH learned tables")
    // single quotes in corpus-derived symbols must be doubled, never raw:
    // an odd count of consecutive quotes would break the SQL string
    assert(!bpe.matches("(?s).*[^']'''[^'].*"), "unbalanced quoting in t31 VALUES")
    // Viterbi tie-break encoding: longest piece must sort first on cost
    // ties (negl ascending = length descending)
    assert(uni.contains("negl := -4"), "t37 Viterbi lost the 4-char candidate")
  }

  test("p01 composed pipeline is partition-count invariant: the census is " +
    "byte-identical under a different cluster shape — the property a fleet's " +
    "task retries and speculation silently assume of the FLAGSHIP artifact") {
    // same contract RoundSevenSpec proves for the solo heavy pipelines
    // (d08/d15/d22), here for their nine-stage composition: the census's
    // sum_ids checksums pin every stage's exact survivor SET, so any
    // placement- or order-dependence in the composed dataflow (banding,
    // CC iteration order, the prefix-sum packing) surfaces as a diff.
    val runs = Seq("4", "7").map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        // drop the previous shape's caches: fullCuration persists its
        // stage snapshots, and a cache hit would make the second run a
        // read of the FIRST run's results — vacuously equal
        spark.catalog.clearCache()
        SparkEntry.queries("p01_full_curation")(spark, sf0001).collect().toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(runs(0) == runs(1),
      "p01 census depends on the shuffle partition count")
    assert(runs(0).size == 9, "census must have 9 stages")
    spark.catalog.clearCache()
  }
}

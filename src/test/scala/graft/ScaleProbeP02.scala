package graft

import org.apache.spark.sql.functions._

/** Incremental-ingest scale datapoint for the composed p02 pipeline —
  * the claim that justifies its existence: per-DELTA admission cost
  * tracks the DELTA, not the corpus, while the rebuild-equivalent cost
  * (store init: corpus digest + band index + shingle/hash stores) grows
  * with the corpus. Measured at 5k / 50k / 500k corpus docs
  * ([[ScaleProbe.synthCorpus]], vocab ∝ N^(1/3)) with a FIXED ~500-doc
  * delta at every scale, admitted against full corpus-scale store state
  * through [[graft.ops.Incremental.deltaStep]] — the exact per-delta
  * body p02 runs, store maintenance included.
  *
  * The delta is the fixture's %11 = 5 split re-keyed to the p02 delta-0
  * id residue (27 mod 33), plus 50 docs copied from the current corpus
  * under fresh ids so the store near-dup path verifies non-vacuously at
  * every scale (the fixture texts themselves share no vocab with the
  * scaled synthetic corpora). A SECOND fixed delta (residue 16 mod 33,
  * delta 1) then admits against the state the first delta just
  * appended — pricing the steady-state ingest step, not just the
  * first-ever delta.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbeP02'; the JSON line is merged
  * into BENCH_SCALE_r09.json and summarized in SURVEY §6/§8.
  */
object ScaleProbeP02 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-p02")
    import graft.ops.{Dedup, Incremental}

    val sf01 = "/root/testdata/sf0.1"
    val dir50k = ScaleProbe.synthCorpus(spark, 50000L, 1000L,
      "graft_spp02_50k", parts = 8, vocabSize = 67)
    val dir500k = ScaleProbe.synthCorpus(spark, 500000L, 1000L,
      "graft_spp02_500k", parts = 32, vocabSize = 144)

    // the FIXED arriving content at every scale: the fixture's %11 = 5
    // split (ids re-keyed to the delta residues below)
    val fixedArrivals = Dedup.reuse(Tables.documents(spark, sf01)
      .filter(col("doc_id") % 11 === 5).select(col("doc_id"), col("text")))

    // doc_id ≡ 27 (mod 33) ⇔ %11 = 5 ∧ %3 = 0 (delta 0);
    // doc_id ≡ 16 (mod 33) ⇔ %11 = 5 ∧ %3 = 1 (delta 1)
    def rekey(df: org.apache.spark.sql.DataFrame, residue: Long, off: Long) =
      df.select((col("doc_id") * 33L + lit(off * 33L) + lit(residue)).as("doc_id"),
        col("text").as("t"))

    def scalePoint(tag: String, dir: String,
        strict: Boolean = true): (Long, Double, Double, Double, Long) = {
      // the fixture arrivals (%11 = 5 texts) must NOT already be corpus
      // members at the 5k point, where corpus and arrivals share a source
      val corpus0 = Tables.documents(spark, dir).filter(col("doc_id") % 11 =!= 5)
      // corpus ids re-keyed to %11 = 1: never selected by any delta filter
      val corpus = corpus0.select((col("doc_id") * 11L + 1L).as("doc_id"),
        col("text").as("t"))
      val nCorpus = corpus.count()
      // each delta carries DISTINCT fresh content (delta 1 re-sending
      // delta 0's texts would be — correctly — dropped wholesale as
      // exact-store dups) plus 50 docs copied from the current corpus
      // under fresh ids: the guaranteed store-dup work at every scale.
      // Ranked by row_number so plant1 is exactly the NEXT 50 corpus
      // docs, disjoint from plant0 (ids are not dense, so a doc_id
      // threshold would overlap)
      val ranked = corpus0.orderBy("doc_id").limit(100)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      val plant0 = rekey(ranked.filter(col("rn") <= 50)
        .select(col("doc_id"), col("text")), 27L, 40000000L)
      val plant1 = rekey(ranked.filter(col("rn") > 50)
        .select(col("doc_id"), col("text")), 16L, 50000000L)
      val delta0 = rekey(fixedArrivals.filter(col("doc_id") % 2 === 0), 27L, 10000000L)
        .unionByName(plant0.select(col("doc_id"), col("t")))
      val delta1 = rekey(fixedArrivals.filter(col("doc_id") % 2 === 1), 16L, 20000000L)
        .unionByName(plant1.select(col("doc_id"), col("t")))
      val docs = corpus.unionByName(delta0).unionByName(delta1)
        .localCheckpoint(true)

      // ---- the rebuild-equivalent cost: store init over the corpus
      val idxTable = s"graft_band_index_spp02_$tag"
      val exDir = Scratch.dir(s"graft_spp02_exact_$tag")
      val shDir = Scratch.dir(s"graft_spp02_shingles_$tag")
      spark.catalog.clearCache(); System.gc()
      val tInit0 = System.nanoTime()
      val (cb, cs) = Dedup.lshBucketsAndShingles(
        corpus, "doc_id", "t", shingleWords = 3, bands = 4, rowsPerBand = 2)
      Dedup.writeBandIndex(spark, cb, idxTable)
      cs.distinct().write.mode("overwrite").parquet(shDir)
      corpus.select(md5(col("t")).as("h")).distinct()
        .write.mode("overwrite").parquet(exDir)
      val tInit = (System.nanoTime() - tInit0) / 1e9

      // ---- two fixed deltas against corpus-scale state
      def runDelta(k: Int): (Double, Long, Long) = {
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val (row, adm) = Incremental.deltaStep(spark, docs, k, idxTable, exDir, shDir)
        val r = row.collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, r.getLong(r.fieldIndex("n_admitted")),
          r.getLong(r.fieldIndex("n_near_store")) + r.getLong(r.fieldIndex("n_exact_store")))
      }
      val (tD0, adm0, dup0) = runDelta(0)
      val (tD1, adm1, dup1) = runDelta(1)
      if (strict) {
        require(adm0 > 0 && adm1 > 0, s"$tag: a delta admitted nothing")
        require(dup0 >= 40 && dup1 >= 40,
          s"$tag: store-dup path near-vacuous ($dup0 / $dup1 of 50 planted)")
      }
      println(f"== $tag: corpus $nCorpus, init $tInit%.2f s, " +
        f"delta0 $tD0%.2f s (adm $adm0, dup $dup0), delta1 $tD1%.2f s (adm $adm1, dup $dup1)")
      (nCorpus, tInit, tD0, tD1, adm0 + adm1)
    }

    // JIT/codegen warm — exists only to heat the code paths, so the
    // dup-coverage requires apply to the measured points alone
    scalePoint("warm", "/root/testdata/sf0.001", strict = false)
    val (c5, i5, d5a, d5b, _) = scalePoint("5k", sf01)
    val (c50, i50, d50a, d50b, _) = scalePoint("50k", dir50k)
    val (c500, i500, d500a, d500b, _) = scalePoint("500k", dir500k)

    def mn(a: Double, b: Double) = math.min(a, b)
    println(s"""{"metric":"scale_p02_ingest","corpus_docs":[$c5,$c50,$c500],""" +
      s""""init_sec":[${f"$i5%.2f"},${f"$i50%.2f"},${f"$i500%.2f"}],""" +
      s""""delta_sec":[${f"${mn(d5a, d5b)}%.2f"},${f"${mn(d50a, d50b)}%.2f"},${f"${mn(d500a, d500b)}%.2f"}],""" +
      s""""delta_ratio_10x_corpus":${f"${mn(d50a, d50b) / mn(d5a, d5b)}%.2f"},""" +
      s""""delta_ratio_100x_corpus":${f"${mn(d500a, d500b) / mn(d5a, d5b)}%.2f"},""" +
      s""""init_ratio_100x_corpus":${f"${i500 / i5}%.2f"}}""")
    spark.stop()
  }
}

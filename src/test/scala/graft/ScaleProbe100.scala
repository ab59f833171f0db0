package graft

import org.apache.spark.sql.functions._

/** The 100× scaling datapoint (round-7 item 4): r6's probe stops at 10×,
  * so the 100 TB claim rested on one decade of extrapolation. This probe
  * answers two DIFFERENT 100× questions:
  *
  * 1. "Same statistics, 100× volume" — the actual extrapolation gap.
  *    Corpora at 5k / 50k / 500k docs with the shingle UNIVERSE scaled
  *    with the corpus (vocab ∝ N^(1/3): 31 / 67 / 144 words), holding
  *    docs-per-hot-shingle at the fixture's value (see
  *    [[ScaleProbe.synthCorpus]]'s vocabSize doc for why a fixed vocab
  *    is a regime change, not scaling). Per-decade wall-clock ratios
  *    staying ~10× or below at BOTH decades means candidate generation
  *    and verification stay linear in the corpus.
  *
  * 2. "Template flood" — the degenerate regime a fixed 31-word vocab at
  *    500k docs produces BY CONSTRUCTION: the 30k-trigram universe
  *    saturates, ~950-doc band buckets appear, and uncapped candidate
  *    generation measures 121.6M pairs whose verification join spills
  *    past 80 GB (the round-7 probe's original DNF). The
  *    `graft.dedup.maxBucketSize` knob is the production answer; this
  *    entry MEASURES it: candidate count + candidate-generation time at
  *    cap 1000 (the default — admits the ~950-doc flood buckets) vs cap
  *    200 (flood guard engaged), plus d15 end-to-end under the guard.
  *
  * For the ANN/kNN family the hazard is cell population, so the probe
  * applies the scaled-cell rule the d32 docstring names (cells ∝ N,
  * ~250 vectors/cell) and measures knnEdges at 2k/8c → 50k/200c: the
  * 25× corpus should cost ~25× (linear), not 625× (quadratic).
  *
  * Run: sbt 'Test/runMain graft.ScaleProbe100'; the JSON line is copied
  * into BENCH_SCALE_r07.json and summarized in SURVEY §6.
  */
object ScaleProbe100 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe-100x")

    val sf01 = "/root/testdata/sf0.1"
    // vocab ∝ N^(1/3): 5k/31 (the fixture itself) → 50k/67 → 500k/144
    val dir50k = ScaleProbe.synthCorpus(spark, 50000L, 20000L,
      "graft_sp100_50k", parts = 8, vocabSize = 67)
    val dir500k = ScaleProbe.synthCorpus(spark, 500000L, 50000L,
      "graft_sp100_500k", parts = 32, vocabSize = 144)

    val names = Seq("d08_dedup_groups", "d15_verified_dedup_groups",
      "d22_exact_substring",
      // round-7 curation batch: both are corpus-digest pipelines whose
      // 100× behavior the 10× probe alone can't pin
      "d38_segment_dedup", "t25_dsir_importance",
      // session-4: the Gopher battery (5 gram families — the heaviest
      // new census) and the contamination fraction (distinct-13-gram
      // census + broadcast probe)
      "t35_gopher_repetition", "d42_contamination_fraction",
      // session-5: soft weights (the d44/d15 pipeline + census) and span
      // removal (d22's detection + the interval-merge/rebuild tail)
      "d49_soft_dedup_weights", "d50_span_removal",
      // session-6: the dHash banded pair join — band-bucket population
      // is its quadratic hazard, and only a second decade shows whether
      // the 8-bit-per-band pixel statistics hold it flat
      "m10_perceptual_hash_dedup")
    // optional arg: comma-separated subset — incremental decade runs for
    // new ops; the flood/knn sections are skipped in subset mode.
    val onlyFilter = args.headOption.map(_.split(',').toSet)
    val selected = onlyFilter.fold(names)(f => names.filter(f))
    // JIT/codegen warm at the smallest SF (Bench methodology)
    selected.foreach(nm =>
      SparkEntry.queries(nm)(spark, "/root/testdata/sf0.001").count())

    def time(nm: String, d: String): (Double, Long) = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(nm)(spark, d).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (ts.map(_._1).min, ts.head._2)
    }
    val entries = selected.map { nm =>
      val (t5k, r5k) = time(nm, sf01)
      val (t50k, r50k) = time(nm, dir50k)
      val (t500k, r500k) = time(nm, dir500k)
      println(s"== $nm done: $t5k / $t50k / $t500k s")
      s""""$nm":{"sec_5k":${f"$t5k%.2f"},"sec_50k":${f"$t50k%.2f"},""" +
        s""""sec_500k":${f"$t500k%.2f"},""" +
        s""""ratio_decade1":${f"${t50k / t5k}%.2f"},""" +
        s""""ratio_decade2":${f"${t500k / t50k}%.2f"},""" +
        s""""rows_5k":$r5k,"rows_50k":$r50k,"rows_500k":$r500k}"""
    }

    val tail = if (onlyFilter.isDefined) "" else {
      // template-flood knob on the FIXED-vocab 500k corpus (saturated
      // 30k-shingle universe). Candidate GENERATION only at the default
      // cap — the verification join on its 121M pairs is the measured
      // 80 GB DNF, deliberately not re-run — then the full d15 under the
      // flood guard.
      val dirFlood = ScaleProbe.synthCorpus(spark, 500000L, 1000L,
        "graft_sp100_flood", parts = 32)
      import graft.ops.Dedup
      def floodCands(cap: Int): (Double, Long) = {
        spark.conf.set("graft.dedup.maxBucketSize", cap.toString)
        try {
          spark.catalog.clearCache(); System.gc()
          val docs = Tables.documents(spark, dirFlood)
          val (buckets, _) = Dedup.lshBucketsAndShingles(
            docs, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
          val t0 = System.nanoTime()
          val n = Dedup.candidatePairs(buckets, materialize = false).count()
          ((System.nanoTime() - t0) / 1e9, n)
        } finally spark.conf.unset("graft.dedup.maxBucketSize")
      }
      val (tCapDef, nCapDef) = floodCands(1000)
      val (tCap200, nCap200) = floodCands(200)
      spark.conf.set("graft.dedup.maxBucketSize", "200")
      val (tFloodD15, rFloodD15) =
        try time("d15_verified_dedup_groups", dirFlood)
        finally spark.conf.unset("graft.dedup.maxBucketSize")
      println(s"== flood done: cands $nCapDef@1000 / $nCap200@200, d15 $tFloodD15 s")
      val floodEntry =
        s""""flood_bucket_cap_knob":{"docs":500000,"vocab":31,""" +
          s""""cands_cap1000":$nCapDef,"sec_cands_cap1000":${f"$tCapDef%.2f"},""" +
          s""""cands_cap200":$nCap200,"sec_cands_cap200":${f"$tCap200%.2f"},""" +
          s""""d15_sec_cap200":${f"$tFloodD15%.2f"},"d15_rows_cap200":$rFloodD15,""" +
          s""""verification_at_cap1000":"DNF >80GB spill (measured round 7)"}"""

      // kNN at 25× vectors under the scaled-cell rule (constant ~250
      // vectors/cell): linear scale path = time ratio ≈ corpus ratio
      def knnTime(d: String, cells: Int): Double = {
        val e = Dedup.reuse(Tables.embeddings(spark, d)
          .select(col("vec_id"), graft.ops.Similarity.quantize(col("embedding")).as("v"))
          .withColumn("n2", graft.ops.Similarity.norm2Q(col("v"))))
        val ts = (1 to 2).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          graft.ops.Similarity.knnEdges(e, cells, 3).count()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      val knn2k = knnTime(sf01, 8)
      val knn50k = knnTime(dir500k, 200)
      val knnEntry =
        s""""knn_scaled_cells_25x":{"sec_2k_8c":${f"$knn2k%.2f"},""" +
          s""""sec_50k_200c":${f"$knn50k%.2f"},""" +
          s""""ratio":${f"${knn50k / knn2k}%.2f"},"linear_would_be":25.00}"""
      "," + floodEntry + "," + knnEntry
    }

    println(s"""{"metric":"scale_100x","docs":[5000,50000,500000],""" +
      """"vocab":[31,67,144],""" +
      entries.mkString("\"queries\":{", ",", "}") + tail + "}")
    spark.stop()
  }
}

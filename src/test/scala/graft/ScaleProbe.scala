package graft

import org.apache.spark.sql.functions._

/** One scaling datapoint beyond sf0.1 (round-6 item 8): synthesizes an
  * sf1-EQUIVALENT documents corpus (50,000 docs — 10× sf0.1) with the
  * fixture's measured statistics — the same 31-word vocabulary, 10-100
  * token uniform lengths, 20 sources, and the same 0.16% exact-duplicate
  * rate — deterministically from md5 (no RNG), then times the three
  * heaviest dedup pipelines at 5k and 50k docs. Near-linear growth here
  * means no hidden candidate-pair blowup: LSH bucket population is the
  * quadratic hazard, and it is driven by the vocabulary/length profile
  * this generator reproduces.
  *
  * Run: sbt 'Test/runMain graft.ScaleProbe'; the JSON line is copied into
  * BENCH_SCALE_r06.json and summarized in SURVEY §6.
  */
object ScaleProbe {

  /** md5-derived positive long — the probe's deterministic "RNG". */
  def h(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(seed), 1, 7), 16, 10).cast("long")

  /** Synthesize an n-doc corpus (+ nVecs embeddings) with the sf0.1
    * fixture's measured statistics — same 31-word base vocabulary, 10-100
    * token uniform lengths, 20 sources, 0.16% exact-duplicate rate,
    * 64-dim ±0.575 uniform embeddings with 10 labels — deterministically
    * from md5 (no RNG). Returns the directory, laid out like a testdata
    * SF dir so every `queries()` entry runs against it unchanged.
    *
    * `vocabSize` (default: the fixture's 31) extends the vocabulary with
    * deterministic synthetic tokens. This matters for scale probes: the
    * fixture's 3-gram universe is vocab³ ≈ 30k, so holding vocab FIXED
    * while scaling docs 100× saturates the universe — the probability a
    * doc contains the globally-minimal-hash shingle (≈ positions/vocab³)
    * grows 100×, minhash band buckets inflate to ~1000 docs, and
    * candidate pairs go quadratic (measured: 121.6M pairs at 500k docs —
    * a DUPLICATION-DENSITY regime change, not volume scaling). Scaling
    * vocab ∝ nDocs^(1/3) holds docs-per-hot-shingle at the fixture's
    * value, which is the "same statistics, more volume" question a scale
    * probe is asking. The fixed-vocab regime is still valuable as a
    * template-flood stress test — see the bucket-cap knob in
    * [[ScaleProbe100]]. */
  def synthCorpus(spark: org.apache.spark.sql.SparkSession, nDocs: Long,
      nVecs: Long, dirName: String, parts: Int, vocabSize: Int = 31): String = {
    import spark.implicits._
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().as[String].collect().sorted.toSeq
    require(base.size == 31, s"vocab drifted: ${base.size}")
    require(vocabSize >= base.size, s"vocabSize $vocabSize < fixture ${base.size}")
    val vocab = base ++ (base.size until vocabSize).map(i => f"tok$i%04d")
    val vlit = typedLit(vocab)
    val docs = spark.range(nDocs)
      .withColumn("eid",
        when(col("id") % 625 === 624, col("id") - 1).otherwise(col("id")))
      .withColumn("n_tok", (h(concat(col("eid"), lit("|n"))) % 91 + 10).cast("int"))
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), col("n_tok")),
          j => element_at(vlit,
            (h(concat(col("eid"), lit("|"), j)) % vocabSize + 1).cast("int")))).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), col("id") % 20).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = Scratch.dir(dirName)
    docs.repartition(parts).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          j => ((h(concat(col("id"), lit("|e"), j)) % 1150001 - 575000) / 1e6)
            .cast("float")).as("embedding"),
        (col("id") % 10).cast("int").as("label"))
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-scale-probe")

    val sf01 = "/root/testdata/sf0.1"
    // 10× docs; 10× embeddings (20,000 vectors vs sf0.1's 2,000) cover
    // the clustering/ANN family (d24 k-means, d26 PQ funnel) whose
    // quadratic hazard is cell/candidate population, not LSH buckets.
    val n = 50000L
    val dir = synthCorpus(spark, n, 20000L, "graft_sf1_docs", parts = 8)

    val names = Seq("d08_dedup_groups", "d11_simhash_dedup", "d15_verified_dedup_groups",
      "m05_media_near_dup", "d24_kmeans", "d26_pq_recall",
      // session-3 additions: the kNN graph (cell-population hazard),
      // novelty (gram-census join), and PageRank (iterative joins over
      // the verified-pair graph)
      "d32_knn_graph", "t23_novelty", "d34_pagerank",
      // round-7 curation batch: the two corpus-digest ops (segment
      // census + bigram census/scoring) and the dPS-ranked bucketing,
      // whose hazard is the single-language sort at fixed lang count
      "d38_segment_dedup", "t25_dsir_importance", "t26_perplexity_buckets",
      // round-7 session-2: frame-set dedup (payload-derived digest) and
      // the cluster-keyed split (d15's full pipeline + the split join)
      "m07_media_frame_dedup", "t28_leakage_free_split",
      // round-7 session-3: the bigram-LM trainer/scorer (census-table
      // math + one stream join) and BPE segmentation (word-type loop;
      // its cost should be ~flat in corpus size once the census exists)
      "t29_bigram_lm", "t31_bpe_segment",
      // round-7 session-4: the Gopher battery (5 tagged gram families in
      // one explode — the heaviest new census), char entropy (alphabet-
      // bounded agg), the unigram-LM EM (type-table loop, ~flat once the
      // census exists), source KL (vocab-bounded after the census), and
      // the triangle census (wedge fan-out is the quadratic hazard the
      // degree orientation bounds)
      "t35_gopher_repetition", "t33_char_entropy", "t37_unigram_segment",
      "t38_source_divergence", "d41_dup_graph_triangles",
      // round-7 session-5: URL dedup (string-normalize + hash agg),
      // mojibake repair (regex-scan cost), train order (shard-bounded
      // windows over 2× corpus rows), priority sample (TakeOrdered),
      // and the dedup-rate estimator (two distinct-aggs) — all designed
      // linear; the probe checks none hides a super-linear stage.
      // (d45 is EXCLUDED deliberately: its %37 benchmark rule scales the
      // benchmark with the synthetic corpus, so a probe ratio would
      // measure the parameterization, not the fixed-benchmark design.)
      "d46_url_dedup", "t40_mojibake_repair", "t43_train_order",
      "t44_priority_sample", "d47_dedup_rate_estimate",
      // d49 soft weights = the full d44/d15 pipeline + a component
      // census; d48 is excluded for d45's reason — its %7 benchmark
      // grows with the synthetic corpus, so a ratio would measure the
      // parameterization, not the fixed-benchmark design.
      "d49_soft_dedup_weights",
      // d50 span removal = d22's detection + the interval-merge/rebuild
      // tail (touches only affected docs)
      "d50_span_removal",
      // round-7 session-6: the dHash banded pair join (m10 — band-bucket
      // population is the quadratic hazard, capped like d03/d11), the
      // lexical/kappa censuses (t48/t49 — designed-linear one-scan aggs),
      // the snapshot delta (d51 — id/hash-only full-outer join), and the
      // cluster-quality contingency (d52 — d24's assignment + a k×L agg).
      // q76 is EXCLUDED (needs the events fixture the synth corpus lacks;
      // its day-cell population is bounded by construction), x14/x15
      // (connector scale is an option knob / a write of the input, not a
      // corpus-driven cost), src12/q74 (orders/nation fixtures), s26
      // (streaming — covered by the state-bound specs).
      "m10_perceptual_hash_dedup", "t48_lexical_diversity",
      "t49_gate_agreement", "d51_snapshot_delta", "d52_cluster_quality",
      // session-6 batch 2: index maintenance (the append write is the
      // cost under test — it must scale with the batch, not the corpus)
      // and the normalization census (map-side regex + NFC per doc)
      "d53_index_update", "t50_unicode_normalize",
      // session-6 closing evals: the lang-id audit (two tiny censuses)
      // and the mutation curve (5x the corpus shingle digest, linear)
      "t51_langid_eval", "t52_mutation_sensitivity")
      // d54 prefix filter is EXCLUDED (measured, not guessed): this
      // generator draws shingles ~uniformly, so at 50k docs every
      // 3-gram type sits in ~163 docs and NO shingle is rare — the
      // rarity skew prefix filtering exploits (real text is Zipfian;
      // t32 measures the fixture's fit) is absent by construction, the
      // candidate stage goes quadratic (OOM at 50k) while the TRUE
      // J≥0.5 result stays tiny. The probe would measure the synthetic
      // corpus's uniformity, not the operator; d54's scale story is the
      // docstring's precondition plus the sf0.1 fixture timing.
    // optional arg: comma-separated subset — incremental probe runs
    // (new-session ops only) merge into the recorded JSON without
    // re-timing the whole battery; the kNN knob section is skipped too.
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
      val (t50k, r50k) = time(nm, dir)
      val ratio = t50k / t5k
      s""""$nm":{"sec_5k":${f"$t5k%.2f"},"sec_50k":${f"$t50k%.2f"},""" +
        s""""ratio":${f"$ratio%.2f"},"rows_5k":$r5k,"rows_50k":$r50k}"""
    }
    // the kNN-graph cell knob, measured: at FIXED 8 cells a 10× corpus
    // grows in-cell pair work 100× (quadratic); growing cells WITH the
    // corpus (80) keeps cell population constant → pair work 10× (the
    // linear scale path the d32 docstring names). Times via knnEdges
    // directly — d32's oracle pins 8 cells, the knob is the helper's.
    def knnTime(d: String, cells: Int): Double = {
      val e = graft.ops.Dedup.reuse(Tables.embeddings(spark, d)
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
    val knnEntry = if (onlyFilter.isDefined) "" else {
      val knn2k8 = knnTime(sf01, 8)
      val knn20k8 = knnTime(dir, 8)
      val knn20k80 = knnTime(dir, 80)
      "," +
        s""""knn_cells_knob":{"sec_2k_8c":${f"$knn2k8%.2f"},""" +
        s""""sec_20k_8c":${f"$knn20k8%.2f"},"sec_20k_80c":${f"$knn20k80%.2f"},""" +
        s""""ratio_fixed_cells":${f"${knn20k8 / knn2k8}%.2f"},""" +
        s""""ratio_scaled_cells":${f"${knn20k80 / knn2k8}%.2f"}}"""
    }
    println(s"""{"metric":"scale_10x","docs_small":5000,"docs_large":$n,""" +
      entries.mkString("\"queries\":{", ",", "}") + knnEntry + "}")
    spark.stop()
  }
}

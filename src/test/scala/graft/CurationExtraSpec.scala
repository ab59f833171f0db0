package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** Invariant specs for the round-7 session-5 curation batch:
  * d45 semantic decontamination, d46 URL dedup, t40 mojibake repair,
  * t43 deterministic train order, m08 media metadata census. The oracle
  * compare (tools/check.py / the driver) pins exact values; these specs
  * pin the claims the oracle can't see — plan shape, determinism,
  * construction-level invariants. */
class CurationExtraSpec extends SparkTestBase {

  private def collectShuffles(plan: SparkPlan): Seq[ShuffleExchangeExec] = {
    // traverse INTO AQE query stages and reused exchanges — a plain
    // .collect stops at QueryStageExec leaves and would make the
    // no-column-crosses-a-shuffle assertions vacuous
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => Nil
      })).flatMap(nodes)
    nodes(plan).collect { case s: ShuffleExchangeExec => s }
  }

  test("d45: every benchmark member is flagged as its own leak (cos ~ 1, " +
    "bench_id = itself) and clean corpus vectors stay below tau with a " +
    "genuinely different nearest benchmark") {
    val rows = SparkEntry.queries("d45_semantic_decontaminate")(spark, sf0001).collect()
    val (bench, rest) = rows.partition(r => r.getLong(0) % 37 == 0)
    assert(bench.nonEmpty && rest.nonEmpty)
    bench.foreach { r =>
      assert(r.getBoolean(3), s"benchmark member ${r.getLong(0)} not flagged")
      assert(r.getLong(1) == r.getLong(0), "self must be the argmax benchmark")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
    rest.foreach { r =>
      assert(!r.getBoolean(3), s"clean vector ${r.getLong(0)} falsely flagged")
      assert(r.getLong(1) != r.getLong(0))
      assert(r.getDouble(2) < 0.95)
    }
  }

  test("d45: the corpus-side plan never shuffles the 64-wide vectors — the " +
    "benchmark side broadcasts and only id/cos rows reach an exchange") {
    val df = SparkEntry.queries("d45_semantic_decontaminate")(spark, sf0001)
    df.collect() // materialize so AQE finalizes the executed plan
    val ex = collectShuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected at least the argmax exchange — probe is vacuous")
    ex.foreach { e =>
      val fields = e.child.schema.fieldNames.toSet
      assert(!fields.contains("v") && !fields.contains("bv"),
        s"vector column crossed a shuffle: ${fields.mkString(",")}")
    }
  }

  test("d46: canonicalization collapses all four planted variant kinds — " +
    "each dup group's members differ only in case/slash/tracking/fragment, " +
    "and the keeper is the minimum doc_id of its group") {
    val groups = SparkEntry.queries("d46_url_dedup")(spark, sf0001).collect()
    assert(groups.exists(_.getLong(2) > 1), "fixture must produce dup groups")
    // groups partition the corpus exactly once
    val total = Tables.documents(spark, sf0001).count()
    assert(groups.map(_.getLong(2)).sum == total)
    // canonical urls carry none of the stripped artifacts
    groups.foreach { g =>
      val cu = g.getString(0)
      assert(!cu.contains("#") && !cu.contains("utm_") && !cu.endsWith("/"),
        s"uncanonical survivor: $cu")
      assert(cu == cu.toLowerCase)
    }
    // meaningful query strings survive as their own canonicals
    assert(groups.exists(_.getString(0).contains("?ref=home")),
      "non-tracking params must NOT be stripped")
  }

  test("d46: canonicalization is idempotent — canonical(canonical(u)) == " +
    "canonical(u) over every fixture URL (a frontier requeueing an " +
    "already-canonical URL must not mutate it again)") {
    import org.apache.spark.sql.functions.col
    val urls = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.ops.CurationExtra.synthUrl.as("url"))
      .withColumn("c1", graft.ops.CurationExtra.canonicalUrl(col("url")))
      .withColumn("c2", graft.ops.CurationExtra.canonicalUrl(col("c1")))
    assert(urls.filter(col("c1") =!= col("c2")).count() == 0,
      "canonicalization not idempotent")
  }

  test("t40: planted corruption classes are detected, clean docs are not, " +
    "and repair removes every marker") {
    val rows = SparkEntry.queries("t40_mojibake_repair")(spark, sf0001).collect()
    rows.foreach { r =>
      val id = r.getLong(0); val marks = r.getLong(1)
      val flagged = r.getBoolean(2); val gone = r.getBoolean(4)
      assert(gone, s"doc $id still carries mojibake after repair")
      if (id % 5 >= 2) assert(!flagged && marks == 0, s"clean doc $id flagged")
      if (id % 5 == 1) assert(flagged && marks == 1, s"suffix class doc $id: $marks marks")
    }
    // class A (every 'a' double-encoded) should usually dominate class B
    val aMarks = rows.filter(_.getLong(0) % 5 == 0).map(_.getLong(1))
    assert(aMarks.exists(_ > 1), "class-A corruption should plant many markers")
  }

  test("t43: the order is a permutation per epoch, reproducible across " +
    "runs, different across epochs, and positions are dense per shard") {
    val a = SparkEntry.queries("t43_train_order")(spark, sf0001).collect()
    val b = SparkEntry.queries("t43_train_order")(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "train order must be bit-reproducible")
    val total = Tables.documents(spark, sf0001).count()
    val byEpoch = a.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).distinct.length == total.toInt,
        "each epoch must emit every doc exactly once")
      rows.groupBy(_.getLong(1)).values.foreach { shardRows =>
        val pos = shardRows.map(_.getLong(2)).sorted
        assert(pos.head == 1L && pos.last == pos.length.toLong,
          "positions must be dense 1..n within a shard")
      }
    }
    val order0 = byEpoch(0L).sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(3)).toSeq
    val order1 = byEpoch(1L).sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(3)).toSeq
    assert(order0 != order1, "epochs must reshuffle")
  }

  test("t44: the priority sample is weight-biased, reproducible, and its " +
    "tau-estimator reconstructs the corpus total weight to within 2x") {
    val a = SparkEntry.queries("t44_priority_sample")(spark, sf0001).collect()
    val b = SparkEntry.queries("t44_priority_sample")(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "sample must be deterministic")
    assert(a.length == 50)
    a.foreach { r =>
      assert(r.getDouble(4) >= r.getLong(2).toDouble - 1e-9,
        "est_weight = max(w, tau) can never fall below the raw weight")
    }
    val docs = Tables.documents(spark, sf0001)
    val totalW = docs.agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    val est = a.map(_.getDouble(4)).sum
    assert(est > totalW * 0.5 && est < totalW * 2.0,
      s"priority-sampling estimator off: est $est vs true $totalW")
    // weight bias: sampled docs should be longer than average on this fixture
    val meanAll = totalW.toDouble / docs.count()
    val meanSample = a.map(_.getLong(2)).sum.toDouble / a.length
    assert(meanSample > meanAll, s"sample mean $meanSample <= corpus mean $meanAll")
  }

  test("t45: the census partitions the corpus, the Wilson bound never " +
    "exceeds the point estimate, and the gate exercises both verdicts") {
    val rows = SparkEntry.queries("t45_source_quality_gate")(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, s"wilson above p: $r")
      assert(r.getDouble(4) >= 0.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)),
      "fixture must exercise both keep and drop verdicts")
  }

  test("d47: content-keyed sampling keeps dup clusters atomic — the " +
    "estimate lands near the exact rate, while an id-keyed control sample " +
    "of the same corpus would understate it") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("d47_dedup_rate_estimate")(spark, sf0001).head()
    val (exact, est, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(exact > 0.05, "planted template flood must create real dups")
    assert(math.abs(math.abs(exact - est) - err) < 1e-9)
    assert(err < 0.15, s"estimator err $err too large for a 1/4 sample")
    // control: the same estimator with an ID-keyed sample shatters
    // clusters and biases low — demonstrating why content keying matters
    val h = Tables.documents(spark, sf0001).select(col("doc_id"),
      md5(when(col("doc_id") % 7 === 3,
          concat(lit("TPL-"), expr("doc_id div 70").cast("string")))
        .otherwise(col("text"))).as("hx"))
    val idSample = h.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 4 === 0)
    val n = idSample.count().toDouble
    val dct = idSample.select(countDistinct(col("hx"))).head().getLong(0).toDouble
    val idEst = 1.0 - dct / n
    assert(idEst < exact, s"id-keyed sample should understate: $idEst vs $exact")
  }

  test("t46: semi/anti routes partition the host census without overlap, " +
    "the denylist hits exactly its three hosts, and both verdict joins " +
    "broadcast the blocklist side") {
    val df = SparkEntry.queries("t46_host_blocklist")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == rows.map(_.getString(0)).distinct.length, "host overlap")
    assert(rows.count(_.getBoolean(2)) == 3)
    assert(rows.map(_.getString(0)).toSet.contains("src3.example.com"))
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "blocklist joins must broadcast")
  }

  test("s25: the streaming frontier absorbs double discovery — every URL " +
    "arrives twice yet the frontier size equals d46's batch canonical count") {
    val frontier = SparkEntry.queries("s25_stream_url_frontier")(spark, sf0001).collect()
    val batchGroups = SparkEntry.queries("d46_url_dedup")(spark, sf0001).count()
    assert(frontier.map(_.getLong(1)).sum == batchGroups,
      "stream frontier diverged from the batch canonical-URL universe")
    assert(frontier.length == 20, "one row per host expected on the fixture")
  }

  test("d48: exposure report is internally coherent, agrees with d13's " +
    "verdict direction, and no raw gram text ever crosses a shuffle") {
    val rows = SparkEntry.queries("d48_benchmark_exposure")(spark, sf0001).collect()
    val benchCount = Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0).count()
    assert(rows.length == benchCount.toInt, "one row per benchmark item")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"grams hit > grams: $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getBoolean(5) == (r.getLong(3) > 0), s"flag incoherent: $r")
    }
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)),
      "fixture must exercise both exposed and clean benchmark items")
    // direction-consistency with d13: corpus-side contamination exists
    // iff some benchmark item is exposed (same join, two readings)
    val d13 = SparkEntry.queries("d13_ngram_decontaminate")(spark, sf0001).collect()
    val corpusContaminated = d13.filter(_.getBoolean(0)).map(_.getLong(1)).sum
    assert((corpusContaminated > 0) == rows.exists(_.getBoolean(5)))
    val df = SparkEntry.queries("d48_benchmark_exposure")(spark, sf0001)
    df.collect()
    val ex = collectShuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected distinct/agg exchanges — probe is vacuous")
    ex.foreach { e =>
      val fields = e.child.schema.fieldNames.toSet
      assert(!fields.contains("g") && !fields.contains("text") && !fields.contains("ws"),
        s"raw gram/text crossed a shuffle: ${fields.mkString(",")}")
    }
  }

  test("d49: soft weights conserve gradient mass — every doc weighted, " +
    "each cluster sums to one unit, and the total equals d44's kept count") {
    val rows = SparkEntry.queries("d49_soft_dedup_weights")(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.length == total.toInt, "every doc must get a weight")
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      assert(members.forall(_.getLong(2) == members.length.toLong),
        s"cluster $cid size field inconsistent with membership")
      assert(math.abs(members.map(_.getDouble(3)).sum - 1.0) < 1e-3,
        s"cluster $cid weights do not sum to one unit")
    }
    // Σ weights == #content-units == d44's kept-doc count (one canonical
    // survivor per cluster) — the two policies price the same structure
    val d44 = SparkEntry.queries("d44_effective_size")(spark, sf0001).head()
    val kept = d44.getLong(2)
    assert(math.abs(rows.map(_.getDouble(3)).sum - kept.toDouble) < 0.01,
      s"gradient mass ${rows.map(_.getDouble(3)).sum} != content units $kept")
    assert(rows.exists(_.getLong(2) > 1), "fixture must contain real clusters")
  }

  test("m09: packing conserves tokens and images, sequences respect the " +
    "budget envelope, and the fill factor is coherent with its own counts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("m09_interleaved_packing")(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
    val expect = docs.select(
        (size(split(col("text"), " ")).cast("long") + (col("doc_id") % 4) * 576).as("eff"),
        (col("doc_id") % 4).as("img"))
      .agg(sum("eff"), sum("img")).head()
    assert(rows.map(_.getLong(2)).sum == expect.getLong(0), "effective tokens not conserved")
    assert(rows.map(_.getLong(3)).sum == expect.getLong(1), "images not conserved")
    rows.foreach { r =>
      // a sequence can exceed the budget only by the straddling doc — at
      // most one doc's effective size (≤ max tokens + 3*576) past 8192
      assert(r.getLong(4) < 8192 + 2000, s"runaway sequence: $r")
      val fill = r.getLong(2).toDouble / (r.getLong(1) * 8192)
      assert(math.abs(fill - r.getDouble(5)) < 1e-3, s"fill incoherent: $r")
    }
  }

  test("d50: span removal agrees with d22's detection — the affected set " +
    "is exactly the higher-id side of d22's pairs, every removal is at " +
    "least the 20-token threshold, and full removals hash to md5('')") {
    val removed = SparkEntry.queries("d50_span_removal")(spark, sf0001).collect()
    val d22 = SparkEntry.queries("d22_exact_substring")(spark, sf0001).collect()
    val expectedAffected = d22.map(_.getLong(1)).toSet // id_b of each pair
    assert(removed.map(_.getLong(0)).toSet == expectedAffected,
      "affected docs != d22's higher-id pair members")
    removed.foreach { r =>
      val (before, rm, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rm >= 20, s"removal below the island threshold: $r")
      assert(after == before - rm && after >= 0, s"count arithmetic broken: $r")
      if (after == 0)
        assert(r.getString(4) == "d41d8cd98f00b204e9800998ecf8427e",
          s"empty doc must hash md5(''): $r")
    }
    assert(removed.exists(_.getLong(3) == 0) && removed.exists(_.getLong(3) > 0),
      "fixture should exercise both partial and full removals")
  }

  test("t47: the quality operating curve is monotone non-increasing in " +
    "tau on both axes, agrees with t19's own gate at 0.5, and discriminates") {
    val rows = SparkEntry.queries("t47_quality_tau_sweep")(spark, sf0001).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length == 6)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1), "doc curve must be non-increasing")
      assert(lo.getLong(2) >= hi.getLong(2), "token curve must be non-increasing")
    }
    // the tau = 0.5 point IS t19's kept count — the sweep and the gate
    // must read the same score
    val t19kept = SparkEntry.queries("t19_model_quality")(spark, sf0001)
      .collect().count(_.getBoolean(3)).toLong
    assert(rows.find(_.getDouble(0) == 0.5).get.getLong(1) == t19kept,
      "sweep@0.5 diverged from t19's own gate")
    assert(rows.head.getLong(1) > rows.last.getLong(1),
      "curve must discriminate across the tau range")
  }

  test("session-5 ops are partition-count invariant: identical rows under " +
    "different shuffle partition counts (fleet retry/speculation contract)") {
    // t43/t44 rank through windows and a global TakeOrdered — exactly
    // where placement-dependence would bite; d45–d47/t45/t46 cover the
    // argmax, hash-agg, and semi/anti join shapes.
    for (nm <- Seq("d45_semantic_decontaminate", "d46_url_dedup",
        "t43_train_order", "t44_priority_sample", "t45_source_quality_gate",
        "d47_dedup_rate_estimate", "t46_host_blocklist")) {
      val runs = Seq("4", "7").map { parts =>
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try SparkEntry.queries(nm)(spark, sf0001).collect().toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(runs(0) == runs(1), s"$nm output depends on the partition count")
      assert(runs(0).nonEmpty, s"$nm trivially empty at sf0.001")
    }
  }

  test("m08: verdicts partition the corpus, every verdict kind occurs, and " +
    "each census row's verdict is consistent with its own reconstruction") {
    val rows = SparkEntry.queries("m08_media_quality_census")(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total)
    val kinds = rows.map(_.getString(1)).toSet
    assert(kinds == Set("kept", "too_small", "bad_aspect", "too_long"),
      s"fixture must exercise all gates, got $kinds")
    // the decision must be payload-free: census cost is independent of text
    // size, so the plan reads only (doc_id, source) from the scan
    val df = SparkEntry.queries("m08_media_quality_census")(spark, sf0001)
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      })).flatMap(allNodes)
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(!_.schema.fieldNames.contains("text")),
      "m08 must never read the payload/text column")
  }
}

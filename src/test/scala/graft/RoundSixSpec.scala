package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-6 items: the t12 scale repair (distributed two-phase prefix sum
  * replacing the one-task-per-source window) pinned by both an agreement
  * spec and plan evidence. */
class RoundSixSpec extends SparkTestBase {
  import spark.implicits._

  /** Every node of an executed plan, descending through AQE wrappers and
    * materialized query stages (collect() alone stops at both). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p.children ++ (p match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(ad.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Nil
    })).flatMap(allNodes)

  test("distributedPrefixSum equals the window prefix sum exactly " +
    "(single huge source, many partitions)") {
    // one source — the shape that collapses Window.partitionBy(source)
    // to a single task — with irregular values
    val df = spark.range(10000)
      .select($"id", lit("web").as("src"), ($"id" % 97 + 1).as("v"))
    val got = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("distributedPrefixSum: multi-group boundaries inside a partition " +
    "and empty-group edge behave exactly") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 5L), ("b", 2L, 7L)).toDF("src", "id", "v")
    val got = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      .select($"src", $"id", $"cum").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", 1L) -> 10L, ("a", 2L) -> 30L, ("a", 3L) -> 60L,
      ("b", 1L) -> 5L, ("b", 2L) -> 12L))
  }

  test("t12 scale contract: the data-stream window partitions on " +
    "(partition_id, source) — parallelism is the partition count, not " +
    "the source count") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = spark.range(10000)
        .select($"id", lit("web").as("src"), ($"id" % 7 + 1).as("v"))
      val res = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      val wins = castToImpl(res).queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty, "expected window nodes in the prefix-sum plan")
      // the row-stream window must key on TWO expressions (pid, group):
      // thousands of small window partitions, never one-per-source
      val dataWins = wins.filter(_.partitionSpec.size == 2)
      assert(dataWins.nonEmpty,
        s"no (partition_id, group) window found:\n${wins.map(_.partitionSpec)}")
      // the pid column is materialized (persisted) before the window, so
      // the key shows as the `_pid` attribute, not SPARK_PARTITION_ID()
      assert(dataWins.exists(_.partitionSpec.exists(
        _.toString.contains("_pid"))),
        s"data window does not key on the partition id:\n${dataWins.map(_.partitionSpec)}")
      // any single-key window must sit on the AGGREGATED subtotal table
      // (≤ partitions × groups rows), never the raw row stream
      val narrowWins = wins.filter(_.partitionSpec.size == 1)
      narrowWins.foreach { w =>
        val overAgg = w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }.isDefined
        assert(overAgg,
          s"single-key window runs over the raw stream (one task per source):\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("d21: the stored band index is probed straight from its bucketed " +
    "layout — no exchange ever touches the index side") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      // force the shuffled-join path: broadcast would hide whether the
      // bucketed layout satisfies the join's distribution on its own
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val docs = Tables.documents(spark, sf0001)
      val (buckets, _) = graft.ops.Dedup.lshBucketsAndShingles(
        docs, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
      val cand = graft.ops.Dedup.storedIndexCandidates(
        spark, buckets, col("id") % 7 === 3)
      val plan = castToImpl(cand).queryExecution.executedPlan
      // the probe must be a real join (not collapsed away)…
      val join = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(join.isDefined, s"expected a shuffled join against the index:\n$plan")
      // …whose index-side child reaches the join straight from the
      // bucketed scan: no exchange anywhere in that subtree (the
      // new-batch side and the downstream distinct shuffle freely)
      val indexSide = join.get.children
        .filter(_.toString.contains("band_index"))
      assert(indexSide.size == 1, s"index scan not under the probe join:\n$plan")
      val indexExchanges = indexSide.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(indexExchanges.isEmpty,
        s"the stored index side got re-shuffled:\n${indexExchanges.mkString("\n")}")
      // the index scan itself reads the bucketed files
      assert(plan.toString.contains("Bucketed: true") ||
        plan.toString.contains("SelectedBucketsCount"),
        s"index scan is not bucket-aware:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("d22: a planted 30-token verbatim run is recovered exactly; " +
    "sub-threshold and disjoint docs stay unflagged") {
    // doc 1 and doc 2 share EXACTLY tokens c1..c30 (distinct filler on
    // both sides, so junction-spanning grams differ); doc 3 shares a
    // 10-token run with doc 1 (below the 20-token floor); doc 4 disjoint
    val common = (1 to 30).map(i => s"c$i").mkString(" ")
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val mk = (pre: String, n: Int) => (1 to n).map(i => s"$pre$i").mkString(" ")
    val docs = Seq(
      (1L, s"${mk("a", 10)} $common ${mk("z", 10)} $short", "en", "web", 0L),
      (2L, s"${mk("b", 5)} $common ${mk("y", 10)}", "en", "web", 0L),
      (3L, s"${mk("d", 12)} $short ${mk("e", 12)}", "en", "web", 0L),
      (4L, mk("f", 40), "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("d22fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d22_exact_substring")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    // run of 23 consecutive grams ⇒ 23 + 7 = 30 tokens; the 10-token
    // shared run yields 3-gram-long runs (10 − 8 + 1), i.e. 10 tokens —
    // below the 20-token report floor
    assert(got == List((1L, 2L, 23L, 30L)),
      s"expected exactly the planted (1,2) overlap, got $got")
  }

  test("s15: inside the stream, the ARRIVAL batch broadcasts and the " +
    "corpus index side never does") {
    graft.streaming.StreamingQueries.s15ProbeBroadcasts = Nil
    val rows = SparkEntry.queries("s15_stream_ann_ingest")(spark, sf0001).collect()
    assert(rows.nonEmpty, "stream produced no neighbors")
    val bcasts = graft.streaming.StreamingQueries.s15ProbeBroadcasts
    assert(bcasts.nonEmpty, "no broadcast exchange recorded in the probe plan")
    // every broadcast carries the probe-side columns, never the corpus's
    assert(bcasts.forall(cols => cols.contains("qid") && !cols.contains("cid")),
      s"corpus side got broadcast: $bcasts")
  }

  test("t13: the hot stopword rides the broadcast path and the tail " +
    "exchange stays balanced (AQE cannot split this join shape — the " +
    "frequency side's final aggregate sits above its shuffle, so " +
    "OptimizeSkewedJoin's bare-shuffle-children pattern never matches)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // kill auto-broadcast so the ONLY broadcasts are the explicit
      // hot-set/total hints — at corpus scale freq is corpus-sized
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // every doc is ~99% the stopword 'the' — the classic hot term
      val hotBlock = Array.fill(290)("the").mkString(" ")
      val docs = spark.range(4000).select(
        $"id".as("doc_id"),
        concat_ws(" ", lit(hotBlock), concat(lit("u"), $"id"),
          concat(lit("v"), $"id")).as("text"),
        lit("en").as("lang"), lit("web").as("source"), lit(0L).as("n_chars"))
      val dir = java.nio.file.Files.createTempDirectory("t13skew").toString
      docs.repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val df = SparkEntry.queries("t13_unigram_surprisal")(spark, dir)
      val rows = df.collect() // AQE finalizes only on execution of THIS plan
      assert(rows.length == 4000)
      // hybrid == naive: per-doc surprisal matches the direct formulation
      val tok = spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val freq = tok.groupBy("term").agg(count(lit(1)).as("c"))
      val naive = tok.join(freq, "term")
        .crossJoin(tok.agg(count(lit(1)).as("n")))
        .select($"doc_id",
          round(log($"n".cast("double") / $"c") * 1000000).cast("long").as("q"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum($"q") / count(lit(1)) / 1000000.0, 4).as("avg"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      rows.foreach { r =>
        val (n, avg) = naive(r.getLong(0))
        assert(r.getLong(1) == n && r.getDouble(2) == avg,
          s"hybrid diverged from naive at doc ${r.getLong(0)}")
      }
      // plan evidence: the hot tag join broadcasts a LIMITed set, and the
      // tail exchange no longer carries the hot partition — every shuffle
      // feeding the term join is balanced (max ≤ 4× median; the naive
      // form measured 14× on this fixture)
      val nodes = allNodes(castToImpl(df).queryExecution.executedPlan)
      assert(nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        "hot tag join is not a broadcast join")
      val termStages = nodes.collect {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
            if s.plan.toString.contains("hashpartitioning(term") => s
      }
      assert(termStages.nonEmpty, "no term-keyed exchange found (tail join missing?)")
      termStages.foreach { s =>
        val sizes = s.mapStats.get.bytesByPartitionId.filter(_ > 0).sorted
        val median = math.max(sizes(sizes.length / 2), 1L)
        assert(sizes.last <= 4 * median,
          s"tail exchange still skewed: sizes=${sizes.mkString(",")}")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // --- fixture-coupling invariants: each documented calibration below is
  // --- asserted executable, so a regenerated fixture fails LOUDLY here
  // --- instead of silently degrading the coupled query (e.g. d02's
  // --- subset going empty would still "hash-match" an empty oracle)

  test("fixture invariant (d02): the doc_id<40 exact-Jaccard subset is " +
    "fully populated and produces similar pairs at every SF") {
    for (sf <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val n = Tables.documents(spark, sf).filter($"doc_id" < 40).count()
      assert(n == 40, s"$sf: expected 40 docs below id 40, found $n — " +
        "d02's bounded all-pairs subset drifted")
      val pairs = SparkEntry.queries("d02_ngram_jaccard")(spark, sf).count()
      assert(pairs > 0, s"$sf: d02 subset contains no pairs above jaccard 0.1 " +
        "— the semantics pin is vacuous on this fixture")
    }
  }

  test("fixture invariant (d14): embedding pairs stay in the random-tail " +
    "regime (max cos < 0.7) at every SF — the calibration behind tau=0.45") {
    import graft.ops.Similarity.{dotQ, norm2Q, quantize}
    graft.functions.LongDot.register(spark)
    // measured on the current fixtures: 0.479 / 0.513 / 0.601 — the
    // extreme of ~125k-2M random-Gaussian pairs grows with corpus size
    // but stays far from the ~0.95+ regime of genuine near-duplicates
    for (sf <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, sf)
        .select($"vec_id", quantize($"embedding").as("v"))
        .withColumn("n2", norm2Q($"v"))
      val maxCos = e.as("a")
        .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select((dotQ(col("a.v"), col("b.v"))
          / (sqrt(col("a.n2")) * sqrt(col("b.n2")))).as("cos"))
        .agg(max($"cos")).head().getDouble(0)
      assert(maxCos < 0.7,
        s"$sf: max pairwise cosine $maxCos ≥ 0.7 — the fixture now contains " +
          "genuinely-similar vectors; d14's tau=0.45 must be recalibrated")
    }
  }

  test("fixture invariant (q61): all seven 1995-2001 order-years are " +
    "present at every SF — the dynamic-pivot column contract") {
    for (sf <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val years = Tables.orders(spark, sf)
        .select(year($"o_orderdate").as("yr")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(years == (1995 to 2001),
        s"$sf: order-years drifted to $years — q61's oracle column list " +
          "(and its Scaladoc invariant) must be updated to match")
    }
  }

  test("d23: the corpus side runs map-side only — bloom pre-filter above " +
    "the scan, batch broadcast into the exact join, no corpus exchange") {
    // a fixture WITH a cross-split duplicate: at sf0.001 there are no
    // exact dups, the bloom matches nothing, and AQE's empty-relation
    // propagation erases the probe join from the final plan entirely
    val mk = (pre: String, n: Int) => (1 to n).map(i => s"$pre$i").mkString(" ")
    val docs = (0L to 19L).map { i =>
      val text = if (i == 4L) mk("dup", 30) // doc 4 (ingest: 4 % 9 == 4)…
      else if (i == 7L) mk("dup", 30)       // …duplicates corpus doc 7
      else mk(s"t$i-", 30)
      (i, text, "en", "web", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("d23fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("d23_bloom_ingest_dedup")(spark, dir)
    val rows = df.collect() // finalize AQE
    // doc 4 is flagged against its corpus twin; doc 13 (the other ingest
    // doc) is unique
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((4L, "duplicate"), (13L, "unique")), rows.mkString(","))
    assert(rows.head.getLong(2) == 7L)
    val nodes = allNodes(castToImpl(df).queryExecution.executedPlan)
    def hasDocsScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      allNodes(p).exists {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.toString.contains("documents.parquet")
        case _ => false
      }
    // the probe join is the INNER one on h (the final verdict join is a
    // left-outer over the already-aggregated matches)
    val probeJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner &&
            hasDocsScan(j) => j
    }
    assert(probeJoins.nonEmpty, "exact probe join is not a broadcast join")
    val corpusSide = probeJoins.head.children.filter(hasDocsScan)
    assert(corpusSide.nonEmpty)
    corpusSide.foreach { side =>
      // the bloom pre-filter is a UDF filter in the corpus's map stage…
      assert(allNodes(side).exists {
        case f: org.apache.spark.sql.execution.FilterExec =>
          f.condition.toString.contains("UDF")
        case _ => false
      }, s"bloom pre-filter missing above the corpus scan:\n$side")
      // …and nothing on this side ever shuffles
      val ex = allNodes(side).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(ex.isEmpty, s"corpus side shuffled:\n${ex.mkString("\n")}")
    }
  }

  test("x12: the SQL-defined UDF is inlined by Catalyst — expanded " +
    "arithmetic in the plan, no black-box UDF node, codegen intact") {
    val df = SparkEntry.queries("x12_sql_udf")(spark, sf0001)
    df.collect()
    val p = castToImpl(df).queryExecution.executedPlan.toString
    assert(!p.contains("UDF("), s"SQL UDF left a black-box call:\n$p")
    assert(p.contains("l_discount"), s"inlined body missing from the plan:\n$p")
  }

  test("t12 scale contract: one source really spans many range partitions") {
    val parts = spark.sessionState.conf.numShufflePartitions
    val df = spark.range(10000)
      .select($"id", lit("web").as("src"), lit(1L).as("v"))
      .repartitionByRange(parts, $"src", $"id")
      .select(spark_partition_id().as("p"))
    val distinctPids = df.distinct().count()
    assert(distinctPids > 1,
      s"range partitioning put the whole source in $distinctPids partition(s)")
  }
}

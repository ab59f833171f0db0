package graft

import graft.pipe.{ExternalPipeline, PipeGlobals, PipelineSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Physical-plan assertions (the 100 TB design contract from the builder
  * prompt): filters/pruning reach the parquet scan, dims broadcast, the
  * pipe stage stays shuffle-free, partition pruning fires. */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    castToImpl(df).queryExecution.executedPlan.toString

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sf0001))
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
    assert(!p.contains("l_partkey"), "scan reads columns the query never uses")
  }

  test("q05: all dimension sides are broadcast, fact join shuffles") {
    val p = plan(SparkEntry.queries("q05_local_supplier_volume")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins in:\n$p")
    assert(p.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange") >= 3)
  }

  test("q06: whole-stage codegen covers the scan+filter+agg pipeline") {
    val df = SparkEntry.queries("q06_forecast_revenue")(spark, sf0001)
    df.collect() // execute THIS plan so AQE finalizes it (count() would plan anew)
    val p = castToImpl(df).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // formatted mode marks whole-stage-codegen operators with a '*' prefix
    assert(p.contains("* HashAggregate") && p.contains("* Filter"),
      s"scan→filter→agg not inside a codegen span:\n$p")
  }

  test("t23/d26 persist placement is pinned: t23 runs persist-free (its " +
    "branch subtrees recompute in parallel inside ONE job — measured " +
    "faster than an eager persist's extra serial job), while d26 keeps " +
    "exactly its load-bearing quantized-embedding cache") {
    val t23 = SparkEntry.queries("t23_novelty")(spark, sf0001)
    t23.collect() // execute THIS plan so AQE finalizes it
    val pT = castToImpl(t23).queryExecution.executedPlan.toString
    assert(!pT.contains("InMemoryRelation"),
      s"t23 regained a persist — the extra job is pure overhead " +
        s"(2.25s vs 1.58s measured at sf0.1):\n$pT")
    // Catalyst makes the persist unnecessary here by rewriting the
    // min()-side branch to skip the distinct, so the two digest scans
    // are DIFFERENT subtrees that run concurrently in the final job
    assert(pT.contains("partial_min"), s"expected the rewritten min branch:\n$pT")

    val d26 = SparkEntry.queries("d26_pq_recall")(spark, sf0001)
    d26.collect()
    val pD = castToImpl(d26).queryExecution.executedPlan.toString
    assert(pD.contains("InMemoryTableScan"),
      s"d26 lost its quantized-embedding cache — every consumer would " +
        s"re-read and re-quantize the corpus:\n$pD")
    // the ADC ranking and exact-distance fan-outs stay persist-free:
    // they are map-side computes over that one cache (2.70s → 1.06s
    // measured at sf0.1 dropping their former persists). All cache scans
    // must come from that single quantized relation — a persist of the
    // windowed/ranked intermediates would cache rk/ad/d2 columns
    for (c <- Seq("rk#", "ad#", "d2#"))
      assert(!pD.linesIterator.exists(l => l.contains("InMemoryRelation") && l.contains(c)),
        s"d26 regained a persist of a ranked intermediate ($c):\n$pD")
  }

  test("pipe operator plan is a single narrow stage (no shuffle)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("plan-pipe-bin")
    val sh = d.resolve("noop.sh")
    java.nio.file.Files.writeString(sh, "#!/bin/sh\ncp \"$2\" out.txt\n")
    sh.toFile.setExecutable(true)
    val spec = PipelineSpec("x", d.toString, Seq("noop.sh %MCR_ROOT% %INPUT_FILE%"), "", "")
    val globals = PipeGlobals(java.nio.file.Files.createTempDirectory("plan-pipe").toString, "", "/tmp")
    val df = ExternalPipeline.run(spark.createDataset(Seq("a", "b")), None, spec, globals)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"pipe stage must stay map-only (Driver.java:128 parity):\n$p")
  }

  test("src04: partitioned write + read prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("plan-part").toString
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/o")
    val df = spark.read.parquet(s"$dir/o").filter(col("o_year") === 1997)
      .groupBy("o_orderpriority").count()
    val p = plan(df)
    assert(p.contains("PartitionFilters"), s"no partition filters:\n$p")
    assert(p.contains("o_year"), s"pruning column missing:\n$p")
  }

  test("co-partitioned join reuses repartitioning (no extra exchange)") {
    val o = Tables.orders(spark, sf0001).repartition(8, col("o_orderkey"))
    val l = Tables.lineitem(spark, sf0001).repartition(8, col("l_orderkey"))
    val j = l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
    val p = plan(j)
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    // exactly the two REPARTITION exchanges; the join must not add an
    // ENSURE_REQUIREMENTS re-shuffle on top (partitioning is compatible)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
    assert(p.contains("SortMergeJoin"), s"merge hint ignored:\n$p")
  }

  test("bucketed tables join with no exchange at all (co-located join)") {
    Tables.orders(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_b_orders")
    Tables.customer(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_b_cust")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_b_orders")
        .join(spark.table("graft_b_cust"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the join itself must not shuffle either side — bucket layout IS
      // the partitioning; only the final aggregation exchanges
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), s"bucketed join still shuffled:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("d05: query side of the similarity join is broadcast") {
    val p = plan(SparkEntry.queries("d05_embed_cosine_topk")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"queries not broadcast:\n$p")
  }

  test("d05: heap top-k operator replaces the rank window on the similarity path") {
    val p = plan(SparkEntry.queries("d05_embed_cosine_topk")(spark, sf0001))
    assert(p.contains("TopKPerGroup"), s"heap rewrite did not fire on d05:\n$p")
    assert(p.contains("LocalTopK"), s"no map-side partial top-k on d05:\n$p")
  }

  test("d07: Cast/EqualTo-tolerant rewrite fires on both IVF rank filters") {
    val p = plan(SparkEntry.queries("d07_embed_ivf_topk")(spark, sf0001))
    // rn === 1 (cell assignment) and rank <= 3 (probe) are both heap top-k
    assert(p.sliding("TopKPerGroup".length).count(_ == "TopKPerGroup") >= 2,
      s"expected the rewrite on assignment AND probe:\n$p")
  }

  test("t05/t13: the FULL vocabulary (term-frequency) table is never " +
    "broadcast — t13's only broadcast hash join carries the LIMITed hot set") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // with auto-broadcast off, only an explicit hint could broadcast the
      // term join — the full vocabulary must shuffle, not broadcast.
      // (the 1-row corpus total is exempt: BroadcastNestedLoopJoin only)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p05 = plan(SparkEntry.queries("t05_tfidf")(spark, sf0001))
      assert(!p05.contains("BroadcastHashJoin"),
        s"t05 vocabulary join broadcast-hinted:\n$p05")
      // t13 is the hybrid hot/tail form: the broadcast side must be the
      // bounded top-K (a global limit), and the tail must still shuffle
      val p13 = plan(SparkEntry.queries("t13_unigram_surprisal")(spark, sf0001))
      assert(p13.contains("BroadcastHashJoin"), s"t13 hot tag join missing:\n$p13")
      assert(p13.contains("SortMergeJoin"), s"t13 tail shuffle join missing:\n$p13")
      assert(p13.contains("TakeOrderedAndProject"),
        s"t13's broadcast side is not the bounded top-K:\n$p13")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Column names flowing through every hash-partitioned shuffle of the
    * query's (non-AQE) physical plan. AQE is disabled for the build so
    * plain ShuffleExchangeExec nodes are inspectable — which columns
    * shuffle is a static property AQE doesn't change. Round-robin
    * spreads (the small-scan repartition, a no-op at scale) are excluded
    * on purpose. */
  private def hashShuffledColumns(mk: => org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      castToImpl(mk).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          e.output.map(_.name)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("m04: media payloads never shuffle — only hash/id/size cross the wire") {
    val shuffles = hashShuffledColumns(SparkEntry.queries("m04_media_dedup")(spark, sf0001))
    assert(shuffles.nonEmpty, "expected at least the dedup aggregation shuffle")
    val leaked = shuffles.filter(_.exists(c => c.contains("payload") && !c.contains("payload_md5")))
    assert(leaked.isEmpty, s"binary payload crosses a shuffle: $leaked")
  }

  test("d10: corpus text never shuffles during decontamination") {
    val shuffles = hashShuffledColumns(SparkEntry.queries("d10_decontaminate")(spark, sf0001))
    val leaked = shuffles.filter(_.exists(_ == "text"))
    assert(leaked.isEmpty, s"document text crosses a hash shuffle: $leaked")
  }

  test("d13: neither text nor raw grams shuffle — only matched gram hashes") {
    val shuffles = hashShuffledColumns(
      SparkEntry.queries("d13_ngram_decontaminate")(spark, sf0001))
    val leaked = shuffles.filter(_.exists(c => c == "text" || c == "g"))
    assert(leaked.isEmpty, s"wide column crosses a hash shuffle: $leaked")
  }

  test("d15: the verification dataflow shuffles only ids/60-bit hashes — " +
    "never text, token arrays, or shingle strings") {
    // the full d15 query materializes stage by stage (reuse/checkpoint),
    // so its FINAL plan is just the tiny CC output; the shuffle contract
    // lives in the verification segment — rebuild it un-materialized from
    // the same public pieces jaccardVerifiedPairs composes and inspect
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val candIds = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val sh = graft.ops.Dedup.wordShingleHashes(docs, "doc_id", "text", 3)
      .join(candIds, Seq("id"), "left_semi").distinct()
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("id").as("id_a"), col("h")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      .join(sz.select(col("id").as("id_a"), col("n").as("na")), "id_a")
    val shuffles = hashShuffledColumns(inter)
    assert(shuffles.nonEmpty, "expected the set-distinct/intersection shuffles")
    val leaked = shuffles.filter(_.exists(c => c == "text" || c == "ws" || c == "sh"))
    assert(leaked.isEmpty, s"wide column crosses a hash shuffle: $leaked")
    // and the shingle key that does shuffle is the 8-byte long, not a string
    val hTypes = castToImpl(sh).schema("h").dataType
    assert(hTypes == org.apache.spark.sql.types.LongType)
  }

  test("d22: the substring-dedup dataflow shuffles only ids, positions, " +
    "and 8-byte gram hashes — never text, token arrays, or gram strings") {
    // the shipped query materializes stage by stage (reuse), so rebuild
    // the anchor→candidate→verification segment un-materialized from the
    // same public pieces and inspect its single combined plan
    val g = graft.ops.Dedup.wordGramPositions(
      Tables.documents(spark, sf0001), "doc_id", "text", 8)
    val anchors = g.groupBy("h").agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd").between(2, 10)).select("h")
    val ag = g.join(anchors, Seq("h"), "left_semi")
    val cand = ag.filter(col("pos") % 13 === 0)
      .select(col("h"), col("id").as("id_s"))
      .join(ag.select(col("h"), col("id").as("id_o")), "h")
      .filter(col("id_s") =!= col("id_o"))
      .select(least(col("id_s"), col("id_o")).as("id_a"),
        greatest(col("id_s"), col("id_o")).as("id_b"))
      .distinct()
    val m = cand
      .join(g.select(col("id").as("id_a"), col("pos").as("pa"), col("h")), "id_a")
      .join(g.select(col("id").as("id_b"), col("pos").as("pb"), col("h")),
        Seq("id_b", "h"))
    val shuffles = hashShuffledColumns(m)
    assert(shuffles.nonEmpty, "expected the anchor/candidate/match shuffles")
    val leaked = shuffles.filter(_.exists(c =>
      c == "text" || c == "ws" || c == "gram"))
    assert(leaked.isEmpty, s"wide column crosses a hash shuffle: $leaked")
  }

  test("AQE splits a skewed join partition at runtime (the no-salt skew path)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the fixture-sized skew triggers the optimizer
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k rows on ONE key vs a uniform right side: the classic hot key.
      // Downstream must NOT require distribution on the join key (a
      // groupBy(k) would — AQE declines to split when that forces a
      // re-shuffle, unless forceOptimizeSkewedJoin); the global sum has
      // no such requirement, so the split is free
      val skewed = spark.range(200000).select(lit(7L).as("k"), $"id".as(s"payload"))
        .unionAll(spark.range(2000).select(($"id" % 100).as("k"), $"id".as("payload")))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = skewed.join(right, "k").agg(sum("payload").as("s"))
      joined.collect() // AQE finalizes only on execution of THIS plan
      val p = castToImpl(joined).queryExecution.executedPlan.toString
      assert(p.contains("skew=true") && p.contains("AQEShuffleRead skewed"),
        s"AQE skew-join did not split the hot partition:\n$p")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("t11: the per-source sampling cap runs on the heap top-k operator, " +
    "not a full per-source sort") {
    val p = plan(SparkEntry.queries("t11_source_cap")(spark, sf0001))
    assert(p.contains("TopKPerGroup"), s"heap rewrite did not fire on t11:\n$p")
    assert(p.contains("LocalTopK"), s"no map-side partial top-k on t11:\n$p")
  }

  test("d16: probe set is broadcast — the corpus is never shuffled for the " +
    "bucketed ANN join") {
    val p = plan(SparkEntry.queries("d16_hyperplane_ann_recall")(spark, sf0001))
    assert(p.contains("BroadcastExchange"), s"probes not broadcast:\n$p")
    // quantized vectors may ride the broadcast (the tiny probe side) and
    // the persisted pair table, but must never hash-shuffle corpus-wide
    val shuffles = hashShuffledColumns(
      SparkEntry.queries("d16_hyperplane_ann_recall")(spark, sf0001))
    val leaked = shuffles.filter(_.exists(c => c == "v" || c == "cv" || c == "embedding"))
    assert(leaked.isEmpty, s"corpus vectors cross a hash shuffle: $leaked")
  }

  test("s13: benchmark hash set enters the stream as a broadcast anti-join") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // rebuild s13's streaming graph and inspect the executed micro-batch
    // plan: the static bench side must be a BroadcastExchange feeding a
    // LeftAnti BroadcastHashJoin — the stream is scanned, never shuffled,
    // by decontamination
    val contentHash = md5(concat_ws("|",
      col("user_id").cast("string"), col("event_type"), col("props")))
    val bench = Tables.events(spark, sf0001)
      .filter(col("event_id") % 7 === 0).select(contentHash.as("bh")).distinct()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // declare whatever ts type is physically on disk (nanos-long vs NTZ —
    // see Tables.normalizeEventTs), then normalize like the batch loader
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeEventTs(
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(sf0001))
      .filter(col("event_id") % 7 =!= 0)
      .withColumn("h", contentHash)
      .join(broadcast(bench), col("h") === col("bh"), "left_anti")
    val q = stream.writeStream.format("memory").queryName("s13_plan_probe")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination() // the streaming graph itself runs clean
    assert(q.exception.isEmpty, s"s13-shaped stream failed: ${q.exception}")
    // per-micro-batch plans aren't exposed through a stable API; the same
    // join on the batch relation compiles to the identical operator pair,
    // so assert the shape there
    val batchPlan = plan(Tables.events(spark, sf0001)
      .filter(col("event_id") % 7 =!= 0).withColumn("h", contentHash)
      .join(broadcast(bench), col("h") === col("bh"), "left_anti"))
    assert(batchPlan.contains("BroadcastHashJoin") && batchPlan.contains("LeftAnti"),
      s"bench side not a broadcast anti-join:\n$batchPlan")
  }
}

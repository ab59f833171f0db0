package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

/** Round-7 corpus-statistics batch: Zipf fit (t32), char entropy (t33),
  * positional phrase search (t34). Each test is an independent oracle —
  * driver-side recounts or analytic bounds, not a rerun of the query.
  */
class CorpusStatsSpec extends SparkTestBase {

  test("t32 zipf fit: every source shows a negative slope with a sane " +
    "fit, and the heap top-k operator (not a full window sort) feeds it") {
    val df = SparkEntry.queries("t32_zipf_fit")(spark, sf001)
    val rows = df.collect()
    assert(rows.length >= 2, "expected one row per source")
    rows.foreach { r =>
      val (slope, r2) = (r.getDouble(2), r.getDouble(3))
      assert(slope < 0, s"Zipf slope must be negative: $r")
      assert(r2 > 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r")
      assert(r.getLong(1) >= 2L && r.getLong(1) <= 200L,
        s"rank cut must cap at 200: $r")
    }
    // the fixture's sources are template-generated — exactly the flat,
    // poorly-Zipfian regime the diagnostic exists to flag; natural prose
    // sits near slope -1, r2 > 0.9. Pin that the diagnostic actually
    // discriminates: every synthetic source fits WORSE than the Zipf
    // ideal would
    assert(rows.forall(_.getDouble(2) > -1.0),
      "template text should be flatter than Zipf slope -1")
    // the rank idiom must have been rewritten into the bounded-heap
    // operator: a full per-source vocabulary sort is the plan this
    // operator exists to avoid
    val plan = castToImpl(df).queryExecution.executedPlan.toString
    assert(plan.contains("TopK") || plan.contains("LocalTopK"),
      s"expected the TopKPerGroup rewrite in the plan:\n$plan")
  }

  test("t32 slope recomputed driver-side from raw term counts matches") {
    val docs = Tables.documents(spark, sf0001)
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").count()
      .collect()
      .groupBy(_.getString(0))
    val got = SparkEntry.queries("t32_zipf_fit")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    counts.foreach { case (src, rs) =>
      val top = rs.map(r => (r.getString(1), r.getLong(2)))
        .sortBy { case (t, c) => (-c, t) }.take(200)
      val pts = top.zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - got(src)) < 1e-4,
        s"driver OLS $slope != engine ${got(src)} for $src")
    }
  }

  test("t33 char entropy: H is bounded by ln(alphabet size), zero only " +
    "for single-char docs, and matches a driver recount exactly") {
    val rows = SparkEntry.queries("t33_char_entropy")(spark, sf0001).collect()
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size, "one row per document")
    rows.foreach { r =>
      val (id, n, k, h) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9, s"entropy must be non-negative: $r")
      assert(h <= math.log(k.toDouble) + 1e-4,
        s"entropy cannot exceed ln(distinct chars): $r")
      // exact recount under the same micro-nat quantization
      val cnts = texts(id).groupBy(identity).map(_._2.length.toLong)
      assert(cnts.sum == n, s"char count mismatch for doc $id")
      val sq = cnts.map(c => c * math.round(math.log(c.toDouble) * 1e6)).sum
      val expected = math.rint(
        (math.round(math.log(n.toDouble) * 1e6) - sq * 1.0 / n) / 1e6 * 1e4) / 1e4
      assert(math.abs(expected - h) < 1e-9,
        s"doc $id: driver entropy $expected != engine $h")
    }
  }

  test("t35 gopher repetition: planted spam/clean/short docs get the " +
    "hand-computed fractions and keep flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t35fix").toString
    val spam = Seq.fill(20)("spam").mkString(" ")    // 20 tokens, 99 chars
    val clean = (1 to 30).map(i => s"w$i").mkString(" ") // all tokens distinct
    val short = "a b c"                               // no 5/6-grams at all
    Seq((1L, spam, "en", "s", spam.length.toLong),
        (2L, clean, "en", "s", clean.length.toLong),
        (3L, short, "en", "s", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t35_gopher_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // spam: every n-gram is duplicated; top-2-gram mass = 19 occurrences
    // x 9 chars = 171 > 99 chars -> clamped to 1.0; fails every gate
    val s1 = rows(1L)
    assert(s1.getDouble(1) == 1.0 && s1.getDouble(4) == 1.0 && !s1.getBoolean(6),
      s"spam doc must saturate and be dropped: $s1")
    // clean: zero duplicated grams anywhere; top-2-gram occurs once ->
    // mass = its char length
    val s2 = rows(2L)
    assert(s2.getDouble(4) == 0.0 && s2.getDouble(5) == 0.0,
      s"distinct-token doc has no duplicate grams: $s2")
    val topBigramLen = (1 to 30).map(i => s"w$i").sliding(2)
      .map(_.mkString(" ").length).max
    assert(s2.getDouble(1) == math.rint(topBigramLen * 1.0 / clean.length * 1e4) / 1e4
      && s2.getBoolean(6), s"clean doc top2 mass must be one gram's chars: $s2")
    // short: zero masses for n > token count, but the whole text IS its
    // own top 3-gram (the reason Gopher applies a min-length gate before
    // this battery) — saturated top3, dropped
    val s3 = rows(3L)
    assert(s3.getDouble(4) == 0.0 && s3.getDouble(5) == 0.0
      && s3.getDouble(2) == 1.0 && !s3.getBoolean(6),
      s"3-token doc: no 5/6-grams, top3 saturated, dropped: $s3")
  }

  test("t38 source divergence: KL is non-negative (Gibbs), zero for an " +
    "identical-distribution pair, and large for disjoint vocabularies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t38fix").toString
    val docsA = (1 to 10).map(i => (i.toLong, "alpha beta gamma", "en", "same1", 16L))
    val docsB = (11 to 20).map(i => (i.toLong, "alpha beta gamma", "en", "same2", 16L))
    val docsC = (21 to 30).map(i => (i.toLong, "delta epsilon zeta", "en", "other", 18L))
    (docsA ++ docsB ++ docsC)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t38_source_divergence")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 6, "3 sources -> 6 ordered pairs, no self-pairs")
    rows.values.foreach(kl => assert(kl >= -1e-3, s"negative KL: $rows"))
    assert(rows(("same1", "same2")) == 0.0,
      s"identical distributions must diverge by 0: $rows")
    assert(rows(("same1", "other")) > 10 * math.max(rows(("same1", "same2")), 1e-4),
      s"disjoint vocab must dominate identical pair: $rows")
    // and on the real corpus every pair is finite and the matrix is
    // NOT symmetric in general (KL is directed)
    val real = SparkEntry.queries("t38_source_divergence")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(real.exists { case ((a, b), v) => math.abs(v - real((b, a))) > 1e-4 },
      "expected at least one asymmetric pair on the real corpus")
  }

  test("d41 triangles: a planted 4-clique of identical docs yields " +
    "exactly C(3,2)=3 triangles per member at coefficient 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d41fix").toString
    val cliqueText = (1 to 30).map(i => s"tok$i").mkString(" ")
    val clique = (1 to 4).map(i => (i.toLong, cliqueText, "en", "s", cliqueText.length.toLong))
    val lone = (5 to 12).map(i =>
      (i.toLong, (1 to 30).map(j => s"w${i}_$j").mkString(" "), "en", "s", 100L))
    (clique ++ lone).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("d41_dup_graph_triangles")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L),
      s"only the clique is in the dup graph: ${rows.keySet}")
    rows.values.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 1000000L,
        s"K4 member must have degree 3, 3 triangles, coefficient 1.0: $r")
    }
  }

  test("d41 triangle counts equal a driver-side brute-force recount " +
    "over the same verified edge set") {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sf001)
    val (buckets, shingles) = Dedup.lshBucketsAndShingles(
      docs, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
    val edges = Dedup.jaccardVerifiedPairs(
        Dedup.candidatePairs(buckets, materialize = false), shingles, tau = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashSet[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
    }
    val expected = adj.map { case (v, ns) =>
      val nsArr = ns.toArray
      var t = 0L
      for (i <- nsArr.indices; j <- (i + 1) until nsArr.length)
        if (adj(nsArr(i)).contains(nsArr(j))) t += 1
      v -> (ns.size.toLong, t)
    }
    val got = SparkEntry.queries("d41_dup_graph_triangles")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected.toMap,
      s"triangle census diverged from brute force (got ${got.size} vs ${expected.size} nodes)")
    assert(expected.values.map(_._2).sum > 0, "fixture graph has no triangles — vacuous")
  }

  test("d43 simhash curve: cumulative monotone, endpoints sane, and the " +
    "h<=3 point equals d11's own pair census") {
    val rows = SparkEntry.queries("d43_simhash_curve")(spark, sf001)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 6L, 8L))
    val pairs = rows.map(_.getLong(1)); val trues = rows.map(_.getLong(2))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a <= b },
      "admitted pairs must be cumulative in the threshold")
    assert(trues.zip(trues.tail).forall { case (a, b) => a <= b },
      "true pairs must be cumulative in the threshold")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0, s"precision: $r")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0, s"recall: $r")
    }
    assert(rows.last.getDouble(4) == 1.0,
      "recall against the colliding pool must reach 1 at the loosest cut")
    // cross-operator consistency: d11 reports the SAME banding's pairs
    // at hamming <= 3, grouped by hamming
    val d11Total = SparkEntry.queries("d11_simhash_dedup")(spark, sf001)
      .collect().map(_.getLong(1)).sum
    val at3 = rows.find(_.getLong(0) == 3L).get.getLong(1)
    assert(at3 == d11Total,
      s"curve@3 ($at3) must equal d11's own census ($d11Total)")
    // the curve must actually discriminate on this corpus
    assert(rows.head.getDouble(3) > rows.last.getDouble(3),
      "tight cut should be more precise than the loosest")
  }

  test("session-4 census ops are partition-count invariant: identical " +
    "output rows under different shuffle-partition counts") {
    // t35 (gram windows), t38 (vocab grid joins), d41 (degree
    // orientation), d43 (curve aggregation): the shapes where a hidden
    // order-dependence would corrupt results only at fleet partitioning
    for (nm <- Seq("t35_gopher_repetition", "t38_source_divergence",
        "d41_dup_graph_triangles", "d43_simhash_curve")) {
      val runs = Seq("4", "7").map { parts =>
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try SparkEntry.queries(nm)(spark, sf0001).collect().toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(runs(0) == runs(1), s"$nm depends on the partition count")
      assert(runs(0).nonEmpty, s"$nm trivially empty at sf0.001")
    }
  }

  test("t42 code-switching: a planted en->es doc is flagged, homogeneous " +
    "and half-empty docs are not, and the halves rule matches t01 on " +
    "whole docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t42fix").toString
    val switched = "the cat a dog of mice " + "el gato la casa de perros"
    val english = "the a of the a of the a of"
    val oneWord = "hola"
    Seq((1L, switched, "en", "s", switched.length.toLong),
        (2L, english, "en", "s", english.length.toLong),
        (3L, oneWord, "es", "s", oneWord.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t42_code_switching")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getString(2) == "en" && r1.getString(3) == "es" && r1.getBoolean(4),
      s"planted switch must be flagged: $r1")
    val r2 = rows(2L)
    assert(r2.getString(2) == "en" && r2.getString(3) == "en" && !r2.getBoolean(4),
      s"homogeneous doc must not be flagged: $r2")
    val r3 = rows(3L)
    assert(!r3.getBoolean(4) && r3.getString(2) == "unknown",
      s"a one-word doc has an empty first half -> unknown, never mixed: $r3")
    // the fixture corpus is language-homogeneous by construction: the
    // detector must stay silent on it (false-positive honesty)
    val real = SparkEntry.queries("t42_code_switching")(spark, sf0001).collect()
    assert(!real.exists(_.getBoolean(4)),
      "no fixture doc should read as code-switched")
  }

  test("d44 effective size is consistent with d15's own components and " +
    "a driver token recount") {
    val r = SparkEntry.queries("d44_effective_size")(spark, sf001).head()
    val comp = SparkEntry.queries("d15_verified_dedup_groups")(spark, sf001)
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    val removed = comp.length - comp.map(_._2).distinct.length
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r.getLong(0) == docs.size.toLong, "raw doc count")
    assert(r.getLong(2) == docs.size - removed,
      s"kept docs must equal corpus minus (nodes - clusters): $r, removed=$removed")
    val dropped = comp.filter { case (id, c) => c != id }.map(_._1).toSet
    val keptTok = docs.collect {
      case (id, text) if !dropped.contains(id) => text.split(" ").length.toLong
    }.sum
    assert(r.getLong(3) == keptTok, s"kept tokens diverge from recount: $r vs $keptTok")
    assert(r.getDouble(5) > 0, "fixture has duplicates; reduction must be positive")
  }

  test("t34 phrase search: hits equal a literal driver-side substring " +
    "scan for the same phrase, and the postings are phrase-filtered " +
    "through broadcasts before the adjacency join") {
    val df = SparkEntry.queries("t34_phrase_search")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty, "top bigram must occur somewhere")
    val (u, v) = (rows.head.getString(1), rows.head.getString(2))
    // independent recount: sliding-window scan over every document
    val expected = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val ws = r.getString(1).split(" ")
        val hits = ws.indices.dropRight(1)
          .filter(i => ws(i) == u && ws(i + 1) == v)
        if (hits.isEmpty) None
        else Some(r.getLong(0) -> (hits.length.toLong, hits.head.toLong + 1))
      }.toMap
    assert(rows.length == expected.size,
      s"doc coverage: engine ${rows.length} vs scan ${expected.size}")
    rows.foreach { r =>
      val (cnt, first) = expected(r.getLong(0))
      assert(r.getLong(3) == cnt && r.getLong(4) == first,
        s"mismatch vs driver scan: $r expected ($cnt, $first)")
    }
    // scale contract: both adjacency inputs are cut map-side by a
    // broadcast of the 1-row phrase — at least two broadcast joins in
    // the executed plan
    val plan = castToImpl(df).queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"expected broadcast-filtered postings:\n$plan")
  }
}

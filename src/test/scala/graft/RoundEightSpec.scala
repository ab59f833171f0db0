package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Round-8 specs: the composed curation pipeline's cross-stage contracts —
  * the properties that only exist when the stages run as ONE product
  * (digest reuse across stages, stage coupling) — plus this round's
  * robustness additions.
  */
class RoundEightSpec extends SparkTestBase {

  test("p01 composed pipeline: stage census is coupled (every stage's n_in " +
    "is the previous stage's n_out) and monotonically filtering") {
    val st = ops.Pipeline.fullCuration(spark, sf0001)
    val rows = st.census.orderBy("stage").collect()
    assert(rows.length == 9, s"expected 9 stages, got ${rows.length}")
    val nIn = rows.map(_.getLong(2))
    val nOut = rows.map(_.getLong(3))
    // composition contract: stage k consumes EXACTLY what k-1 produced —
    // a re-derivation (or stale branch) of any intermediate breaks this
    for (k <- 1 until 9)
      assert(nIn(k) == nOut(k - 1),
        s"stage ${k + 1} n_in=${nIn(k)} != stage $k n_out=${nOut(k - 1)}")
    // each stage filters (or passes through), never invents rows
    for (k <- 0 until 8)
      assert(nOut(k) <= nIn(k), s"stage ${k + 1} grew: ${nIn(k)} -> ${nOut(k)}")
    assert(nOut(7) > 0, "pipeline should keep survivors on the fixture")
    spark.catalog.clearCache() // fullCuration persists more than Stages exposes (keep1/ex/f6/dec/f8)
  }

  test("p01 digest-reuse discipline: ONE shingle-digest cache feeds both " +
    "banding and verification, the component table is cached once and " +
    "consumed by dedup AND split, and the corpus base is cached once for " +
    "stages 5-9 — no stage re-shingles or re-tokenizes") {
    val st = ops.Pipeline.fullCuration(spark, sf0001)
    st.census.collect()
    val caches = castToImpl(st.census).queryExecution.optimizedPlan.collect {
      case i: InMemoryRelation => i
    }

    def family(col: String): Seq[InMemoryRelation] =
      caches.filter(_.schema.fieldNames.contains(col))
    def builders(rs: Seq[InMemoryRelation]): Set[Int] =
      rs.map(r => System.identityHashCode(r.cacheBuilder)).toSet

    // 1. the hv digest (id, hv): banding signatures AND the exact-Jaccard
    //    verification sets must read the SAME cached digest — two builders
    //    would mean the corpus was md5-shingled twice. The census itself
    //    only reads the already-materialized `comp` cache, and the
    //    verified-pairs frame's own leaves are pairOverlapStats' caches
    //    (pairs + restricted shingle set) — the digest cache lives INSIDE
    //    those caches' plans, so descend recursively through each
    //    InMemoryRelation's cachedPlan (into AQE stages and reused
    //    exchanges — a plain .collect stops at the stage boundary).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def physNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => Nil
      })).flatMap(physNodes)
    def deepCaches(rs: Seq[InMemoryRelation]): Seq[InMemoryRelation] =
      if (rs.isEmpty) Nil
      else rs ++ deepCaches(rs.flatMap(r =>
        physNodes(r.cacheBuilder.cachedPlan).collect {
          case s: InMemoryTableScanExec => s.relation
        }))
    val topVerified = castToImpl(st.verified).queryExecution.optimizedPlan.collect {
      case i: InMemoryRelation => i
    }
    val hv = deepCaches(topVerified).filter(_.schema.fieldNames.contains("hv"))
    assert(hv.size >= 2, s"digest cache referenced ${hv.size} time(s); " +
      "banding and verification should both read it")
    assert(builders(hv).size == 1,
      "more than one distinct shingle-digest cache: a stage re-shingled")
    // reference-counting hv is not enough: the banded SELF-join alone
    // reads the hv cache twice, so a verification side quietly fed by a
    // foreign digest (mutation: wordShingleHashes over f5 — a second md5
    // pass over the corpus) still shows hv.size == 2. Pin the
    // verification sets DIRECTLY: every candidate-restricted shingle-set
    // cache (schema exactly (id, h)) must derive from the hv cache.
    val verSets = deepCaches(topVerified).filter(
      _.schema.fieldNames.toSet == Set("id", "h"))
    assert(verSets.nonEmpty, "no candidate-restricted shingle-set cache found")
    verSets.foreach { c =>
      val readsHv = physNodes(c.cacheBuilder.cachedPlan).exists {
        case s: InMemoryTableScanExec =>
          s.relation.schema.fieldNames.contains("hv")
        case _ => false
      }
      assert(readsHv, "verification shingle sets do not derive from the hv " +
        "digest cache — the corpus was shingled twice (mutation-verified: " +
        "a wordShingleHashes verification side turns this red)")
    }

    // 2. the component table (id, component): near-dedup survivors (stage 6
    //    — now nested inside the persisted f6 survivor corpus's build plan)
    //    and the leakage-free split keys (stage 8, inside the f8 cache)
    //    plus the cluster census all consume one cached CC result — the
    //    dedup graph never re-runs. Counted through the cache nesting
    //    (deepCaches), same as the hv digest below.
    val comp = deepCaches(caches).filter(_.schema.fieldNames.contains("component"))
    assert(comp.size >= 3, s"component cache referenced ${comp.size} time(s); " +
      "expected stage-6 join (inside f6) + stage-8 join (inside f8) + cluster census")
    assert(builders(comp).size == 1,
      "more than one distinct component cache: the dedup graph re-ran")

    // 3. the corpus snapshot (rt + n_marks + n_tok): every post-quality
    //    stage reads the one repaired+tokenized snapshot — nothing
    //    re-repairs the text. Derived corpus caches (rt WITHOUT n_marks,
    //    e.g. the persisted post-dedup survivor corpus f6) are allowed,
    //    but each must BUILD from the snapshot cache (checked below in
    //    step 5's repair-signature sweep plus the read-from-ann check).
    val base = family("rt").filter(_.schema.fieldNames.contains("n_marks"))
    assert(base.size >= 2, s"ann snapshot cache referenced ${base.size} time(s)")
    assert(builders(base).size == 1,
      "more than one distinct corpus-snapshot cache: a stage re-derived the corpus")

    // 4. and the digest pipeline exists ONLY inside the hv cache: no plan
    //    node outside it — neither in the census's outer plan nor inside
    //    ANY other cache's plan (the pairs cache, the restricted shingle
    //    set, comp's CC rounds) — rebuilds shingle hash pairs (the
    //    double-transform md5 signature of Dedup.shingleHashPairs).
    //    Reference-counting hv alone can't catch a re-shingled
    //    verification side: the pairs cache nests inside the shingle-set
    //    cache via the candidate-id semi-join, so hv stays multiply
    //    referenced even when verification recomputes. This check is the
    //    mutation-killer (verified: re-deriving `shingles` from f5 turns
    //    it red).
    val outer = castToImpl(st.census).queryExecution.optimizedPlan.collect {
      case p if !p.isInstanceOf[InMemoryRelation] =>
        p.expressions.map(_.toString).mkString("; ")
    }.mkString("\n")
    assert(!outer.contains("transform(transform("),
      "a stage recomputes shingle hash pairs outside the digest cache")
    def exprStr(sp: SparkPlan): String =
      physNodes(sp).map(_.expressions.map(_.toString).mkString("; ")).mkString("\n")
    val everyCache = deepCaches(topVerified ++ caches)
      .groupBy(r => System.identityHashCode(r.cacheBuilder)).map(_._2.head)
    everyCache.filterNot(_.schema.fieldNames.contains("hv")).foreach { c =>
      assert(!exprStr(c.cacheBuilder.cachedPlan).contains("transform(transform("),
        s"cache [${c.schema.fieldNames.mkString(",")}] recomputes shingle " +
          "hash pairs outside the hv digest cache")
    }

    // 5. ONE corpus-repair pass in the executed plan: the mojibake
    //    repair/score/tokenize projection (signature: the n_marks
    //    regexp_extract_all) lives ONLY inside the `ann` snapshot cache —
    //    neither the census's outer plan nor any other cache's plan
    //    re-repairs the corpus. This is the r8-verdict fix for the
    //    seven-scan census: every stage-2-4 census aggregate must read
    //    the one cached pass (mutation-verified: census rows aggregating
    //    over the un-persisted f1-derived frame turn this red).
    assert(!outer.contains("regexp_extract_all("),
      "a census row repairs the corpus outside the ann snapshot cache")
    everyCache.filterNot(_.schema.fieldNames.contains("n_marks")).foreach { c =>
      assert(!exprStr(c.cacheBuilder.cachedPlan).contains("regexp_extract_all("),
        s"cache [${c.schema.fieldNames.mkString(",")}] re-repairs the corpus " +
          "outside the ann snapshot cache")
    }
    val ann = family("n_marks")
    assert(ann.size >= 2, s"ann snapshot referenced ${ann.size} time(s); " +
      "stage-2-4 census rows and stages 5-9 should all read it")
    assert(builders(ann).size == 1,
      "more than one distinct ann snapshot cache: the corpus was repaired twice")
    // every DERIVED corpus cache (rt without n_marks) must build FROM the
    // ann snapshot cache, not from the raw documents
    everyCache.filter(c => c.schema.fieldNames.contains("rt")
        && !c.schema.fieldNames.contains("n_marks")).foreach { c =>
      val readsAnn = physNodes(c.cacheBuilder.cachedPlan).exists {
        case s: InMemoryTableScanExec =>
          s.relation.schema.fieldNames.contains("n_marks")
        case _ => false
      }
      assert(readsAnn, s"derived corpus cache [${c.schema.fieldNames.mkString(",")}] " +
        "does not read the ann snapshot cache")
    }
    // 6. ONE 13-gram pass in stage 7: the gram explode (signature:
    //    array_join(slice(ws, i, 13))) appears exactly TWICE inside the
    //    dec cache's build plan — once for the corpus leg, once for the
    //    benchmark leg — and NOWHERE else. The pre-fusion shape (separate
    //    gsz and hits legs, each re-evaluating the un-persisted corpusG)
    //    planted a THIRD occurrence; this pins the fused
    //    join-then-aggregate-once dataflow (mutation-verified: restoring
    //    the gsz⋈hits shape turns this red with count 3).
    def gramPasses(s: String): Int = "array_join\\(slice\\(".r.findAllIn(s).length
    val dec = everyCache.find(_.schema.fieldNames.toSet == Set("doc_id", "dirty"))
      .getOrElse(fail("dec cache (doc_id, dirty) not found"))
    val inDec = gramPasses(exprStr(dec.cacheBuilder.cachedPlan))
    assert(inDec == 2,
      s"stage 7 runs $inDec gram explodes inside the dec cache; expected 2 " +
        "(one corpus pass + one benchmark pass)")
    assert(gramPasses(outer) == 0,
      "a census row re-explodes 13-grams outside the dec cache")
    everyCache.filterNot(_.schema.fieldNames.contains("dirty")).foreach { c =>
      assert(gramPasses(exprStr(c.cacheBuilder.cachedPlan)) == 0,
        s"cache [${c.schema.fieldNames.mkString(",")}] re-explodes 13-grams " +
          "outside the dec cache")
    }
    spark.catalog.clearCache() // fullCuration persists more than Stages exposes (keep1/ex/f6/dec/f8)
  }
}

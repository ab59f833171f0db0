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
    st.base.unpersist(); st.comp.unpersist()
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
    //    would mean the corpus was md5-shingled twice
    val hv = family("hv")
    assert(hv.size >= 2, s"digest cache referenced ${hv.size} time(s); " +
      "banding and verification should both read it")
    assert(builders(hv).size == 1,
      "more than one distinct shingle-digest cache: a stage re-shingled")

    // 2. the component table (id, component): near-dedup survivors (stage 6)
    //    and the leakage-free split keys (stage 8) plus the cluster census
    //    all consume one cached CC result — the dedup graph never re-runs
    val comp = family("component")
    assert(comp.size >= 3, s"component cache referenced ${comp.size} time(s); " +
      "expected stage-6 join + stage-8 join + cluster census")
    assert(builders(comp).size == 1,
      "more than one distinct component cache: the dedup graph re-ran")

    // 3. the corpus base (doc_id, rt, n_tok): every post-quality stage reads
    //    the one repaired+tokenized snapshot — nothing re-repairs the text
    val base = family("rt").filter(_.schema.fieldNames.contains("n_tok"))
    assert(base.size >= 2, s"base cache referenced ${base.size} time(s)")
    assert(builders(base).size == 1,
      "more than one distinct corpus-base cache: a stage re-derived the corpus")

    // 4. and the digest pipeline exists ONLY inside that cache: no plan node
    //    OUTSIDE the cached relations rebuilds shingle hash pairs (the
    //    double-transform md5 signature of Dedup.shingleHashPairs)
    val outer = castToImpl(st.census).queryExecution.optimizedPlan.collect {
      case p if !p.isInstanceOf[InMemoryRelation] =>
        p.expressions.map(_.toString).mkString("; ")
    }.mkString("\n")
    assert(!outer.contains("transform(transform("),
      "a stage recomputes shingle hash pairs outside the digest cache")
    st.base.unpersist(); st.comp.unpersist()
  }
}

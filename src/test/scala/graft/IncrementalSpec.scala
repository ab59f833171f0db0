package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** p02 incremental curation: the "never rebuild" contract. After the
  * three delta batches are admitted, every maintained store must be
  * byte-equal to a from-scratch rebuild over (corpus ∪ admitted) — the
  * invariant that lets a 100 TB deployment append to its indexes
  * instead of re-signing the corpus — and every dup-drop path must be
  * non-vacuous (the plant guarantees work for each). */
class IncrementalSpec extends SparkTestBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("p02: maintained exact/band/shingle stores equal a from-scratch " +
    "rebuild on corpus + admitted, and all four drop paths fire") {
    val p02 = ops.Incremental.incrementalCuration(spark, sf001)
    val census = p02.census.collect()
    assert(census.length == 3, "one census row per delta")

    def sumCol(c: String): Long =
      census.map(r => r.getLong(r.fieldIndex(c))).sum
    assert(sumCol("n_exact_within") > 0, "within-delta exact path vacuous")
    assert(sumCol("n_exact_store") > 0, "store exact path vacuous")
    assert(sumCol("n_near_store") > 0, "store near-dup path vacuous")
    assert(sumCol("n_near_within") > 0, "within-delta near-dup path vacuous")
    assert(sumCol("n_admitted") > 0 && sumCol("n_admitted") < sumCol("n_arrived"))

    // the reference state: what a full rebuild on (corpus ∪ admitted)
    // would produce, via the same one-digest pipeline
    val surviving = p02.planted.filter(col("doc_id") % 11 =!= 5)
      .select(col("doc_id"), col("t"))
      .unionByName(p02.admitted.select(col("doc_id"), col("t")))
    val (rb, rs) = ops.Dedup.lshBucketsAndShingles(
      surviving, "doc_id", "t", shingleWords = 3, bands = 4, rowsPerBand = 2)

    // band index: maintained table == rebuilt buckets (as (bk, id) rows)
    val maintainedIdx = rows(spark.table(p02.idxTable))
    val rebuiltIdx = rows(rb.select(
      concat_ws(":", col("band"), col("band_key")).as("bk"), col("id")))
    assert(maintainedIdx == rebuiltIdx,
      s"band index diverged from rebuild: ${(maintainedIdx diff rebuiltIdx).take(3)} vs " +
        s"${(rebuiltIdx diff maintainedIdx).take(3)}")

    // shingle store: maintained == rebuilt distinct (id, h) sets
    val maintainedSh = rows(spark.read.schema("id LONG, h LONG").parquet(p02.shDir))
    assert(maintainedSh == rows(rs.distinct()),
      "shingle store diverged from rebuild")

    // exact-hash store: maintained == rebuilt distinct hashes
    val maintainedH = rows(spark.read.schema("h STRING").parquet(p02.exDir))
    assert(maintainedH == rows(surviving.select(md5(col("t")).as("h")).distinct()),
      "exact-hash store diverged from rebuild")

    // admission safety: admitted docs are pairwise non-duplicate at the
    // pipeline's own threshold — verify the admitted set against itself
    val (aB, aS) = ops.Dedup.lshBucketsAndShingles(
      p02.admitted.select(col("doc_id"), col("t")), "doc_id", "t", 3, 4, 2)
    val selfPairs = ops.Dedup.jaccardVerifiedPairs(
      ops.Dedup.candidatePairs(aB, cap = ops.Dedup.DefaultBucketCap,
        materialize = false), aS, tau = 0.5)
    assert(selfPairs.isEmpty, "two admitted docs are near-duplicates")
    spark.catalog.clearCache()
  }
}

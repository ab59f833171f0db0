package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage WARM wall clock for the d15 verification
  * pipeline (each stage rebuilt from scratch and timed on a second run).
  * Usage: sbt 'Test/runMain graft.D15Probe /root/testdata/sf0.1'
  */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(32, "graft-d15probe")
    def warmTime(label: String)(f: => Long): Unit = {
      f // warm
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[d15probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def docs = Tables.documents(spark, sfDir)
    def buckets = Dedup.lshBuckets(docs, "doc_id", "text", 3, 4, 2)
    def pairs = Dedup.candidatePairs(buckets)
    def sh = Dedup.wordShingleHashes(docs, "doc_id", "text", 3)
    def verified = Dedup.jaccardVerifiedPairs(pairs, sh, 0.5)

    warmTime("buckets only")(buckets.count())
    warmTime("candidatePairs")(pairs.count())
    warmTime("shingle hashes (no distinct)")(sh.count())
    warmTime("verified pairs")(verified.count())
    warmTime("full d15 (CC incl.)")(
      Dedup.connectedComponents(verified).count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Round-14 optimization guard: bucketed store writes must not fan out
  * nTasks × nBuckets files. Before the writer-side bucket-key
  * repartition (`Dedup.clusterForBuckets`), a 16-partition input wrote
  * up to 128 data files per 8-bucket store (measured 1026 files on
  * t53's posting store at sf0.1); after it, each write lands exactly
  * one file per non-empty bucket. Layout is invisible to SQL results
  * (the full Verify run covers those), so the file-count contract is
  * spec-asserted here. */
class StoreLayoutSpec extends SparkTestBase {
  Engine.install(spark)
  import spark.implicits._

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array()).toSeq.flatMap(walk)
    walk(new java.io.File(dir)).filter { f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
    }
  }

  private def tableDir(table: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:")

  test("band-index write from a many-partition input lands nBuckets files") {
    val docs = (1L to 400L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w$i x y z"))
      .toDF("doc_id", "text").repartition(16)
    val (buckets, _) = ops.Dedup.lshBucketsAndShingles(
      docs, "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 2)
    val table = "graft_layout_band_" + Scratch.nameTag()
    ops.Dedup.writeBandIndex(spark, buckets, table)
    val files = dataFiles(tableDir(table))
    assert(files.nonEmpty && files.size <= 8,
      s"band index wrote ${files.size} data files, expected <= 8 (one per bucket)")
    // and a batch append stays bucket-sized too: <= 8 new files
    ops.Dedup.appendBandIndex(spark, buckets.limit(50), table)
    val after = dataFiles(tableDir(table))
    assert(after.size - files.size <= 8,
      s"append added ${after.size - files.size} files, expected <= 8")
  }

  test("posting-store write from a many-partition input lands nBuckets files") {
    val docs = (1L to 300L).map(i => (i, s"alpha beta w$i gamma"))
      .toDF("doc_id", "text").repartition(16)
    val table = ops.TextAnalysis.writePostingStore(
      spark, ops.TextAnalysis.postingsOf(docs).repartition(16), "layout_post")
    val files = dataFiles(tableDir(table))
    assert(files.nonEmpty && files.size <= 8,
      s"posting store wrote ${files.size} data files, expected <= 8")
  }

  test("ivf-index write from a many-partition input lands nBuckets files") {
    // a cell-assigned frame in writeIvfIndex's input shape (the writer
    // only selects/renames columns, so a hand-built frame exercises the
    // layout path exactly)
    val assign = (1L to 256L).map(i =>
      (i, Array.tabulate(4)(j => (i + j) % 13), (i % 17) + 1, i % 8))
      .toDF("vec_id", "v", "n2", "cell").repartition(16)
    val table = ops.Similarity.writeIvfIndex(spark, assign, "layout_ivf")
    val files = dataFiles(tableDir(table))
    assert(files.nonEmpty && files.size <= 8,
      s"ivf index wrote ${files.size} data files, expected <= 8")
  }
}

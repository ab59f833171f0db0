package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: payload/frame math and the fixture
  * precondition the m02 oracle depends on.
  */
class MultimodalSpec extends SparkTestBase {

  test("documents fixtures are pure ASCII (m02 oracle precondition: " +
    "char substring == byte slice)") {
    // The m02 oracle hashes substring(text,1,64) (chars) against the
    // engine's first-64-BYTES frame; DuckDB 1.0 can't slice BLOBs, so
    // parity requires byte length == char length on every doc.
    for (sf <- Seq(sf0001, sf001)) {
      val nonAscii = Tables.documents(spark, sf)
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0, s"non-ASCII docs in $sf break the m02 oracle")
    }
  }

  test("extractFeatures: byte lengths, frame counts, md5 round-trip") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 64),          // exactly one frame
      (2L, "b" * 65),          // one byte over → 2 frames
      (3L, "señor"),           // non-ASCII: 6 bytes, 5 chars
      (4L, "")                 // empty payload
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).payload_len == 64 && feats(1L).n_frames == 1)
    assert(feats(2L).payload_len == 65 && feats(2L).n_frames == 2)
    assert(feats(3L).payload_len == 6 && feats(3L).n_frames == 1) // bytes, not chars
    assert(feats(4L).payload_len == 0 && feats(4L).n_frames == 0)
    // md5 of utf-8 bytes
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("señor".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(feats(3L).payload_md5 == expected)
  }

  test("sampleFrames: stride sampling and first-frame hash") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 300)).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fs = Multimodal.sampleFrames(Multimodal.asMediaTable(docs)).collect().head
    assert(fs.n_frames == 5)   // ceil(300/64)
    assert(fs.n_sampled == 2)  // frames 0 and 4 (stride 4)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("x" * 64).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fs.first_frame_md5 == expected)
  }
}

package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: payload/frame math and the fixture
  * precondition the m02 oracle depends on.
  */
class MultimodalSpec extends SparkTestBase {

  test("documents fixtures are pure ASCII (fixture sanity only — the m02 " +
    "oracle is byte-exact regardless since the hex-lift change)") {
    for (sf <- Seq(sf0001, sf001)) {
      val nonAscii = Tables.documents(spark, sf)
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0, s"unexpected non-ASCII docs in $sf (fixture drift)")
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

  test("sampleFrames: stride sampling and hex-lifted first-frame hash") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 300)).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fs = Multimodal.sampleFrames(Multimodal.asMediaTable(docs)).collect().head
    assert(fs.n_frames == 5)   // ceil(300/64)
    assert(fs.n_sampled == 2)  // frames 0 and 4 (stride 4)
    val hexFrame = ("x" * 64).getBytes("UTF-8").map("%02X".format(_)).mkString
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(hexFrame.getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(fs.first_frame_md5 == expected)
  }

  test("first-frame hash is byte-exact on non-ASCII, even when the frame " +
    "boundary splits a multi-byte character") {
    import spark.implicits._
    // 63 ASCII chars then 'é' (2 bytes): byte 64 is the FIRST byte of é,
    // so the first frame ends mid-character — a char-based slice cannot
    // express this frame; the hex-lift formulation can
    val text = "a" * 63 + "é" + "tail"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fs = Multimodal.sampleFrames(Multimodal.asMediaTable(docs)).collect().head
    val frameBytes = text.getBytes("UTF-8").take(64)
    val hexFrame = frameBytes.map("%02X".format(_)).mkString
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(hexFrame.getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(fs.first_frame_md5 == expected)
    // and the oracle formulation computes the same value: md5 of the
    // first 128 chars of the payload's hex — replayed here in Spark SQL
    val viaSql = docs.select(
      md5(substring(hex(encode(col("text"), "UTF-8")), 1, 128)).as("h"))
      .as[String].head()
    assert(viaSql == expected)
  }

  test("m07: neither hex payloads nor frame strings cross a hash shuffle — " +
    "the frame-set dedup rides 8-byte hashes like the text pipeline") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries("m07_media_frame_dedup")(spark, sf0001)
        .queryExecution.executedPlan
      // the digest subtrees are eagerly persisted, so at this SF the
      // final plan's verification joins broadcast and may carry ZERO
      // hash shuffles — the contract is that whatever DOES shuffle
      // (here or in any exchange of the plan) is never payload text
      val shuffled = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
      val leaked = shuffled.filter(_.exists(c =>
        c == "hx" || c == "fs" || c == "text" || c.contains("payload")))
      assert(leaked.isEmpty, s"payload-derived text crosses a shuffle: $leaked")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}

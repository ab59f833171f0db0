package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.functions.udf

/** s23 streaming reservoir: state-bound facts and the arrival-order
  * insensitivity that makes the batch oracle exact.
  */
class ReservoirSpec extends SparkTestBase {

  test("s23-shape sampler state is k priorities + a counter per key: " +
    "numRowsTotal == #keys, flat across batches, memory bounded") {
    import spark.implicits._
    val dir = Scratch.dir("graft_reservoir_sb")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), col("event_id"))
      .repartition(4).write.mode("overwrite").parquet(s"$dir/ev")
    val nKeys = spark.read.parquet(s"$dir/ev")
      .select(col("event_type")).distinct().count()
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/ev")
    val q = src
      .select(col("event_type"), md5(col("event_id").cast("string")).as("hk"),
        col("event_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[(String, Long)]), (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (etype, rows, state: GroupState[(Long, Seq[(String, Long)])]) =>
          val (n0, keep0) = state.getOption.getOrElse((0L, Seq.empty[(String, Long)]))
          var n = n0
          val merged = scala.collection.mutable.ArrayBuffer(keep0: _*)
          rows.foreach { case (_, hk, id) => n += 1; merged += ((hk, id)) }
          val keep = merged.distinct.sorted.take(5).toSeq
          state.update((n, keep))
          (etype, n, keep.length.toLong)
      }
      .toDF("event_type", "n_seen", "k")
      .writeStream.format("memory").queryName("reservoir_sb")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, s"expected ≥3 micro-batches, saw ${batches.length}")
    batches.foreach { p =>
      assert(p.stateOperators.head.numRowsTotal <= nKeys,
        s"state rows exceed key cardinality at batch ${p.batchId}")
    }
    assert(batches.last.stateOperators.head.numRowsTotal == nKeys,
      "final state rows must equal key cardinality")
    val tail = batches.map(_.stateOperators.head.numRowsTotal).toSeq.takeRight(2)
    assert(tail.distinct.size == 1, s"state still growing: $tail")
    val mem = batches.last.stateOperators.head.memoryUsedBytes
    assert(mem < nKeys * 65536,
      s"state memory $mem implausible for $nKeys bounded samples")
    // every key's live sample is capped at k
    assert(spark.table("reservoir_sb").agg(max(col("k"))).head().getLong(0) <= 5L)
  }

  test("s23-shape sampler state survives a mid-stream crash + restart: " +
    "the recovered sample equals the batch bottom-k without source replay") {
    import spark.implicits._
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type")).cache()
    val total = events.count()
    val markerId = events.filter(col("event_id") % 4 === 2)
      .agg(min(col("event_id"))).as[Long].head()
    val base = new java.io.File(Scratch.dir("graft_reservoir_rec"))
    val srcDir = new java.io.File(base, "src"); assert(srcDir.mkdirs())
    val now = System.currentTimeMillis()
    (0 until 4).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_rsrc").toFile
      events.filter(col("event_id") % 4 === i).coalesce(1)
        .write.mode("overwrite").parquet(new java.io.File(tmp, "d").toString)
      val part = new java.io.File(tmp, "d").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(srcDir, s"f$i.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(now - (40L - 10L * i) * 1000))
      Scratch.deleteRecursively(tmp)
    }
    val chkDir = new java.io.File(base, "chk").toString
    val chaos = udf { (id: Long) =>
      if (ChaosSwitch.armed.get() && id == markerId)
        throw new RuntimeException("injected mid-stream crash")
      true
    }.asNondeterministic()
    def startQuery(name: String) = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .filter(chaos(col("event_id")))
      .select(col("event_type"), md5(col("event_id").cast("string")).as("hk"),
        col("event_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[(String, Long)]), (String, Long, Seq[(String, Long)])](
        GroupStateTimeout.NoTimeout) {
        case (etype, rows, state: GroupState[(Long, Seq[(String, Long)])]) =>
          val (n0, keep0) = state.getOption.getOrElse((0L, Seq.empty[(String, Long)]))
          var n = n0
          val merged = scala.collection.mutable.ArrayBuffer(keep0: _*)
          rows.foreach { case (_, hk, id) => n += 1; merged += ((hk, id)) }
          val keep = merged.distinct.sorted.take(5).toSeq
          state.update((n, keep))
          (etype, n, keep)
      }
      .toDF("event_type", "n_seen", "sample")
      // the Update-mode memory sink cannot recover from a checkpoint;
      // foreachBatch appending to parquet is the recoverable shape a
      // production sampler sink uses anyway
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$base/out")
      }
      .queryName(name)
      .option("checkpointLocation", chkDir)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    ChaosSwitch.armed.set(true)
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      startQuery("reservoir_rec1").awaitTermination()
    } finally ChaosSwitch.armed.set(false)
    val committed = Option(new java.io.File(chkDir, "commits").listFiles())
      .map(_.count(_.getName.forall(_.isDigit))).getOrElse(0)
    assert(committed >= 1 && committed < 4,
      s"crash must land mid-stream with committed batches: $committed")
    val q2 = startQuery("reservoir_rec2")
    q2.awaitTermination()
    val replayed = q2.recentProgress.map(_.numInputRows).sum
    assert(replayed < total,
      s"restart replayed the whole source ($replayed of $total)")
    // recovered final state == the batch bottom-5 per key over ALL events
    val got = spark.read.parquet(s"$base/out")
      .groupBy("event_type")
      .agg(expr("max_by(sample, n_seen)").as("sample"), max("n_seen").as("n_seen"))
      .select(col("event_type"), expr("transform(sample, x -> x._2)").as("ids"),
        col("n_seen"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Long](1).toSeq, r.getLong(2)))
      .toMap
    val oracle = events.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
      .map { case (t, rs) =>
        val ids = rs.map(_._1).distinct
          .sortBy(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id))
          .take(5).toSeq
        t -> (ids, rs.length.toLong)
      }
    assert(got == oracle,
      s"recovered sample diverged:\n got=$got\n want=$oracle")
    events.unpersist()
  }

  test("s23 output is invariant to arrival order: a reversed-priority " +
    "re-sort of the same events yields the identical sample") {
    val base = SparkEntry.queries("s23_stream_reservoir")(spark, sf0001)
      .collect().toSeq
    val dir = Scratch.dir("graft_reservoir_shuf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // adversarial order: highest priorities arrive FIRST (a naive
    // "first k" sampler would return exactly the wrong rows)
    spark.read.parquet(s"$sf0001/events.parquet")
      .orderBy(md5(col("event_id").cast("string")).desc)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/tmp")
    // the stream's pathGlobFilter expects a flat events.parquet FILE
    val part = new java.io.File(s"$dir/tmp").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val shuffled = SparkEntry.queries("s23_stream_reservoir")(spark, dir)
      .collect().toSeq
    assert(base == shuffled, "sample membership depends on arrival order")
    assert(base.nonEmpty)
  }
}

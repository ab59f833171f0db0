package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** src08 schema-evolution and s24 watermark-evicting dedup: the facts
  * the oracle SQL cannot see (schema shape, state eviction).
  */
class EvolutionDedupSpec extends SparkTestBase {

  test("src08: the merged scan carries the evolved column, a plain scan " +
    "of the old generation does not, and old rows surface as NULLs") {
    val dir = Scratch.dir("graft_evospec")
    val orders = Tables.orders(spark, sf0001)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/lake/gen1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .write.mode("overwrite").parquet(s"$dir/lake/gen2")
    val gen1Only = spark.read.parquet(s"$dir/lake/gen1")
    assert(!gen1Only.columns.contains("o_year"),
      "old generation must not know the new column")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/lake/gen1", s"$dir/lake/gen2")
    assert(merged.columns.toSet == Set("o_orderkey", "o_totalprice", "o_year"),
      s"merged schema wrong: ${merged.columns.mkString(",")}")
    val nullYears = merged.filter(col("o_year").isNull)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val gen1Keys = gen1Only.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(nullYears == gen1Keys,
      "exactly the old generation's rows must carry NULL in the evolved column")
  }

  test("s24-shape dedup state is EVICTED by the watermark: final state " +
    "rows are a fraction of total distinct keys, unlike plain " +
    "dropDuplicates whose state is keys-ever-seen") {
    val dir = Scratch.dir("graft_s24spec")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // event-time-ordered shards so the watermark ADVANCES between
    // micro-batches (unordered files would hold it at the global min)
    val ev = Tables.events(spark, sf001).select("event_id", "ts")
    val n = ev.count()
    val span = ev.agg((unix_timestamp(max(col("ts")))
      - unix_timestamp(min(col("ts")))).as("s")).head().getLong(0)
    assert(span > 10 * 3600, "fixture must span many hours for eviction")
    val sorted = ev.orderBy("ts").withColumn(
      "bucket", ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 4).foreach { b =>
      sorted.filter(col("bucket") === b).drop("bucket")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/ev/b$b")
      val part = new java.io.File(s"$dir/ev/b$b").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/ev/shard$b.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
      }
      rmrf(new java.io.File(s"$dir/ev/b$b"))
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev/shard1.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "shard*.parquet")
      .parquet(s"$dir/ev")
    val q = src
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy().count()
      .writeStream.format("memory").queryName("s24_evict")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, s"expected multi-batch replay, saw ${batches.length}")
    val dedupState = batches.last.stateOperators
      .find(_.operatorName.toLowerCase.contains("dedup"))
      .getOrElse(fail("no dedup state operator reported"))
    assert(dedupState.numRowsTotal < n / 2,
      s"state ${dedupState.numRowsTotal} not evicted (total keys $n)")
    assert(dedupState.numRowsTotal > 0, "state cannot be empty mid-stream")
    // and the dedup COUNT is still exact: every event_id is unique
    assert(spark.table("s24_evict").agg(max(col("count"))).head().getLong(0) == n,
      "dedup output must still cover every unique key exactly once")
  }
}

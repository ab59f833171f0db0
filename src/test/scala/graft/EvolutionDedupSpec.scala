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

  test("src09: quarantined rows keep the RAW line for replay, and the " +
    "quarantine count equals the planted corruption exactly") {
    val dir = Scratch.dir("graft_q_spec")
    val docs = Tables.documents(spark, sf0001)
    val planted = docs.filter(col("doc_id") % 13 === 0).count()
    docs.select(when(col("doc_id") % 13 === 0,
        concat(lit("{\"doc_id\": "), col("doc_id").cast("string"), lit(", \"lan")))
      .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
      .as("value"))
      .write.mode("overwrite").text(s"$dir/feed")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/feed")
    // PERMISSIVE corrupt-record access requires a materialized step in
    // Spark (raw-row caching rule); a cache() makes the column queryable
    val bad = read.cache().filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(bad.length.toLong == planted,
      s"quarantine ${bad.length} != planted $planted")
    assert(bad.forall(l => l.startsWith("{\"doc_id\": ") && l.endsWith(", \"lan")),
      "raw lines must survive verbatim for replay")
    assert(read.filter(col("_corrupt_record").isNull).count() ==
      docs.count() - planted, "good rows must all parse")
  }

  test("t41: risk buckets partition the whole event table and respect " +
    "their size boundaries") {
    val rows = SparkEntry.queries("t41_k_anonymity")(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val total = Tables.events(spark, sf001).count()
    assert(rows.values.map(_.getLong(2)).sum == total,
      "risk buckets must cover every event exactly once")
    rows.get("unique").foreach { r =>
      assert(r.getLong(3) == 1 && r.getLong(4) == 1, s"unique bucket: $r") }
    rows.get("small(2-4)").foreach { r =>
      assert(r.getLong(3) >= 2 && r.getLong(4) <= 4, s"small bucket: $r") }
    rows.get("anonymous(>=5)").foreach { r =>
      assert(r.getLong(3) >= 5, s"anonymous bucket: $r") }
    assert(rows.contains("unique") && rows.contains("anonymous(>=5)"),
      "fixture should exercise both ends of the risk spectrum")
  }

  test("src10: compaction collapses the file count by an order of " +
    "magnitude while content round-trips exactly") {
    def parquetFiles(root: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(root))
    }
    val dir = Scratch.dir("graft_compact_spec")
    val docs = Tables.documents(spark, sf001)
    docs.write.mode("overwrite").option("maxRecordsPerFile", 10)
      .partitionBy("lang").parquet(s"$dir/fragmented")
    val before = parquetFiles(s"$dir/fragmented").length
    spark.read.parquet(s"$dir/fragmented").coalesce(1)
      .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/compacted")
    val after = parquetFiles(s"$dir/compacted").length
    val nLangs = docs.select("lang").distinct().count().toInt
    assert(before >= 5 * nLangs,
      s"fragmented layout not fragmented enough: $before files, $nLangs langs")
    assert(after == nLangs,
      s"compaction should leave one file per partition: $after vs $nLangs")
    val a = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toString).sorted
    val b = spark.read.parquet(s"$dir/compacted")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "compaction must preserve every row exactly")
  }

  test("src11: z-order layout beats a 1-D sort on 2-D box queries — " +
    "fewer file bounding boxes intersect the box, and the z-value " +
    "round-trips through de-interleave") {
    val dir = Scratch.dir("graft_zspec")
    val orders = Tables.orders(spark, sf001)
      .withColumn("days", datediff(col("o_orderdate"),
        lit("1992-01-01").cast("date")).cast("long"))
    // z-value bijectivity: de-interleave recovers both masked dims
    val z = orders.select(col("o_custkey"), col("days"),
      sources.SourceQueries.zorder(col("o_custkey"), col("days")).as("zkey"))
    val bad = z.filter({
      val xBack = (0 until 16).map(i =>
        shiftleft(shiftright(col("zkey"), 2 * i).bitwiseAND(lit(1L)), i))
        .reduce((a, b) => a.plus(b))
      val yBack = (0 until 16).map(i =>
        shiftleft(shiftright(col("zkey"), 2 * i + 1).bitwiseAND(lit(1L)), i))
        .reduce((a, b) => a.plus(b))
      xBack =!= col("o_custkey").bitwiseAND(lit(65535L)) ||
        yBack =!= col("days").bitwiseAND(lit(65535L))
    }).count()
    assert(bad == 0, "Morton interleave must be bijective on masked dims")
    // layouts at 64-file granularity: z-order vs 1-D custkey sort. The
    // z claim is BALANCE: a 1-D sort resolves its own dimension
    // perfectly and the other not at all (every file spans all days);
    // z-order resolves both to ~sqrt(files). Measured as file bounding
    // boxes intersecting single-dimension range predicates.
    orders.repartitionByRange(64,
        sources.SourceQueries.zorder(col("o_custkey"), col("days")))
      .write.mode("overwrite").parquet(s"$dir/z")
    orders.repartitionByRange(64, col("o_custkey"))
      .write.mode("overwrite").parquet(s"$dir/lin")
    def bounds(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("cmin"), max("o_custkey").as("cmax"),
        min("days").as("dmin"), max("days").as("dmax"))
      .collect()
    val (zB, linB) = (bounds(s"$dir/z"), bounds(s"$dir/lin"))
    val (cMax, dMax) = {
      val r = orders.agg(max("o_custkey"), max("days")).head()
      (r.getLong(0), r.getLong(1))
    }
    def touched(bs: Array[org.apache.spark.sql.Row],
        lo: Long, hi: Long, minIdx: Int, maxIdx: Int): Long =
      bs.count(r => r.getLong(maxIdx) >= lo && r.getLong(minIdx) <= hi).toLong
    // 1/16-wide ranges on each dimension, spread over the domain
    val cuts = Seq(1, 2, 3)
    val custZ = cuts.map(i => touched(zB, cMax * i / 4, cMax * i / 4 + cMax / 16, 1, 2)).sum
    val custL = cuts.map(i => touched(linB, cMax * i / 4, cMax * i / 4 + cMax / 16, 1, 2)).sum
    val dayZ = cuts.map(i => touched(zB, dMax * i / 4, dMax * i / 4 + dMax / 16, 3, 4)).sum
    val dayL = cuts.map(i => touched(linB, dMax * i / 4, dMax * i / 4 + dMax / 16, 3, 4)).sum
    // the 1-D layout is near-blind in its second dimension (files span
    // most of the day domain; small files can miss a narrow window by
    // chance, so "most", not "all")
    assert(dayL > 3L * linB.length / 2,
      s"custkey sort should be near-useless for day predicates: $dayL")
    // z-order serves the day dimension with a fraction of the files
    assert(dayZ < dayL / 2,
      s"z-order must prune day ranges: z=$dayZ lin(all)=$dayL")
    // and across BOTH workloads combined, z touches fewer boxes
    assert(custZ + dayZ < custL + dayL,
      s"z-order must win the combined workload: z=${custZ + dayZ} lin=${custL + dayL}")
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

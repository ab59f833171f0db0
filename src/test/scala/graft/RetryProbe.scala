package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Task-retry determinism probe — the fleet-reality check the in-suite
  * specs can't run: ScalaTest suites share one `local[4]` context, where
  * `spark.task.maxFailures` is 1 and any task failure aborts the job.
  * This main builds its own `local[4,2]` context (task retries ENABLED,
  * the cluster default shape) and injects a ONE-SHOT task failure into
  * the first stage of the d08 dedup composition via a chaos filter: the
  * first task to evaluate it throws, Spark reschedules the task, the
  * retry passes (the one-shot flag lives in the same JVM in local mode).
  *
  * Claim proved: a first-attempt task failure anywhere in the scan stage
  * leaves the dedup output BYTE-IDENTICAL to the clean run — the
  * speculative-execution / retry contract a 1000-executor run leans on,
  * complementing the partition-count invariance specs (placement) and
  * the streaming crash-restart specs (query-level recovery).
  *
  * Run: sbt 'Test/runMain graft.RetryProbe'; prints one JSON line,
  * recorded in SURVEY §8.
  */
object RetryProbe {

  object Chaos {
    val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4,2]") // 4 threads, maxFailures = 2 → one retry
      .appName("graft-retry-probe")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    def pipeline(docs: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
      val buckets = ops.Dedup.lshBuckets(docs, "doc_id", "text",
        shingleWords = 3, bands = 4, rowsPerBand = 2)
      ops.Dedup.connectedComponents(ops.Dedup.candidatePairs(buckets))
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
        .collect().toSeq
    }

    val clean = pipeline(Tables.documents(spark, dir))

    val boom = udf { (_: Long) =>
      if (Chaos.armed.compareAndSet(true, false)) {
        Chaos.fired.incrementAndGet()
        throw new RuntimeException("chaos: injected first-attempt task failure")
      }
      true
    }
    Chaos.armed.set(true)
    val chaotic = pipeline(
      Tables.documents(spark, dir).filter(boom(col("doc_id"))))

    val identical = clean == chaotic
    require(Chaos.fired.get() == 1, s"chaos did not fire exactly once: ${Chaos.fired.get()}")
    require(clean.nonEmpty, "pipeline trivially empty")
    require(identical, "task retry changed the dedup output")

    // scenario 2: the failure lands in a REDUCE-side task — after the
    // candidate-pair self-join shuffle — so the retry must re-fetch
    // shuffle blocks and recompute a reducer partition, not just re-scan
    // an input split. Same one-shot chaos, applied to the pairs stream
    // feeding connected components.
    val scan = Chaos.fired.get()
    Chaos.armed.set(true)
    val buckets2 = ops.Dedup.lshBuckets(Tables.documents(spark, dir), "doc_id", "text",
      shingleWords = 3, bands = 4, rowsPerBand = 2)
    val pairs2 = ops.Dedup.candidatePairs(buckets2)
      .filter(boom(col("id_a"))) // post-shuffle: the joined pair ids
    val chaotic2 = ops.Dedup.connectedComponents(pairs2)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id").collect().toSeq
    val identical2 = clean == chaotic2
    require(Chaos.fired.get() == scan + 1,
      s"reduce-side chaos did not fire exactly once: ${Chaos.fired.get()}")
    require(identical2, "reduce-side task retry changed the dedup output")

    // scenario 3: the failure lands in a WRITE TASK of the DSv2 manifest
    // sink (x15's connector) — the attempt has already streamed rows into
    // its staging file when it dies mid-partition. DataWriter.abort()
    // deletes the orphan, the retried attempt stages a fresh file, and
    // the job-level commit publishes exactly one file per partition; the
    // reader (manifest-only) must see the clean dataset with no
    // duplicate and no missing rows.
    val sinkDir = Scratch.dir("graft_retry_sink")
    val sinkIn = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(3, col("doc_id")) // several parallel writers; one dies
    Chaos.armed.set(true)
    sinkIn.filter(boom(col("doc_id")))
      .write.format("graft-manifest-sink").option("path", sinkDir)
      .mode("overwrite").save()
    require(Chaos.fired.get() == scan + 2,
      s"write-side chaos did not fire exactly once: ${Chaos.fired.get()}")
    val expected = sinkIn.orderBy("doc_id").collect().toSeq
    val committed = graft.sources.ManifestSink.committedFiles(sinkDir)
    val gotBack = spark.read
      .schema("doc_id LONG, source STRING, n_chars LONG")
      .option("sep", "\t").csv(committed: _*)
      .orderBy("doc_id").collect().toSeq
    val sinkExact = gotBack == expected
    require(sinkExact, s"sink retry corrupted output: ${gotBack.size} vs ${expected.size} rows")
    // the failed attempt's staging file must be GONE — disk holds exactly
    // the manifest's files plus the manifest itself
    val onDisk = new java.io.File(sinkDir).listFiles().map(_.getName).toSet
    val published = committed.map(f => new java.io.File(f).getName).toSet
    require(onDisk == published + "_graft_manifest",
      s"orphan staging files survived: ${onDisk -- published}")

    println(s"""{"metric":"retry_probe","task_failures_injected":${Chaos.fired.get()},""" +
      s""""rows":${clean.size},"identical_after_scan_retry":$identical,""" +
      s""""identical_after_reduce_retry":$identical2,""" +
      s""""sink_exact_after_write_retry":$sinkExact,""" +
      s""""sink_files_published":${published.size}}""")
    spark.stop()
  }
}

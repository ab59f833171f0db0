package graft

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-LOSS chaos probe — the other fleet failure mode beside
  * speculation (SpeculationProbe): on a 1000-executor cluster, machines
  * DIE mid-job, taking their running tasks AND their shuffle blocks with
  * them. A probe on `local[*]` cannot exercise this (one JVM — killing
  * "an executor" kills the driver), so this reuses
  * [[org.apache.spark.deploy.GraftMiniCluster]]'s two real executor JVMs
  * and halts one (`Runtime.halt` — no shutdown hooks, the closest
  * in-process stand-in for a machine loss) from inside a running task.
  * The one-shot trigger is an atomically-created marker FILE, not a
  * static flag: a static re-arms in the replacement executor JVM and a
  * (partition, attempt) key re-arms on stage REATTEMPTS — exactly the
  * runs this probe creates.
  *
  * Claims proved, each asserted:
  *  1. At least one executor was actually removed per scenario (listener
  *     on onExecutorRemoved — the probe cannot pass vacuously).
  *  2. Manifest sink (x15's DSv2 two-phase-commit sink): after a mid-write
  *     executor death, committed data is EXACTLY the input — the killed
  *     attempt's rows are neither lost nor duplicated (commit coordinator
  *     + retry on the survivor / relaunched executor) — and no orphan
  *     staging file survives the job-scoped commit-time GC (the killed
  *     attempt's stage- file is same-job residue; ManifestSink sweeps it).
  *  3. Shuffle recovery: an aggregation whose upstream shuffle blocks
  *     lived (in part) on the dead executor still returns the exact
  *     result, AND at least one stage was resubmitted — lost map outputs
  *     really were recomputed, not never-lost (fetch-failure and
  *     reattempt counts reported; measured 9 / 4, identical across runs).
  *
  * The standalone worker relaunches the executor after the halt, so the
  * probe waits for two live executors between scenarios — scenario 3's
  * kill must not leave the app executor-less by racing scenario 2's
  * relaunch.
  *
  * Run: SPARK_HOME=/opt/spark sbt package Test/package
  *      'Test/runMain graft.ExecutorLossProbe'
  * Prints one JSON line, recorded in SURVEY §8.
  */
object ExecutorLossProbe {

  /** halt THIS executor JVM once per marker file (atomic createNewFile
    * arbitrates across executor JVMs and stage reattempts). */
  private def haltOnce(flag: String): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && new File(flag).createNewFile()) Runtime.getRuntime.halt(42)
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "run with SPARK_HOME=/opt/spark — the workers launch real executors")
    val jars = new File("target/scala-2.13").listFiles()
      .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath)
    require(jars.length >= 2, "run sbt package Test/package first")
    val masterUrl = org.apache.spark.deploy.GraftMiniCluster.start(
      coresPerWorker = 4, memMb = 1024, Scratch.dir("graft_exloss_work"))
    val spark = SparkSession.builder()
      .master(masterUrl)
      .appName("graft-executor-loss-probe")
      .config("spark.jars", jars.mkString(","))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a halted executor must not fail the job before the retry works:
      // defaults (4 task failures, 10 executor retries) already suffice —
      // pinned here so a default change cannot silently soften the probe
      .config("spark.task.maxFailures", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    val fetchFails = new java.util.concurrent.atomic.AtomicInteger(0)
    val reattempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onExecutorAdded(
          e: org.apache.spark.scheduler.SparkListenerExecutorAdded): Unit =
        { live.add(e.executorId); () }
      override def onExecutorRemoved(
          e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
        { live.remove(e.executorId); removed.incrementAndGet(); () }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        e.reason match {
          case _: org.apache.spark.FetchFailed => fetchFails.incrementAndGet(); ()
          case _ => ()
        }
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (e.stageInfo.attemptNumber() > 0) { reattempts.incrementAndGet(); () }
    })
    def awaitExecutors(n: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (live.size < n && System.nanoTime() < deadline) Thread.sleep(200)
      require(live.size >= n, s"only ${live.size} executors re-registered")
    }
    awaitExecutors(2)

    // ---------- scenario 1: manifest sink write, executor dies mid-write
    val flag1 = Scratch.dir("graft_exloss_flags") + "/kill1"
    val sinkDir = Scratch.dir("graft_exloss_sink")
    val chaos1 = udf { (id: Long) => haltOnce(flag1); id }.asNondeterministic()
    val removedBefore1 = removed.get()
    spark.range(0, 800)
      .repartition(8)
      .select(chaos1(col("id")).as("k"), concat(lit("v"), col("id")).as("v"))
      .write.format("graft-manifest-sink").option("path", sinkDir)
      .mode("overwrite").save()
    val lost1 = removed.get() - removedBefore1
    val read = spark.read.schema("k LONG, v STRING").option("sep", "\t")
      .csv(sources.ManifestSink.committedFiles(sinkDir): _*)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(read.length == 800,
      s"sink rows ${read.length} != 800 — the dead executor's rows were lost or doubled")
    assert(read.map(_._1).toSeq == (0L until 800L), "sink ids are not exactly 0..799")
    val staged = Option(new File(sinkDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("stage-")).toSet
    val published = sources.ManifestSink.committedFiles(sinkDir)
      .map(f => new File(f).getName).toSet
    assert(staged == published,
      s"orphan staging from the killed attempt survived commit: ${staged -- published}")
    assert(lost1 >= 1, "no executor was removed in scenario 1 — probe vacuous")

    // ---------- scenario 2: shuffle recovery — the dead executor held
    // upstream map outputs; the aggregation must still be exact
    awaitExecutors(2)
    val flag2 = Scratch.dir("graft_exloss_flags") + "/kill2"
    val chaos2 = udf { (id: Long) => haltOnce(flag2); id }.asNondeterministic()
    val removedBefore2 = removed.get()
    val agg = spark.range(0, 200000)
      .repartition(16)                          // stage 1: map outputs on BOTH executors
      .select(chaos2(col("id")).as("id"))       // stage 2 starts → one executor halts
      .groupBy((col("id") % 10).as("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val lost2 = removed.get() - removedBefore2
    val expect = (0L until 200000L).groupBy(_ % 10)
      .map { case (k, v) => (k, v.sum, v.size.toLong) }.toSeq.sortBy(_._1)
    assert(agg.toSeq == expect,
      s"aggregation diverged after executor loss: ${agg.take(2).toSeq} vs ${expect.take(2)}")
    assert(lost2 >= 1, "no executor was removed in scenario 2 — probe vacuous")
    // the dead executor held ~half the stage-1 map outputs, so the retried
    // reduce tasks MUST fetch-fail and resubmit the map stage — without
    // this the scenario would pass even if no shuffle block was ever lost
    // (measured: 9 fetch-failed tasks / 4 reattempts, identical across runs)
    assert(reattempts.get() >= 1,
      "no stage was resubmitted — the shuffle-loss path was never exercised")

    println(s"""{"metric":"executor_loss_probe","sink_rows":${read.length},""" +
      s""""sink_orphans":${(staged -- published).size},"executors_lost_sink":$lost1,""" +
      s""""agg_exact":true,"executors_lost_shuffle":$lost2,""" +
      s""""fetch_failed_tasks":${fetchFails.get()},"resubmitted_stage_attempts":${reattempts.get()}}""")
    spark.stop()
    org.apache.spark.deploy.GraftMiniCluster.stop()
  }
}

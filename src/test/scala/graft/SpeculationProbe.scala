package graft

import java.io.File
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Speculative-execution chaos probe — the reference's ACTUAL historical
  * clobber mode (SURVEY §3.3: a speculative twin of a straggling mapper
  * double-writing the shared output dir), exercised under its actual
  * trigger against the two output paths that must survive it: the
  * external pipe (a02's operator) and the DataSourceV2 manifest sink
  * (x15).
  *
  * Spark hard-disables speculation in `local[*]` (TaskSchedulerImpl.start
  * gates the speculation scheduler on !isLocal), and `local-cluster[...]`
  * is not enough either: every worker there shares ONE hostname, and the
  * scheduler refuses to place a speculative attempt on the original
  * attempt's host (dequeueSpeculativeTask's host exclusion), so
  * single-host clusters mark stragglers speculatable but never launch
  * the copy (observed directly in this probe's first iteration). The
  * probe therefore builds [[org.apache.spark.deploy.GraftMiniCluster]]:
  * an in-process standalone master with one worker each on 127.0.0.1
  * and 127.0.0.2 (loopback aliases — one machine, two host identities,
  * real executor JVMs from this machine's SPARK_HOME dist), with
  * aggressive speculation (100 ms interval, quantile 0.4, multiplier
  * 1.5, efficiency gate off — a SLEEPING straggler's data-process rate
  * looks fine to the 3.4+ efficiency heuristic, which would veto
  * exactly this scenario) and plants a deterministic straggler:
  * partition 0's FIRST attempt sleeps 8 s (keyed on
  * TaskContext.attemptNumber == 0, which is executor-JVM-agnostic — a
  * static chaos flag would re-arm in each executor and put the
  * speculative twin to sleep too), so the scheduler launches a
  * speculative copy that wins.
  *
  * Claims proved, each asserted:
  *  1. At least one speculative attempt actually launched per scenario
  *     (driver-side listener on `taskInfo.speculative`).
  *  2. Manifest sink: committed data is EXACTLY the input (no
  *     duplicate rows from the losing attempt — the commit coordinator
  *     admits one attempt per partition, and only driver commit
  *     publishes), and no orphan staging file survives (the loser's
  *     file is job-scoped and swept at commit).
  *  3. External pipe: output equals the expected transform exactly once
  *     — the per-ATTEMPT staging dirs (`attempt<taskAttemptId>`) keep
  *     the twin attempts' temp files disjoint while both children run
  *     concurrently, the exact collision the reference's taskId-keyed
  *     staging could not survive.
  *
  * Run: SPARK_HOME=/opt/spark sbt 'Test/runMain graft.SpeculationProbe'
  * (package + Test/package first — executors load app classes from
  * spark.jars). Prints one JSON line, recorded in SURVEY §8.
  */
object SpeculationProbe {

  /** once-per-task-attempt straggler guard (per-executor static is fine:
    * keyed by the globally unique taskAttemptId). */
  object Chaos {
    val slept: java.util.Set[java.lang.Long] =
      ConcurrentHashMap.newKeySet[java.lang.Long]()
  }

  private def chaosSleepOnce(ms: Long): Unit = {
    val tc = TaskContext.get()
    if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
      Chaos.slept.add(tc.taskAttemptId()))
      Thread.sleep(ms)
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "run with SPARK_HOME=/opt/spark — the workers launch real executors")
    val jars = new File("target/scala-2.13").listFiles()
      .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath)
    require(jars.length >= 2, "run sbt package Test/package first")
    val masterUrl = org.apache.spark.deploy.GraftMiniCluster.start(
      coresPerWorker = 4, memMb = 1024, Scratch.dir("graft_spec_work"))
    val spark = SparkSession.builder()
      .master(masterUrl)
      .appName("graft-speculation-probe")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.4")
      // the 3.4+ efficiency gate vetoes speculation for tasks whose
      // data-process rate looks fine — a SLEEPING straggler processed
      // its few rows fast, so the gate would suppress exactly the
      // scenario under test; disable it so runtime alone triggers
      .config("spark.speculation.efficiency.enabled", "false")
      .config("spark.jars", jars.mkString(","))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.TaskSetManager", org.apache.logging.log4j.Level.DEBUG)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.TaskSchedulerImpl", org.apache.logging.log4j.Level.DEBUG)
    import spark.implicits._

    val specTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskStart(
          e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        if (e.taskInfo.speculative) { specTasks.incrementAndGet(); () }
    })

    // ---------- scenario 1: manifest sink with a straggling write task
    val sinkDir = Scratch.dir("graft_spec_sink")
    val straggle = udf { (id: Long) => chaosSleepOnce(8000); id }.asNondeterministic()
    val specBefore1 = specTasks.get()
    spark.range(0, 800)
      .repartition(8)
      .select(straggle(col("id")).as("k"),
        concat(lit("v"), col("id")).as("v"))
      .write.format("graft-manifest-sink").option("path", sinkDir)
      .mode("overwrite").save()
    val sinkSpec = specTasks.get() - specBefore1
    val read = spark.read.schema("k LONG, v STRING").option("sep", "\t")
      .csv(sources.ManifestSink.committedFiles(sinkDir): _*)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(read.length == 800,
      s"sink rows ${read.length} != 800 — a speculative twin duplicated or lost rows")
    assert(read.map(_._1).toSeq == (0L until 800L),
      "sink ids are not exactly 0..799")
    val staged = Option(new File(sinkDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("stage-")).toSet
    val published = sources.ManifestSink.committedFiles(sinkDir)
      .map(f => new File(f).getName).toSet
    assert(staged == published,
      s"orphan staging from the losing attempt: ${staged -- published}")
    assert(sinkSpec >= 1,
      "no speculative attempt launched for the sink write — probe vacuous")

    // ---------- scenario 2: the external pipe with a straggling partition
    import graft.pipe.{ExternalPipeline, PipeConfig}
    val bin = java.nio.file.Files.createTempDirectory("graft-spec-bin")
    def script(name: String, body: String): Unit = {
      val p = bin.resolve(name)
      java.nio.file.Files.writeString(p, "#!/bin/sh\n" + body + "\n")
      java.nio.file.Files.setPosixFilePermissions(p,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwxr-xr-x"))
    }
    script("read.sh", """cp "$2" "$3"""")
    script("upper.sh", """tr a-z A-Z < "$2" > result.txt""")
    val cfg = PipeConfig.parse(
      s"""{
         |  "stage_dir" : "${Scratch.dir("graft_spec_stage")}",
         |  "mcr_root" : "/opt/fake_mcr",
         |  "mcr_cache_root" : "/tmp/graft_spec_cache",
         |  "algorithms" : [
         |    {"name":"UP", "binary_dir" : "$bin",
         |     "executables" : [
         |       {"command" : "read.sh %MCR_ROOT% %INPUT_FILE% %TMP_MAT_FILE_1%"},
         |       {"command" : "upper.sh %MCR_ROOT% %TMP_MAT_FILE_1%"}
         |     ],
         |     "hdfs_in_dir" : "/unused", "hdfs_out_dir" : "/unused"}
         |  ]
         |}""".stripMargin)
    val rows = (0 until 200).map(i => f"row$i%04d data")
    val specBefore2 = specTasks.get()
    val ds = spark.createDataset(rows).repartition(8)
      .map { s => chaosSleepOnce(8000); s }
    val out = ExternalPipeline.run(ds, None, cfg.algorithm("UP"), cfg.globals)
      .as[(String, String)].collect()
    val pipeSpec = specTasks.get() - specBefore2
    val got = out.map(_._2).sorted.toSeq
    val expect = rows.map(_.toUpperCase).sorted
    assert(got == expect,
      s"pipe output diverged under speculation: got ${got.length} rows, " +
        s"first diff ${got.diff(expect).take(2)}")
    assert(pipeSpec >= 1,
      "no speculative attempt launched for the pipe stage — probe vacuous")

    println(s"""{"metric":"speculation_probe","sink_rows":${read.length},""" +
      s""""sink_speculative_tasks":$sinkSpec,"sink_orphans":${(staged -- published).size},""" +
      s""""pipe_rows":${got.length},"pipe_speculative_tasks":$pipeSpec,""" +
      s""""pipe_exact":true}""")
    spark.stop()
    org.apache.spark.deploy.GraftMiniCluster.stop()
  }
}

package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p02 under EXECUTOR LOSS — the r9 verdict's task 7. admitBatch leans
  * on eager `localCheckpoint(true)` boundaries, and localCheckpoint
  * blocks die with their executor: a mid-delta machine loss can
  * therefore fail the delta job after some store appends already
  * landed — exactly the partial-state window the append-order contract
  * (bands → shingles → exact marker LAST) plus full-delta retry is
  * documented to cover. IncrementalSpec drills that contract with a
  * SIMULATED partial state; this probe triggers it with a REAL executor
  * JVM death on [[org.apache.spark.deploy.GraftMiniCluster]]'s two-host
  * standalone cluster.
  *
  * Protocol:
  *  1. control universe: store init + one clean delta on the healthy
  *     2-executor cluster; collect the admitted set and all three
  *     stores into driver memory.
  *  2. crash universe: identical init, then the same delta while a
  *     watcher thread kills one executor (SparkContext.killExecutors —
  *     the standalone preemption path; blocks are lost abruptly) the
  *     moment the FIRST store append's files appear — the
  *     between-appends window. Depending on where the loss lands the
  *     delta either recovers in-job (task retry on the survivor) or
  *     fails with missing checkpoint blocks; a failure is answered by
  *     the documented full-delta RETRY.
  *  3. convergence asserts: the crash universe's three stores are
  *     SET-equal to the control's, and the admitted ids derived from
  *     the band index (index ids beyond the corpus) match the
  *     control's — whichever arm ran.
  *  4. non-vacuity: ≥1 executor actually removed, and the removal
  *     happened before the drill's final asserts.
  *
  * Run: SPARK_HOME=/opt/spark sbt package Test/package
  *      'Test/runMain graft.P02LossProbe'
  * Prints one JSON line, recorded in BENCH_SCALE_r10 / SURVEY §8.
  */
object P02LossProbe {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "run with SPARK_HOME=/opt/spark — the workers launch real executors")
    val jars = new File("target/scala-2.13").listFiles()
      .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath)
    require(jars.length >= 2, "run sbt package Test/package first")
    val masterUrl = org.apache.spark.deploy.GraftMiniCluster.start(
      coresPerWorker = 4, memMb = 1536, Scratch.dir("graft_p02loss_work"))
    val spark = SparkSession.builder()
      .master(masterUrl)
      .appName("graft-p02-loss-probe")
      .config("spark.jars", jars.mkString(","))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.task.maxFailures", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onExecutorAdded(
          e: org.apache.spark.scheduler.SparkListenerExecutorAdded): Unit =
        { live.add(e.executorId); () }
      override def onExecutorRemoved(
          e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
        { live.remove(e.executorId); removed.incrementAndGet(); () }
    })
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (live.size < 2 && System.nanoTime() < deadline) Thread.sleep(200)
    require(live.size >= 2, s"only ${live.size} executors registered")

    // synthetic planted universe — PURE LINEAGE (range + expressions, no
    // persist of source data): after the kill, every re-derivation must
    // be recomputable without blocks from the dead executor
    def universe: DataFrame = spark.range(200)
      .select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(1, 25), " +
          "i -> substr(md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 5)))")
          .as("text"))
      .select(col("doc_id"), expr(ops.Incremental.plantSqlForProbe).as("t"))
    def batchOf(docs: DataFrame): DataFrame =
      docs.filter(col("doc_id") % 11 === 5 && col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("t"))
    def corpusOf(docs: DataFrame): DataFrame = docs.filter(col("doc_id") % 11 =!= 5)

    // ---------- control universe on the healthy cluster
    val (iC, eC, sC) = ops.Incremental.initStores(spark, corpusOf(universe), "p02loss_ctl")
    val (rowC, _) = ops.Incremental.admitBatch(spark, batchOf(universe),
      "delta", 0L, iC, eC, sC)
    val ctlCensus = rowC.collect()(0)
    require(ctlCensus.getAs[Long]("n_admitted") > 0, "control admitted nothing — vacuous")
    val corpusIds = rows(corpusOf(universe).select("doc_id"))
    val ctlIdx = rows(spark.table(iC))
    val ctlSh = rows(spark.read.schema("id LONG, h LONG").parquet(sC))
    val ctlEx = rows(spark.read.schema("h STRING").parquet(eC))
    val ctlAdmitted = rows(spark.table(iC).select(col("id")).distinct())
      .map(_.replace("[", "").replace("]", ""))
      .filterNot(id => corpusIds.contains(s"[$id]"))

    // ---------- crash universe: kill one executor the moment the first
    // store append lands (the between-appends window)
    val (iA, eA, sA) = ops.Incremental.initStores(spark, corpusOf(universe), "p02loss_crash")
    val shFiles0 = Option(new File(sA).listFiles()).map(_.length).getOrElse(0)
    val idxDir = spark.sql(s"DESCRIBE FORMATTED $iA").collect()
      .find(_.getString(0).trim == "Location").map(_.getString(1))
      .getOrElse(sys.error("band index location not found"))
      .replaceFirst("^file:", "")
    val idxFiles0 = Option(new File(idxDir).listFiles()).map(_.length).getOrElse(0)

    @volatile var killedAt = ""
    @volatile var drillDone = false
    val watcher = new Thread(() => {
      while (!drillDone && killedAt.isEmpty) {
        val idxGrew = Option(new File(idxDir).listFiles()).map(_.length).getOrElse(0) > idxFiles0
        val shGrew = Option(new File(sA).listFiles()).map(_.length).getOrElse(0) > shFiles0
        if (idxGrew || shGrew) {
          val victim = live.iterator().next()
          spark.sparkContext.killExecutors(Seq(victim))
          killedAt = if (shGrew) "after_shingle_append" else "after_band_append"
        } else Thread.sleep(10)
      }
    })
    watcher.setDaemon(true)
    watcher.start()

    val attempt1 = scala.util.Try {
      val (row, _) = ops.Incremental.admitBatch(spark, batchOf(universe),
        "delta", 0L, iA, eA, sA)
      row.collect()
    }
    drillDone = true
    watcher.join(2000)
    require(killedAt.nonEmpty, "watcher never fired — no append was observed")
    require(removed.get() >= 1, "no executor was actually removed — probe vacuous")

    // the documented recovery: a failed delta is retried WHOLE against
    // whatever partial state the crash left (marker-last append order +
    // the batch-id residue guard make the retry idempotent)
    val retried = attempt1.isFailure
    if (retried) {
      spark.catalog.clearCache()
      val (row2, _) = ops.Incremental.admitBatch(spark, batchOf(universe),
        "delta", 0L, iA, eA, sA)
      row2.collect(): Unit
    }

    // convergence: stores set-equal to the healthy control, whichever arm
    assert(rows(spark.table(iA)) == ctlIdx,
      "band index diverged from the healthy control after executor loss")
    assert(rows(spark.read.schema("id LONG, h LONG").parquet(sA)) == ctlSh,
      "shingle store diverged after executor loss")
    assert(rows(spark.read.schema("h STRING").parquet(eA)) == ctlEx,
      "exact store diverged after executor loss")
    val crashAdmitted = rows(spark.table(iA).select(col("id")).distinct())
      .map(_.replace("[", "").replace("]", ""))
      .filterNot(id => corpusIds.contains(s"[$id]"))
    assert(crashAdmitted == ctlAdmitted,
      s"admitted set diverged: $crashAdmitted vs $ctlAdmitted")

    println(s"""{"metric":"p02_executor_loss_probe","executors_removed":${removed.get()},""" +
      s""""killed_at":"$killedAt","attempt1_failed":$retried,""" +
      s""""stores_converged":true,"admitted_ids":${crashAdmitted.size},""" +
      s""""control_admitted":${ctlAdmitted.size}}""")
    spark.stop()
    org.apache.spark.deploy.GraftMiniCluster.stop()
  }
}

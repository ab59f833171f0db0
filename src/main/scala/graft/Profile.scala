package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-loop measurement harness (guide §1: measure first). Runs the named
  * queries exactly like `Bench` (same session, same `.count()` action) but
  * records every Spark job/stage via a listener and prints a per-job
  * breakdown: wall, task count, task time, input / shuffle-read /
  * shuffle-write bytes, and the job's call site. This is how a 10 s
  * lifecycle query gets decomposed into its phases without the (disabled)
  * UI. Not part of the driver contract; not benched; changes nothing.
  *
  * Usage: sbt "runMain graft.Profile p02" [env SPARK_GRAFT_SF_DIR]
  */
object Profile {
  final case class JobRow(id: Int, var desc: String, var start: Long,
      var end: Long, var tasks: Int, var taskTime: Long, var input: Long,
      var shRead: Long, var shWrite: Long, var stages: mutable.Buffer[String],
      var gc: Long = 0L, var deser: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(parallelism = cpus, appName = "graft-profile")
    val only = args.lift(0).map(_.split(',').toSeq).getOrElse(Seq())
    val names = SparkEntry.benchNames.filter(n => only.exists(n.startsWith))

    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(js.jobId) = JobRow(js.jobId, desc, js.time, 0L, 0, 0L, 0L, 0L, 0L,
          mutable.Buffer())
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = sc.stageInfo
          for (jid <- stageToJob.get(si.stageId); j <- jobs.get(jid)) {
            j.tasks += si.numTasks
            j.taskTime += si.taskMetrics.executorRunTime
            j.input += si.taskMetrics.inputMetrics.bytesRead
            j.shRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.gc += si.taskMetrics.jvmGCTime
            j.deser += si.taskMetrics.executorDeserializeTime
            val sw = (si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)) / 1e3
            j.stages += f"S${si.stageId}%d n=${si.numTasks}%d w=$sw%.2f " +
              f"tt=${si.taskMetrics.executorRunTime / 1e3}%.1f " +
              si.name.takeWhile(_ != '\n').take(56)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // one warm pass at the small SF (Bench parity), then the timed pass
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count() catch { case _: Throwable => () }
    }
    names.foreach { name =>
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; drain until every submitted job has its
      // end event (ADVICE r14: a fixed sleep under-attributed late
      // events), bounded at 5 s. Skipped stages are not attributed.
      val deadline = System.nanoTime() + 5_000_000_000L
      while (jobs.synchronized { jobs.values.exists(_.end == 0L) } &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
      val rows = jobs.synchronized { jobs.values.toVector }
      println(f"%nPROFILE $name wall=$wall%.2f s  jobs=${rows.size}")
      println(f"${"job"}%4s ${"wall_s"}%7s ${"tasks"}%6s ${"taskT_s"}%8s " +
        f"${"gc_s"}%6s ${"deser_s"}%7s " +
        f"${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s  first-stage")
      val gap = wall - rows.map(r => (r.end - r.start) / 1e3).sum
      rows.foreach { r =>
        val w = (r.end - r.start) / 1e3
        def mb(b: Long) = f"${b / 1048576.0}%8.1fM"
        println(f"${r.id}%4d $w%7.3f ${r.tasks}%6d ${r.taskTime / 1e3}%8.2f " +
          f"${r.gc / 1e3}%6.2f ${r.deser / 1e3}%7.2f " +
          f"${mb(r.input)} ${mb(r.shRead)} ${mb(r.shWrite)}  " +
          (if (r.desc.nonEmpty) s"[${r.desc.take(40)}]" else ""))
        r.stages.foreach(st => println("        " + st))
      }
      println(f"PROFILE $name driver-side (outside jobs) = $gap%.2f s")
      // driver hotspots: gaps between consecutive jobs > 100 ms, labeled
      // with the NEXT job's call site (what the driver was preparing)
      rows.sliding(2).foreach {
        case Seq(a, b) =>
          val g = (b.start - a.end) / 1e3
          if (g > 0.1)
            println(f"  GAP $g%6.2f s before job ${b.id}%4d " +
              b.stages.headOption.getOrElse("").replaceAll("S\\d+ n=\\d+ w=[\\d.]+ tt=[\\d.]+ ", "") +
              (if (b.desc.nonEmpty) s" [${b.desc.take(40)}]" else ""))
        case _ => ()
      }
      // store-layout evidence (guide §6): what landed in this query's
      // scratch dirs — file counts expose small-file storms from e.g.
      // bucketed writes fanning out nTasks × nBuckets files
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      val dirs = Option(tmp.listFiles()).getOrElse(Array())
        .filter(f => f.isDirectory && f.getName.startsWith("graft"))
      def walk(f: java.io.File): (Int, Long) = {
        if (f.isFile) (1, f.length())
        else Option(f.listFiles()).getOrElse(Array())
          .map(walk).foldLeft((0, 0L)) { case ((c1, b1), (c2, b2)) =>
            (c1 + c2, b1 + b2) }
      }
      dirs.sortBy(_.getName).foreach { d =>
        val (files, bytes) = walk(d)
        if (files > 0)
          println(f"  SCRATCH ${d.getName}%-44s files=$files%5d bytes=${bytes / 1024}%8dK")
      }
    }
    spark.stop()
  }
}

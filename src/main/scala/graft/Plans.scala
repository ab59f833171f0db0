package graft

/** Dump `.explain("formatted")` for the named declared queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  * Dev-loop only; not part of the driver contract.
  *
  * Usage: sbt "runMain graft.Plans <outDir> <suffix> <prefix,prefix,...>"
  * Writes `<outDir>/<query>_<suffix>.txt`. SPARK_GRAFT_SF_DIR picks the
  * data (plan SHAPE is SF-independent; sf0.001 keeps the dump fast, but
  * note AQE prints isFinalPlan=false pre-execution either way).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val prefixes = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(parallelism = cpus, appName = "graft-plans")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.benchNames ++
      SparkEntry.queries.keys.filterNot(SparkEntry.benchNames.contains)
    names.filter(n => prefixes.exists(n.startsWith)).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        println(s"PLANS wrote $name")
      } catch { case e: Throwable =>
        Console.err.println(s"PLANS $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

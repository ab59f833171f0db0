package graft

import graft.pipe.{ExternalPipeline, PipeGlobals, PipelineSpec}
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Remaining B6/pipe surfaces: partition-local sort, pipe timeouts. */
class MiscOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("driver entry smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sortWithinPartitions orders rows inside each partition only") {
    val df = spark.createDataset(Seq(5, 3, 9, 1, 7, 2, 8, 4)).toDF("v")
      .repartition(2)
      .sortWithinPartitions(col("v"))
    val perPartition = df.as[Int].mapPartitions(it => Iterator(it.toList)).collect()
    perPartition.foreach(p => assert(p == p.sorted, s"partition not sorted: $p"))
    assert(perPartition.flatten.sorted.toList == List(1, 2, 3, 4, 5, 7, 8, 9))
  }

  test("pipe timeout kills a hung child and fails the task") {
    val d = java.nio.file.Files.createTempDirectory("timeout-bin")
    val p = d.resolve("hang.sh")
    java.nio.file.Files.writeString(p, "#!/bin/sh\nsleep 60\n")
    p.toFile.setExecutable(true)
    val spec = PipelineSpec("hang", d.toString, Seq("hang.sh %MCR_ROOT% %INPUT_FILE%"), "", "")
    val globals = PipeGlobals(
      java.nio.file.Files.createTempDirectory("timeout-stage").toString, "mcr", "/tmp")
    val t0 = System.nanoTime()
    val e = intercept[SparkException] {
      ExternalPipeline.run(spark.createDataset(Seq("x")), None, spec, globals,
        timeoutSec = 2).collect()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30, s"timeout did not fire promptly ($secs s)")
    assert(e.getMessage.contains("timed out") ||
      Option(e.getCause).exists(_.getMessage.contains("timed out")))
  }
}

package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-6 items: the t12 scale repair (distributed two-phase prefix sum
  * replacing the one-task-per-source window) pinned by both an agreement
  * spec and plan evidence. */
class RoundSixSpec extends SparkTestBase {
  import spark.implicits._

  test("distributedPrefixSum equals the window prefix sum exactly " +
    "(single huge source, many partitions)") {
    // one source — the shape that collapses Window.partitionBy(source)
    // to a single task — with irregular values
    val df = spark.range(10000)
      .select($"id", lit("web").as("src"), ($"id" % 97 + 1).as("v"))
    val got = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("distributedPrefixSum: multi-group boundaries inside a partition " +
    "and empty-group edge behave exactly") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 5L), ("b", 2L, 7L)).toDF("src", "id", "v")
    val got = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      .select($"src", $"id", $"cum").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", 1L) -> 10L, ("a", 2L) -> 30L, ("a", 3L) -> 60L,
      ("b", 1L) -> 5L, ("b", 2L) -> 12L))
  }

  test("t12 scale contract: the data-stream window partitions on " +
    "(partition_id, source) — parallelism is the partition count, not " +
    "the source count") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = spark.range(10000)
        .select($"id", lit("web").as("src"), ($"id" % 7 + 1).as("v"))
      val res = TextAnalysis.distributedPrefixSum(df, "src", "id", "v", "cum")
      val wins = castToImpl(res).queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty, "expected window nodes in the prefix-sum plan")
      // the row-stream window must key on TWO expressions (pid, group):
      // thousands of small window partitions, never one-per-source
      val dataWins = wins.filter(_.partitionSpec.size == 2)
      assert(dataWins.nonEmpty,
        s"no (partition_id, group) window found:\n${wins.map(_.partitionSpec)}")
      // the pid column is materialized (persisted) before the window, so
      // the key shows as the `_pid` attribute, not SPARK_PARTITION_ID()
      assert(dataWins.exists(_.partitionSpec.exists(
        _.toString.contains("_pid"))),
        s"data window does not key on the partition id:\n${dataWins.map(_.partitionSpec)}")
      // any single-key window must sit on the AGGREGATED subtotal table
      // (≤ partitions × groups rows), never the raw row stream
      val narrowWins = wins.filter(_.partitionSpec.size == 1)
      narrowWins.foreach { w =>
        val overAgg = w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }.isDefined
        assert(overAgg,
          s"single-key window runs over the raw stream (one task per source):\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("t12 scale contract: one source really spans many range partitions") {
    val parts = spark.sessionState.conf.numShufflePartitions
    val df = spark.range(10000)
      .select($"id", lit("web").as("src"), lit(1L).as("v"))
      .repartitionByRange(parts, $"src", $"id")
      .select(spark_partition_id().as("p"))
    val distinctPids = df.distinct().count()
    assert(distinctPids > 1,
      s"range partitioning put the whole source in $distinctPids partition(s)")
  }
}

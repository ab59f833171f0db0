package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

/** Dev probe for the t13 skew spec: prints scan partition counts, the
  * executed plan, and whether the skew split fired. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(4)
    import spark.implicits._
    Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "16384")
      .foreach { case (k, v) => spark.conf.set(k, v) }
    val hot = Array.fill(290)("the").mkString(" ")
    val docs = spark.range(4000).select(
      $"id".as("doc_id"),
      concat_ws(" ", lit(hot), concat(lit("u"), $"id"),
        concat(lit("v"), $"id")).as("text"),
      lit("en").as("lang"), lit("web").as("source"), lit(0L).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("skewprobe").toString
    docs.repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scan = spark.read.parquet(s"$dir/documents.parquet")
    println(s"=== scan partitions: ${scan.rdd.getNumPartitions}")

    // shape A: the PlanSpec-known-good downstream (global agg)
    val tok = scan.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val freq = tok.groupBy("term").agg(count(lit(1)).as("c"))
    val a = tok.join(freq, "term").agg(sum(col("c")).as("s"))
    a.collect()
    val pa = castToImpl(a).queryExecution.executedPlan.toString
    println(s"=== shapeA skew=true: ${pa.contains("skew=true")}")
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      })).flatMap(allNodes)
    allNodes(castToImpl(a).queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        println(s"=== stage ${s.id} mapStats: " +
          s.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none"))
    }

    // shape B: t13's downstream (groupBy doc_id)
    val b = tok.join(freq, "term").groupBy("doc_id").agg(sum(col("c")).as("s"))
    b.collect()
    val pb = castToImpl(b).queryExecution.executedPlan.toString
    println(s"=== shapeB skew=true: ${pb.contains("skew=true")}")

    // shape C: the full t13 query
    val df = SparkEntry.queries("t13_unigram_surprisal")(spark, dir)
    df.collect()
    val p = castToImpl(df).queryExecution.executedPlan.toString
    println(s"=== t13 skew=true: ${p.contains("skew=true")}")
    spark.stop()
  }
}

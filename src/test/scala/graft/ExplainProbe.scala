package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Dev probe: print a query's FINAL adaptive physical plan.
  * Usage: sbt 'Test/runMain graft.ExplainProbe q03_shipping_priority /root/testdata/sf0.1'
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q01_pricing_summary"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(castToImpl(df).queryExecution.executedPlan.toString)
    spark.stop()
  }
}

package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: heap top-k operator vs Spark's builtin WindowGroupLimit on
  * the sf0.1 lineitem (600k rows). Run: sbt "Test/runMain graft.TopKPerfProbe"
  */
object TopKPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(native: Boolean): Double = {
      val s2 = spark.newSession()
      if (native) TopKPerGroup.install(s2)
      val li = Tables.lineitem(s2, "/root/testdata/sf0.1")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val df = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      df.count() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.count())
      (System.nanoTime() - t0) / 3e9
    }
    val stock = run(native = false)
    val native = run(native = true)
    println(f"stock_window_group_limit=${stock}%.3f s  native_heap_topk=${native}%.3f s")
    spark.stop()
  }
}

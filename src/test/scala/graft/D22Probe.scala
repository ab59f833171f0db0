package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev probe: stage-by-stage WARM wall clock for the d22 exact-substring
  * pipeline. Usage: sbt 'Test/runMain graft.D22Probe /root/testdata/sf0.1'
  */
object D22Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(32, "graft-d22probe")
    def warmTime(label: String)(f: => Long): Unit = {
      f // warm
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[d22probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def g: DataFrame = Dedup.wordGramPositions(
      Tables.documents(spark, sfDir), "doc_id", "text", 8)
    def anchors = g.groupBy("h").agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd").between(2, 10)).select("h")
    def ag = g.join(anchors, Seq("h"), "left_semi")
    def cand = ag.filter(col("pos") % 13 === 0)
      .select(col("h"), col("id").as("id_s"))
      .join(ag.select(col("h"), col("id").as("id_o")), "h")
      .filter(col("id_s") =!= col("id_o"))
      .select(least(col("id_s"), col("id_o")).as("id_a"),
        greatest(col("id_s"), col("id_o")).as("id_b"))
      .distinct()

    warmTime("g (gram positions)")(g.count())
    warmTime("anchors")(anchors.count())
    warmTime("ag (semi)")(ag.count())
    warmTime("cand (strided)")(cand.count())
    warmTime("full d22")(
      SparkEntry.queries("d22_exact_substring")(spark, sfDir).count())
    spark.stop()
  }
}

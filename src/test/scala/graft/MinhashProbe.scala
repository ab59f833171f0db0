package graft

import org.apache.spark.sql.functions._

/** Dev probe: old 8-md5-per-shingle minhash vs Kirsch-Mitzenmacher
  * (1 md5 per shingle, 8 derived hashes). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(32, "graft-minhash-probe")
    val docs = Tables.documents(spark, sfDir).repartition(32).cache()
    docs.count()
    val k = 3
    val toks = docs.select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
    val sh = toks.select(col("id"),
      expr(s"transform(sequence(1, greatest(size(ws) - ${k - 1}, 1)), " +
        s"i -> concat_ws(' ', ${(0 until k).map(j => s"element_at(ws, i + $j)").mkString(", ")}))")
        .as("sh"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    time("old: 8 md5 per shingle") {
      sh.select(col("id"), ops.Dedup.minhashSignature(col("sh"), 8).as("mhs"))
        .select(expr("element_at(mhs, 1)")).agg(count(lit(1))).head().getLong(0)
    }
    val km = sh
      .withColumn("hv", expr(
        """transform(sh, s -> named_struct(
          |  'h1', cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint),
          |  'h2', cast(conv(substring(md5(s), 9, 8), 16, 10) as bigint)))""".stripMargin))
      .select(col("id"), expr(
        "transform(sequence(0, 7), i -> array_min(transform(hv, p -> p.h1 + i * p.h2)))").as("mhs"))
    time("new: 1 md5 + derive") {
      km.select(expr("element_at(mhs, 1)")).agg(count(lit(1))).head().getLong(0)
    }
    // sample values for cross-checking against DuckDB
    km.filter(col("id") === 0).select(col("mhs")).show(false)
    spark.stop()
  }
}

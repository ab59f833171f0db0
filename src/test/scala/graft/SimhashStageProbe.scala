package graft

import org.apache.spark.sql.functions._

/** Dev probe: isolate d11's stage costs — signature computation vs
  * band join + hamming census. */
object SimhashStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(32, "graft-simhash-probe")
    val docs = Tables.documents(spark, sfDir).repartition(32).cache()
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("md5s only") {
      docs.withColumn("md5s", expr("transform(split(text, ' '), t -> md5(t))"))
        .select(expr("size(md5s)")).agg(sum("size(md5s)")).count()
    }
    time("sig (HOF simhash64)") {
      docs.withColumn("md5s", expr("transform(split(text, ' '), t -> md5(t))"))
        .select(col("doc_id"), ops.Dedup.simhash64FromMd5s("md5s").as("sig"))
        .agg(count("sig")).count()
    }
    val sigsDf = docs.withColumn("md5s", expr("transform(split(text, ' '), t -> md5(t))"))
      .select(col("doc_id"), ops.Dedup.simhash64FromMd5s("md5s").as("sig"))
      .withColumn("si", expr(
        "transform(sequence(0, 3), b -> cast(conv(substring(sig, b*16 + 1, 16), 2, 10) as bigint))"))
    time("sigs reliable checkpoint") { sigsDf.checkpoint().count() }
    time("sigs localCheckpoint") { sigsDf.localCheckpoint(true).count() }
    val sigs = sigsDf.localCheckpoint(true)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => substring(col("sig"), b * 16 + 1, 16)): _*))
        .as(Seq("b", "bits")))
    time("band self-join + distinct") {
      bands.as("a").join(bands.as("b"),
          col("a.b") === col("b.b") && col("a.bits") === col("b.bits")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().count()
    }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bits") === col("b.bits")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time("hamming join + census") {
      cand.join(sigs.select(col("doc_id").as("id_a"), col("si").as("sa")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("si").as("sb")), "id_b")
        .withColumn("hamming", expr(
          "aggregate(zip_with(sa, sb, (x, y) -> bit_count(x ^ y)), 0, (acc, c) -> acc + c)"))
        .filter(col("hamming") <= 3).groupBy("hamming").count().count()
    }
    time("full d11") {
      SparkEntry.queries("d11_simhash_dedup")(spark, sfDir).count()
    }
    time("full d11 again") {
      SparkEntry.queries("d11_simhash_dedup")(spark, sfDir).count()
    }
    spark.stop()
  }
}

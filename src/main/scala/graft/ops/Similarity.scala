package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B9 similarity search over embedding columns (`Array[Float]`).
  *
  * Numeric design for oracle parity AND reproducibility: vectors are
  * quantized to integer micro-units (round(x * 1e6) as BIGINT) before any
  * arithmetic. Dot products and norms are then exact integer sums
  * (order-independent), and the final cosine is a single fp divide of
  * identical inputs — bit-identical across engines, partitionings, and
  * runs. At 100 TB this also halves the shuffle width vs raw doubles and
  * keeps the hot loop in primitive longs.
  *
  * Scale path: brute-force top-k broadcasts the (small) query set against
  * the corpus — one narrow pass, per-partition top-k via window; the LSH
  * variant buckets the corpus by 8 random-hyperplane signs so candidate
  * search touches only same-bucket vectors (1/256th of the corpus on
  * average per probe).
  */
object Similarity {

  /** Quantize a float-array column to integer micro-units. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Squared L2 norm of a quantized vector (exact integer). */
  def norm2Q(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity from quantized vectors. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b) / (sqrt(norm2Q(a)) * sqrt(norm2Q(b)))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; corpus streams. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", norm2Q(col("cv")))
    val q = queries.select(col("vec_id").as("qid"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", norm2Q(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", dotQ(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic ±1 hyperplane weight for (plane, dim), derived from the
    * first hex digit of md5("plane_dim") — reproducible everywhere. */
  private def planeWeights(plane: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)), i =>
      when(substring(md5(concat(plane.cast("string"), lit("_"), i.cast("string"))), 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), -1L).otherwise(1L))

  /** Random-hyperplane LSH bucket signature (`planes` sign bits) for each
    * vector — the ANN scale path's partitioning key. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    array_join(
      transform(sequence(lit(0), lit(planes - 1)), p =>
        when(dotQ(quantize(vec), planeWeights(p, dim)) >= 0, "1").otherwise("0")),
      "")

  // ---------------------------------------------------------------- queries

  private val d05 = Q(
    "d05_embed_cosine_topk",
    """WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
         FROM embeddings),
       n AS (
         SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
         FROM e),
       pairs AS (
         SELECT q.vec_id AS qid, c.vec_id AS cid,
                CAST(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i])) AS BIGINT)
                  / (sqrt(q.n2) * sqrt(c.n2)) AS cos
         FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       ranked AS (
         SELECT qid, cid, cos,
                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         FROM pairs)
       SELECT qid, cid, rank, round(cos, 6) AS cosine
       FROM ranked WHERE rank <= 10
       ORDER BY qid, rank""") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 10)
      .orderBy("qid", "rank")
  }

  private val d06 = Q(
    "d06_embed_lsh_buckets",
    """WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
         FROM embeddings),
       sig AS (
         SELECT vec_id,
                array_to_string(list_transform(generate_series(0, 7), p ->
                  CASE WHEN CAST(list_sum(list_transform(generate_series(1, 64), i ->
                    v[i] * (CASE WHEN substring(md5(p || '_' || i), 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN -1 ELSE 1 END))) AS BIGINT) >= 0
                  THEN '1' ELSE '0' END), '') AS bucket
         FROM e)
       SELECT bucket, count(*) AS n_vecs, min(vec_id) AS first_vec
       FROM sig GROUP BY bucket ORDER BY bucket""") { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), lshBucket(col("embedding"), planes = 8, dim = 64).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
      .orderBy("bucket")
  }

  val defs: Seq[Q] = Seq(d05, d06)
}

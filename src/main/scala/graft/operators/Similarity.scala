package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths:
  *   - [[cosineTopK]]: brute-force exact top-k — broadcast the (small) query
  *     set against the full corpus; correct baseline at any scale where the
  *     query set is small, since the corpus never shuffles.
  *   - [[lshCosineTopK]]: random-hyperplane LSH bucketing — the 100 TB path.
  *     Corpus and queries are both hashed to sign-pattern buckets; only
  *     same-bucket pairs are scored, turning O(Q×N) into O(Q×N/2^bits)
  *     expected. Recall is tuned by the number of hyperplanes (fewer bits →
  *     bigger buckets → higher recall, more work).
  *
  * All vector math is Catalyst higher-order functions (zip_with/aggregate)
  * over double arrays — codegen-friendly, no UDFs, no driver collect.
  */
object Similarity {

  /** Sequential-fold dot product (deterministic double arithmetic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    IO.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))

  /** Shared ANN ranking scaffold: broadcast the (small) query side against
    * `c` (must expose vec_id and v, plus optional extra join keys via
    * `joinCond`), score with `sim`, keep k per query by row_number.
    */
  private def rankTopK(
      c: DataFrame,
      simCol: org.apache.spark.sql.Column,
      numQueries: Int,
      k: Int,
      extraCond: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val q = c.filter(col("vec_id") < numQueries)
      .select((c.columns.map(n => col(n).as(s"q_$n"))): _*)
      .withColumnRenamed("q_vec_id", "qid")
      .withColumnRenamed("q_v", "qv")
    val cond = extraCond.foldLeft(col("vec_id") =!= col("qid"))(_ && _)
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    c.join(broadcast(q), cond)
      .withColumn("sim", simCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
      .orderBy("qid", "rank")
  }

  /** Exact brute-force cosine top-k: for each query vector (vec_id <
    * numQueries) the k nearest other vectors. The query side is broadcast;
    * ranking is a per-query row_number window (k rows survive per query
    * partition — no global sort).
    */
  def cosineTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(corpus(spark, sfDir).select("vec_id", "v"),
      cosine(col("qv"), col("v")), numQueries, k)

  /** [[cosineTopK]] with the native codegen'd
    * [[graft.functions.CosineSimilarityExpr]] instead of the HOF
    * composition — one fused loop per pair; bitwise-identical scores
    * (same fold order), registered in GraftSession as SQL `cosine_sim`.
    */
  def cosineTopKNative(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(corpus(spark, sfDir).select("vec_id", "v"),
      expr("cosine_sim(qv, v)"), numQueries, k)

  /** Deterministic pseudo-random hyperplanes (fixed LCG, seed constant) —
    * no RNG at plan time, so the bucketing is stable across runs/executors.
    */
  private def hyperplanes(numPlanes: Int, dim: Int): Seq[Array[Double]] = {
    var state = 0x5DEECE66DL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-pattern bucket id of vector column `v` under the given planes. */
  private def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit(_)): _*)
      when(dot(v, planeLit) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k via random-hyperplane LSH: score only same-bucket
    * candidates. With `numPlanes` bits the corpus splits into 2^numPlanes
    * buckets; the bucket join is an equi-join (hash shuffle on bucket id),
    * never a cross join.
    */
  def lshCosineTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      numPlanes: Int = 6,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus(spark, sfDir)
      .withColumn("bucket", lshBucket(col("v"), planes))
      .select("vec_id", "v", "bucket")
    // native fused-loop scoring on the scale path (bitwise-identical to the
    // HOF form — see StreamingSpec's equality test)
    rankTopK(c, expr("cosine_sim(qv, v)"), numQueries, k,
      extraCond = Some(col("bucket") === col("q_bucket")))
  }

  /** Int8 vector quantization: per-vector symmetric scale (127 / max|x|),
    * stored as array<tinyint> + one float scale — 4x smaller than float32,
    * 8x smaller than the double pipeline. At 100 TB of embeddings the
    * quantized corpus is what fits in cluster memory for ANN; the spec
    * checks recall@k against the full-precision ranking.
    */
  def quantize(spark: SparkSession, sfDir: String): DataFrame =
    corpus(spark, sfDir)
      .withColumn("max_abs",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("scale",
        when(col("max_abs") > 0, col("max_abs") / 127.0).otherwise(lit(1.0)))
      .select(col("vec_id"), col("label"), col("scale"),
        transform(col("v"), x => round(x / col("scale"), 0).cast("byte")).as("q"))

  /** Brute-force top-k over the QUANTIZED vectors (dequantize on the fly:
    * cosine is scale-invariant per vector, so the int8 arrays compare
    * directly).
    */
  def quantizedTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(
      quantize(spark, sfDir)
        .select(col("vec_id"), transform(col("q"), _.cast("double")).as("v")),
      expr("cosine_sim(qv, v)"), numQueries, k)

  /** Embedding-cosine near-duplicate pairs via LSH buckets: all same-bucket
    * pairs with cosine above the threshold. The near-dup analogue of
    * [[Dedup.minHashNearDupPairs]] for dense vectors.
    */
  def embeddingNearDupPairs(
      spark: SparkSession,
      sfDir: String,
      minCosine: Double = 0.35,
      numPlanes: Int = 6,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    // persist: the bucketed corpus feeds both sides of the self-join
    val c = corpus(spark, sfDir)
      .withColumn("bucket", lshBucket(col("v"), planes))
      .select(col("vec_id"), col("v"), col("bucket"))
      .persist()
    c.as("a")
      .join(c.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      // native fused-loop expression: one pass per pair vs three
      // interpreted HOF folds
      .withColumn("cos_sim", expr("cosine_sim(va, vb)"))
      .filter(col("cos_sim") >= minCosine)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy("vec_a", "vec_b")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Top principal component of the embedding corpus via one-pass moment
  * aggregation + bounded driver power iteration — the embedding
  * PREPROCESSING primitive (dominant-direction removal / ABTT-style
  * post-processing, drift monitoring between corpus versions, and the
  * quality signal "how anisotropic are these vectors" that decides
  * whether a whitening pass is worth scheduling before ANN indexing).
  *
  * Training (the [[Similarity]] codebook contract — train once, memoized,
  * production form is a materialized parquet artifact):
  *   1. ONE corpus pass computes the raw moments with a typed Aggregator
  *      whose buffer is a fixed-width long array: per-dimension sums
  *      floor(x_j·10⁶) and per-pair product sums floor(x_j·x_k·10⁶) —
  *      d + d² longs (d=64 → 33 KB), merged associatively, so map-side
  *      partial aggregation collapses every partition to ONE buffer
  *      before the single-row exchange; embeddings never shuffle.
  *   2. The driver folds the buffer into mean and covariance (pinned
  *      operation order) and runs [[Iters]] power iterations on the d×d
  *      matrix — O(d²) per round on a 33 KB artifact, NOT a distributed
  *      job (the same bounded-model-collect adjudication as the k-means /
  *      PQ codebooks: model artifact, not data).
  *   3. The component's sign is canonicalized (first coordinate ≥ 0) so
  *      the artifact is unique.
  *
  * Projection is wholly map-side: mean and component ride the plan as
  * literal arrays and each vector's centered dot product folds at scan
  * speed (codegen'd higher-order functions) — at 100 TB the projection is
  * a zero-shuffle column append.
  *
  * Determinism (every step replayed by the DuckDB oracle):
  *   - Moment sums are floor-fixed-point BIGINTs — exact, partition-order
  *     independent (float→double widening and float×float products are
  *     IEEE-exact in double).
  *   - Each power-iteration mat-vec is a per-row BIGINT sum of
  *     floor(c_jk·v_k·10⁹); the L2 norm is sqrt of a BIGINT sum of
  *     floor(y_j²·10⁹) — sqrt and division are correctly rounded IEEE
  *     ops, bit-identical across engines.
  *   - The per-vector projection is the same floor-fixed-point fold, so
  *     scores hash-match cross-engine.
  * Long capacity: |Σ floor(x_j·x_k·10⁶)| stays under 2⁶³ through ~9·10¹²
  * rows at unit-scale embeddings — the [[graft.functions.VectorCentroidAggregator]]
  * bound; shard the pass beyond that.
  */
object Pca {

  /** Fixed-point scale of the moment sums (6 decimal digits). */
  val MomentScale: Double = 1e6

  /** Fixed-point scale of the iteration / projection folds. */
  val IterScale: Double = 1e9

  /** Power-iteration rounds — the operator is DEFINED as this many
    * synchronous rounds (the oracle unrolls exactly these), not as
    * iterate-to-convergence.
    */
  val Iters: Int = 5

  case class PcaIn(embedding: Array[Float])

  /** msums: d longs; psums: d×d longs row-major; n: row count. */
  case class MomentBuf(msums: Array[Long], psums: Array[Long], n: Long)

  /** The trained artifact: mean, unit top component (sign-canonical),
    * and the power-iteration eigenvalue estimate ‖C·v‖ of the last round.
    */
  case class TopComponent(
      mean: Array[Double], component: Array[Double], eigenvalue: Double)

  private def fixM(x: Double): Long = math.floor(x * MomentScale).toLong

  private val momentAgg: Aggregator[PcaIn, MomentBuf, MomentBuf] =
    new Aggregator[PcaIn, MomentBuf, MomentBuf] {
      override def zero: MomentBuf =
        MomentBuf(Array.emptyLongArray, Array.emptyLongArray, 0L)
      override def reduce(b: MomentBuf, r: PcaIn): MomentBuf = {
        val d = r.embedding.length
        val out =
          if (b.n == 0L) MomentBuf(new Array[Long](d), new Array[Long](d * d), 0L)
          else {
            require(b.msums.length == d,
              s"ragged embedding dims: ${b.msums.length} vs $d")
            b
          }
        val x = new Array[Double](d)
        var j = 0
        while (j < d) { x(j) = r.embedding(j).toDouble; j += 1 }
        j = 0
        while (j < d) {
          out.msums(j) += fixM(x(j))
          var k = 0
          while (k < d) {
            // float×float is exact in double, so the floor fix-point is
            // the same value on every engine
            out.psums(j * d + k) += fixM(x(j) * x(k))
            k += 1
          }
          j += 1
        }
        MomentBuf(out.msums, out.psums, out.n + 1L)
      }
      override def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.msums.length == b.msums.length,
            s"ragged embedding dims: ${a.msums.length} vs ${b.msums.length}")
          val m = new Array[Long](a.msums.length)
          val p = new Array[Long](a.psums.length)
          var i = 0
          while (i < m.length) { m(i) = a.msums(i) + b.msums(i); i += 1 }
          i = 0
          while (i < p.length) { p(i) = a.psums(i) + b.psums(i); i += 1 }
          MomentBuf(m, p, a.n + b.n)
        }
      override def finish(b: MomentBuf): MomentBuf = b
      override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
      override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    }

  /** Train-once cache ([[Similarity]]'s codebook idiom — deterministic
    * training over immutable tables, so a memo hit IS the artifact).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, TopComponent]()

  /** Test seam: drop memoized components (spec isolation). */
  private[graft] def clearCache(): Unit = cache.clear()

  /** The trained (mean, component, eigenvalue) for the corpus — memoized
    * per table path and parameter set.
    */
  def topComponent(spark: SparkSession, sfDir: String): TopComponent = {
    val key = s"pca|$sfDir/embeddings.parquet|$Iters|$MomentScale|$IterScale"
    val hit = cache.get(key)
    if (hit != null) return hit
    val trained = train(spark, sfDir)
    cache.putIfAbsent(key, trained)
    trained
  }

  private def train(spark: SparkSession, sfDir: String): TopComponent = {
    import spark.implicits._
    // the ONE corpus pass; the collect is the d+d² long moment buffer —
    // a bounded model artifact (33 KB at d=64), never data
    val buf = IO.table(spark, sfDir, "embeddings")
      .select(col("embedding"))
      .as[PcaIn]
      .select(momentAgg.toColumn)
      .head()
    val d = buf.msums.length
    val n = buf.n.toDouble
    // pinned order (fix → double, / Scale, / n): the oracle divides in
    // the same order so every IEEE intermediate is bit-identical
    val mean = buf.msums.map(s => s.toDouble / MomentScale / n)
    val cov = Array.tabulate(d, d)((j, k) =>
      buf.psums(j * d + k).toDouble / MomentScale / n - mean(j) * mean(k))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var eig = 0.0
    for (_ <- 0 until Iters) {
      val y = Array.tabulate(d) { j =>
        var acc = 0L
        var k = 0
        while (k < d) {
          acc += math.floor(cov(j)(k) * v(k) * IterScale).toLong
          k += 1
        }
        acc.toDouble / IterScale
      }
      var q = 0L
      var j = 0
      while (j < d) { q += math.floor(y(j) * y(j) * IterScale).toLong; j += 1 }
      val norm = math.sqrt(q.toDouble / IterScale)
      eig = norm
      v = y.map(_ / norm)
    }
    // canonical sign: first coordinate non-negative (unique artifact —
    // power iteration's sign depends on the init otherwise)
    if (v(0) < 0) v = v.map(x => -x)
    TopComponent(mean, v, eig)
  }

  /** The component as a table: (pos, loading, eigenvalue) — the
    * materialized-artifact face (d rows).
    */
  def componentTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = topComponent(spark, sfDir)
    t.component.zipWithIndex
      .map { case (l, i) => (i, l, t.eigenvalue) }
      .toSeq
      .toDF("pos", "loading", "eigenvalue")
      .orderBy("pos")
  }

  /** Per-vector first-principal-component score: pc1(x) = (x−mean)·v.
    * Wholly map-side — mean and component are literal arrays in the
    * plan, the centered dot product is a codegen'd fixed-point fold at
    * scan speed (zero shuffles beyond the presentation sort).
    */
  def project(spark: SparkSession, sfDir: String): DataFrame = {
    val t = topComponent(spark, sfDir)
    val d = t.mean.length
    val mLit = array(t.mean.map(lit).toIndexedSeq: _*)
    val vLit = array(t.component.map(lit).toIndexedSeq: _*)
    val emb = IO.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("x"))
    val pfix = aggregate(
      sequence(lit(1), lit(d)),
      lit(0L),
      (acc, i) => acc +
        floor((element_at(col("x"), i) - element_at(mLit, i))
          * element_at(vLit, i) * lit(IterScale)))
    emb.select(col("vec_id"), (pfix.cast("double") / lit(IterScale)).as("pc1"))
      .orderBy("vec_id")
  }
}

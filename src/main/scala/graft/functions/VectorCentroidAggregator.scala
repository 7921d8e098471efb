package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise vector averaging (centroids / average pooling) over an
  * embedding column, as a typed Aggregator — the custom-aggregation shape
  * for array-valued math Spark's built-in aggregates don't cover.
  *
  * Scale shape: the buffer is ONE fixed-width Array[Long] (+ count) per
  * group, merged associatively — map-side partial aggregation collapses
  * every partition to |labels| buffers before the exchange, so the shuffle
  * carries O(labels × partitions × dim) longs, never the vectors
  * themselves. Compare the naive posexplode + groupBy(label, pos) plan,
  * which shuffles N × dim rows.
  *
  * Determinism: float addition is order-dependent, and a distributed sum
  * has no stable order — so the buffer accumulates FIXED-POINT values
  * (floor(x * 2^-20-grained 1e6)), whose integer sum is exact and
  * order-independent. The mean is reconstructed in doubles at finish time
  * with a pinned operation order, so the result is bit-identical across
  * runs, partitionings, and engines (the DuckDB oracle replays
  * floor/sum/divide exactly). Quantization bias is < 1e-6 per element —
  * far below embedding noise. Long capacity: |sum| < 2^63 holds through
  * ~9e12 rows per group at unit-scale embeddings; beyond that, widen the
  * scale constant down or shard groups.
  */
object VectorCentroidAggregator {

  /** Fixed-point scale: 6 decimal digits. */
  val Scale: Double = 1e6

  case class VecIn(label: Int, embedding: Array[Float])
  case class CentroidBuf(sums: Array[Long], n: Long)
  case class CentroidOut(centroid: Array[Double], n: Long)

  private def fixed(x: Float): Long = math.floor(x.toDouble * Scale).toLong

  val agg: Aggregator[VecIn, CentroidBuf, CentroidOut] =
    new Aggregator[VecIn, CentroidBuf, CentroidOut] {
      override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)
      override def reduce(b: CentroidBuf, v: VecIn): CentroidBuf = {
        if (b.n == 0L) CentroidBuf(v.embedding.map(fixed), 1L)
        else {
          require(b.sums.length == v.embedding.length,
            s"ragged embedding dims: ${b.sums.length} vs ${v.embedding.length}")
          val s = new Array[Long](b.sums.length)
          var i = 0
          while (i < s.length) { s(i) = b.sums(i) + fixed(v.embedding(i)); i += 1 }
          CentroidBuf(s, b.n + 1L)
        }
      }
      override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.sums.length == b.sums.length,
            s"ragged embedding dims: ${a.sums.length} vs ${b.sums.length}")
          val s = new Array[Long](a.sums.length)
          var i = 0
          while (i < s.length) { s(i) = a.sums(i) + b.sums(i); i += 1 }
          CentroidBuf(s, a.n + b.n)
        }
      override def finish(b: CentroidBuf): CentroidOut =
        // pinned order (sum -> double, / Scale, / n); the oracle divides in
        // the same order so the IEEE result is bit-identical
        CentroidOut(b.sums.map(s => s.toDouble / Scale / b.n), b.n)
      override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
      override def outputEncoder: Encoder[CentroidOut] = Encoders.product[CentroidOut]
    }

  /** Per-label centroids of the embeddings table: (label, centroid, n). */
  def perLabel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("label"), col("embedding"))
      .as[VecIn]
      .groupByKey(_.label)
      .agg(agg.toColumn.name("c"))
      .select(col("key").as("label"), col("c.centroid").as("centroid"),
        col("c.n").as("n"))
  }

  /** Driver-facing registration shape: one row per (label, dimension) —
    * exploding sidesteps array-of-double string formatting at the compare
    * boundary while the library keeps the array form above.
    */
  def perLabelExploded(spark: SparkSession, sfDir: String): DataFrame =
    perLabel(spark, sfDir)
      .select(col("label"), col("n"), posexplode(col("centroid")))
      .select(col("label"), col("pos").cast("int").as("pos"),
        col("col").as("centroid_val"), col("n"))
      .orderBy("label", "pos")
}

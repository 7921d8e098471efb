package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed rank (the classic parallel prefix-sum
  * shape) — global running sums with NO single-partition WindowExec
  * anywhere in the plan. An unpartitioned `Window.orderBy(...)` funnels
  * the whole frame through one task; at data scale that is the
  * single-node cliff Spark's own warning flags. Instead:
  *
  *   1. range-partition the frame on the order key and FREEZE the
  *      physical partition id (localCheckpoint — the id column must not
  *      be recomputed under a different placement);
  *   2. an ordinary PARTITIONED window computes each range's local
  *      cumulative;
  *   3. per-range totals — at most `spark.sql.shuffle.partitions` rows,
  *      a bounded driver artifact like the k-means codebooks — prefix-sum
  *      into broadcast offsets added back per row.
  *
  * Where the range boundaries land cannot move the result: local-cum +
  * earlier-range totals telescopes to the same global cumulative for
  * every placement, so the output is deterministic even though the
  * range sampler is not.
  */
object DistributedRank {

  /** Append global running sums of the `sums` value columns (all
    * BIGINT) in `order`, named by each pair's second element.
    *
    * PRECONDITION: `order` must be DISTINCT per row (every caller
    * orders by a unique rank/key column). Ties would make the
    * intra-range running sum depend on the arbitrary physical order the
    * local window visits equal keys in — the frozen pid pins WHICH
    * range a row lands in, not the order within a tie group.
    */
  def rangeCumsum(
      df: DataFrame,
      order: Column,
      sums: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = df.repartitionByRange(nPart, order)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pid frozen; read by the window AND the offsets
    // coalesce: a range whose value column is all-NULL sums to NULL and
    // getLong would throw — treat it as contributing 0 to the prefix
    val perRange = parts.groupBy("__pid")
      .agg(sums.map { case (v, _) => coalesce(sum(v), lit(0L)).as(v) }.head,
        sums.drop(1).map { case (v, _) => coalesce(sum(v), lit(0L)).as(v) }: _*)
      .collect()
      .map(r => (r.getInt(0), sums.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val wLoc = Window.partitionBy("__pid").orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.zipWithIndex.foldLeft(parts) { case (acc, ((v, as), i)) =>
      val prefix = perRange.map(_._1)
        .zip(perRange.map(_._2(i)).scanLeft(0L)(_ + _)).toMap
      val offset =
        if (prefix.isEmpty) lit(0L)
        else coalesce(element_at(typedLit(prefix), col("__pid")), lit(0L))
      acc.withColumn(as, sum(v).over(wLoc) + offset)
    }.drop("__pid")
  }
}

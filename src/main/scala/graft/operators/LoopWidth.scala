package graft.operators

import org.apache.spark.sql.SparkSession

/** Exchange-width pinning for ITERATIVE loops (the star-contraction
  * lesson, shared): the session's wide-start AQE posture (high
  * initialPartitionNum, coalesce by size) is right for one-shot
  * queries, but a loop that localCheckpoints per round materializes
  * through the RDD path, which AQE's coalescing does not re-plan — so
  * every round would launch wide-start-many tasks over a state frame
  * that is |nodes|/|edges|-bounded. Pin BOTH width confs (AQE reads
  * initialPartitionNum as the pre-coalesce width when set) to ~1M rows
  * per task for the loop body, and restore on exit. Lazy frames
  * returned from `body` plan any post-loop presentation sort after the
  * restore, at session width.
  */
private[operators] object LoopWidth {
  private val PartsKey = "spark.sql.shuffle.partitions"
  private val InitialKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  def pinned[T](spark: SparkSession, estRows: Long)(body: => T): T = {
    val sessionParts = spark.conf.get(PartsKey)
    val sessionInitial = spark.conf.getOption(InitialKey)
    // floor at the session width (≈ core count): the loop's map-side
    // compute — the per-round joins over the checkpointed edge frame —
    // still wants full parallelism even when the shuffled STATE rows are
    // few (the star-contraction loop, whose rounds are pure shuffles of
    // the contracted edges, keeps its own tighter per-round sizing);
    // scale past it only at ~1M rows per task
    val w = math.max(estRows / 1000000L + 1L, sessionParts.toLong).toString
    spark.conf.set(PartsKey, w)
    spark.conf.set(InitialKey, w)
    try body
    finally {
      spark.conf.set(PartsKey, sessionParts)
      sessionInitial match {
        case Some(v) => spark.conf.set(InitialKey, v)
        case None => spark.conf.unset(InitialKey)
      }
    }
  }
}

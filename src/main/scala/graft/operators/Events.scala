package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Event-sequence analytics over the `events` table, next to the
  * sessionizer (`streaming/EventStream.sessionizeBatch`), the funnel
  * (`EventStream.funnelSummary`), and the market-basket lift
  * (`Relational.itemAssociationLift`).
  */
object Events {

  /** COHORT RETENTION matrix: cohort = the user's first-active day
    * (whole days since epoch — exact integer division of the µs stamp),
    * one row per (cohort, day offset) with distinct active users, the
    * cohort's size, and the retention ratio (exact-integer operands in a
    * double divide — hash-stable cross-engine).
    *
    * Scale shape: day indices are map-side arithmetic; the first-touch
    * day is a window min over ONE user_id exchange, and the distinct
    * aggregation reuses that partitioning for its partial pass (each
    * partition collapses to its (cohort, offset, user) triples before
    * the second, output-sized exchange). Cohort sizes come from the
    * offset-0 slice of the SAME aggregate — every user is active on
    * their own first day by construction — computed once, checkpointed
    * (two consumers), and broadcast back (≤ |days| rows) instead of a
    * second pass over events. At 100 TB the cost is the one per-user
    * shuffle the sessionizer already pays; nothing event-scale moves
    * twice.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = IO.table(spark, sfDir, "events")
    val ev = raw.select(col("user_id"),
      (EventTime.tsUs(raw) / lit(86400000000L)).cast("long").as("day"))
    val firstDay = Window.partitionBy("user_id")
    val active = ev
      .withColumn("cohort_day", min("day").over(firstDay))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct("user_id").as("active_users"))
      .localCheckpoint() // two consumers below: don't replay the window
    val sizes = active.filter(col("offset_days") === 0)
      .select(col("cohort_day"), col("active_users").as("cohort_users"))
    active.join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("offset_days"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users").cast("double"))
          .as("retention"))
      .orderBy("cohort_day", "offset_days")
  }
}

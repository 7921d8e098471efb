package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema-aware event-time access for the `events` table.
  *
  * The test-data generator has shipped `ts` in two physical parquet forms:
  * TIMESTAMP(NANOS) — which Spark 4 reads as nanos-since-epoch LONG under
  * `spark.sql.legacy.parquet.nanosAsLong` (see GraftSession) — and
  * TIMESTAMP(MICROS), which Spark reads natively as TIMESTAMP_NTZ. The
  * oracle's DuckDB sees a µs TIMESTAMP either way, so all event-time
  * arithmetic in the engine runs at MICROSECOND resolution regardless of
  * the encoding; these helpers pick the right extraction from the actual
  * schema so every event-time operator is insensitive to the generator's
  * encoding choice.
  *
  * The session time zone is pinned UTC (GraftSession), so the NTZ→LTZ cast
  * inside [[tsUs]]/[[tsStamp]] preserves the wall-clock instant exactly.
  */
object EventTime {

  /** Legacy nanos-as-long → µs via exact FLOOR division: `div` truncates
    * toward zero, which for pre-epoch (negative) nanos would round the
    * opposite way from unix_micros' floor and break the "both encodings
    * yield identical µs" contract. pmod keeps the arithmetic in exact
    * longs (a double `floor(ts / 1000)` loses precision past 2^53 —
    * current epoch nanos are ~1.7e18).
    */
  private val legacyNanosToUs = "(ts - pmod(ts, 1000)) div 1000"

  /** `ts` as µs-since-epoch LONG, whatever the physical type. */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case TimestampType | TimestampNTZType =>
      unix_micros(col("ts").cast(TimestampType))
    case _ => expr(legacyNanosToUs) // legacy nanos-as-long encoding
  }

  /** `ts` truncated to µs as a session-TZ TIMESTAMP (for time windows). */
  def tsStamp(df: DataFrame): Column = df.schema("ts").dataType match {
    case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
    case _ => expr(s"timestamp_micros($legacyNanosToUs)")
  }

  /** `ts >= usSinceEpoch`, phrased on the RAW column so the comparison
    * reaches the parquet scan as a pushed filter (row-group min/max
    * skipping + partition pruning — the predicate a time-partitioned
    * 100 TB event table lives on). A filter on the computed µs column
    * would evaluate post-scan and read everything. Exact at µs: both
    * physical encodings hold ts at µs-or-finer, and whole-µs thresholds
    * convert losslessly (timestamp_micros / ×1000 nanos).
    */
  def tsAtLeastUs(df: DataFrame, usSinceEpoch: Long): Column =
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        col("ts") >= timestamp_micros(lit(usSinceEpoch)).cast(
          df.schema("ts").dataType)
      case _ => col("ts") >= lit(math.multiplyExact(usSinceEpoch, 1000L))
    }

  /** `ts < usSinceEpoch`, pushdown-friendly like [[tsAtLeastUs]]. */
  def tsBeforeUs(df: DataFrame, usSinceEpoch: Long): Column =
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        col("ts") < timestamp_micros(lit(usSinceEpoch)).cast(
          df.schema("ts").dataType)
      case _ => col("ts") < lit(math.multiplyExact(usSinceEpoch, 1000L))
    }
}

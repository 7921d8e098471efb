package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed one-pass corpus statistics via Aggregator[IN, BUF, OUT] — the
  * custom-aggregation escape hatch (SURVEY.md §7.5) for summaries that
  * would otherwise take several built-in aggregates or a UDAF.
  *
  * The buffer is a small fixed-size case class, so partial aggregation
  * (merge of buffers) is map-side combined and the shuffle carries one
  * buffer per (group × partition) — the same scale posture as built-in
  * aggregates.
  */
object CorpusStatsAggregator {

  case class DocIn(source: String, n_chars: Long, n_tokens: Long)
  case class StatsBuf(docs: Long, tokens: Long, chars: Long,
      maxChars: Long, minChars: Long)
  case class StatsOut(n_docs: Long, total_tokens: Long, mean_chars: Double,
      max_chars: Long, min_chars: Long)

  val agg: Aggregator[DocIn, StatsBuf, StatsOut] =
    new Aggregator[DocIn, StatsBuf, StatsOut] {
      override def zero: StatsBuf = StatsBuf(0L, 0L, 0L, Long.MinValue, Long.MaxValue)
      override def reduce(b: StatsBuf, d: DocIn): StatsBuf =
        StatsBuf(b.docs + 1, b.tokens + d.n_tokens, b.chars + d.n_chars,
          math.max(b.maxChars, d.n_chars), math.min(b.minChars, d.n_chars))
      override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
        StatsBuf(a.docs + b.docs, a.tokens + b.tokens, a.chars + b.chars,
          math.max(a.maxChars, b.maxChars), math.min(a.minChars, b.minChars))
      override def finish(b: StatsBuf): StatsOut =
        StatsOut(b.docs, b.tokens,
          if (b.docs == 0) 0.0 else b.chars.toDouble / b.docs,
          b.maxChars, b.minChars)
      override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
      override def outputEncoder: Encoder[StatsOut] = Encoders.product[StatsOut]
    }

  /** Per-source corpus profile in a single typed aggregation pass. */
  def perSource(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[DocIn]
      .groupByKey(_.source)
      .agg(agg.toColumn.name("stats"))
      .select(col("key").as("source"),
        col("stats.n_docs").as("n_docs"),
        col("stats.total_tokens").as("total_tokens"),
        col("stats.mean_chars").as("mean_chars"),
        col("stats.max_chars").as("max_chars"),
        col("stats.min_chars").as("min_chars"))
      .orderBy("source")
  }
}

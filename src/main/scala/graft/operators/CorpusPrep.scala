package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Corpus-preparation operators for a training-data pipeline: sequence
  * packing (assigning documents to fixed-token-budget training sequences)
  * and deterministic content-hash train/validation splitting.
  *
  * Scale notes: packing is computed per shard (documents are hashed into
  * shards first), so every window is a bounded partition and the plan
  * shuffles once on the shard key — there is no global ordering anywhere.
  * The split is a pure per-row projection (no shuffle, no RNG): membership
  * is a function of the content hash, so it is stable across runs,
  * executors, and engines, and survivors of a re-crawl keep their split.
  */
object CorpusPrep {

  /** Shard count scaled to the corpus: ceil(rows / targetShardDocs), floored
    * at `minShards`. A FIXED shard count is a parameter cliff at 100 TB —
    * each shard's window partition grows linearly with the corpus until it
    * no longer fits an executor; scaling the count with the row count keeps
    * per-shard mass (docs, and with near-uniform doc length, tokens)
    * bounded by a constant regardless of corpus size.
    */
  private[graft] def adaptiveNumShards(
      rows: Long,
      targetShardDocs: Long = 100000L,
      minShards: Int = 32): Int = {
    val needed = (rows + targetShardDocs - 1) / targetShardDocs
    math.max(minShards.toLong, needed).min(Int.MaxValue.toLong).toInt
  }

  /** Greedy in-order sequence packing within hash shards: docs are laid
    * end-to-end in doc_id order per shard, and a document starts the
    * sequence its cumulative offset falls into (documents may straddle
    * a boundary; the training loader handles truncation). Output:
    * (doc_id, shard, n_tokens, offset_in_shard, seq_id).
    *
    * `numShards <= 0` (the default) derives the shard count from the
    * corpus row count via [[adaptiveNumShards]] — parquet footer metadata,
    * no Spark job. Callers with a pinned layout contract (the registered
    * query's DuckDB oracle hard-codes `% 32`) pass it explicitly.
    */
  def packSequences(
      spark: SparkSession,
      sfDir: String,
      ctxLen: Long = 2048L,
      numShards: Int = -1,
      targetShardDocs: Long = 100000L): DataFrame = {
    val shards =
      if (numShards > 0) numShards
      else adaptiveNumShards(
        IO.parquetRowCount(spark, s"$sfDir/documents.parquet"), targetShardDocs)
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    IO.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % shards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("offset_in_shard",
        sum("n_tokens").over(w) - col("n_tokens"))
      // integral div, not double division: offsets can exceed 2^53 at scale
      .withColumn("seq_id", expr(s"offset_in_shard div $ctxLen"))
      .orderBy("doc_id")
  }

  /** Overlapping document chunking for embedding/retrieval pipelines:
    * fixed-size character windows whose starts advance by
    * (chunkChars - overlap), so consecutive chunks share `overlap` chars of
    * context. Output: (doc_id, chunk_id, chunk_text, chunk_chars); every
    * document yields at least one chunk (short docs chunk to themselves).
    *
    * Pure per-row generate (sequence + transform + substring, all
    * codegen'd): no shuffle, no UDF — the chunk fan-out multiplies rows
    * but never re-partitions, so at 100 TB this is a map-only stage.
    */
  def chunkDocuments(
      spark: SparkSession,
      sfDir: String,
      chunkChars: Int = 200,
      overlap: Int = 50): DataFrame = {
    require(overlap >= 0 && overlap < chunkChars, "need 0 <= overlap < chunkChars")
    val step = chunkChars - overlap
    IO.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
                sequence(0, greatest((length(text) - $overlap + ${step - 1}) div $step, 1) - 1),
                i -> substring(text, i * $step + 1, $chunkChars))""")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("long"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic train/val split on the content hash: the first 8 hex
    * digits of md5(text) parsed as an integer, mod 100 — bucket < 95 is
    * train. Content-keyed (not doc_id-keyed), so duplicate texts land in
    * the same split and cannot leak train data into validation.
    */
  def trainValSplit(
      spark: SparkSession,
      sfDir: String,
      trainPct: Int = 95): DataFrame =
    IO.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        (conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train")).otherwise(lit("val")))
      .orderBy("doc_id")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Data-layout operators: Z-order (Morton curve) clustering for
  * multi-dimensional scan pruning.
  *
  * Why this matters at 100 TB: parquet row-group skipping works off
  * per-column min/max stats, which only prune on columns the physical
  * sort order correlates with. A table laid out by `x` answers x-range
  * scans cheaply but reads EVERYTHING for a y-range scan. Interleaving
  * the bits of both keys into one Morton code and range-partitioning +
  * sorting on it tiles the (x, y) space into boxes, so every file/row
  * group carries tight min/max on BOTH columns and either dimension
  * prunes — the layout trick the public lakehouse engines (Delta OPTIMIZE
  * ZORDER BY, Iceberg sort orders) apply, expressed here as plain
  * codegen'd bit arithmetic + `repartitionByRange`/`sortWithinPartitions`
  * (no shuffle beyond the one range exchange the re-layout itself is).
  *
  * The z-value is pure integer bit math — bit-identical in any engine —
  * so the registered projection is DuckDB-oracled with the same formula.
  */
object Layout {

  /** Bits per dimension in the Morton code (16 ⇒ a 32-bit z-value for two
    * dimensions — enough tiles that layout quality is partition-bound, not
    * code-bound).
    */
  val ZBits = 16

  /** Morton interleave of the low [[ZBits]] bits of two non-negative
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * A 32-term OR of shifted masks — folds to one codegen'd expression,
    * no UDF, no loop at runtime.
    */
  def zValue16(x: Column, y: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** The same 32-term formula as SQL text, for the DuckDB oracle (and for
    * eyeballing that the Spark fold and the SQL agree term for term).
    */
  def zValue16Sql(x: String, y: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(s"(($x & ${1L << i}) << $i)", s"(($y & ${1L << i}) << ${i + 1})")
    }.mkString(" | ")

  /** Registered projection: Morton codes over the lineitem (partkey,
    * suppkey) pair — the two-dimensional key a part+supplier box query
    * would prune on.
    */
  def zOrderValues(spark: SparkSession, sfDir: String): DataFrame =
    IO.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        pmod(col("l_partkey"), lit(65536L)).as("zx"),
        pmod(col("l_suppkey"), lit(65536L)).as("zy"))
      .withColumn("z", zValue16(col("zx"), col("zy")))
      .orderBy("l_orderkey", "l_linenumber")

  /** Re-layout `df` Z-ordered on (`xCol`, `yCol`): one range exchange on
    * the Morton code, a per-partition sort (no global sort), parquet out.
    * Each output file then covers a z-contiguous tile of the key space,
    * which is what gives both columns tight per-file/row-group min-max.
    */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      dir: String,
      numFiles: Int): Unit = {
    val z = zValue16(col(xCol), col(yCol))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** The single-dimension layout to compare against: range-partitioned and
    * sorted by `xCol` alone.
    */
  def writeLinear(
      df: DataFrame,
      xCol: String,
      dir: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(xCol))
      .sortWithinPartitions(xCol)
      .write.mode("overwrite").parquet(dir)
}

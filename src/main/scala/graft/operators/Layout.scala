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

  /** HILBERT curve index of the low-[[ZBits]] (x, y) pair — the other
    * lakehouse clustering curve (Delta/Iceberg expose both): unlike
    * Morton, every consecutive pair of Hilbert indices is ADJACENT in
    * (x, y), so tiles have no diagonal jumps and range scans touch
    * strictly fewer files at equal tile count (the locality argument for
    * preferring it on heavily box-queried tables).
    *
    * The classic xy2d walk mutates (x, y) per level, which no Column
    * composition expresses linearly: a fold doubles the expression tree
    * per level (2¹⁶ nodes), and 16 chained named projections get merged
    * RIGHT BACK into that tree by Catalyst's CollapseProject (measured:
    * 7.6 s for 600k rows of pure integer math). The honest shape is the
    * native `hilbert_xy2d` Expression
    * ([[graft.functions.HilbertIndexExpr]]) — a 16-iteration loop in
    * generated code, allocation-free, inside whole-stage codegen. The
    * oracle replays the identical walk as chained CTEs
    * ([[hilbertSql]]) — pure integer compares/adds/flips.
    */
  def hilbertWithColumns(df: DataFrame): DataFrame =
    df.withColumn("h", call_function("hilbert_xy2d", col("hx"), col("hy")))

  /** The same 16-level walk as chained SQL CTEs, ending in `hf` with a
    * column `h` — for the DuckDB oracle. `src` must provide the key
    * columns plus (hx, hy).
    */
  def hilbertSql(src: String, keyCols: String): String = {
    val head =
      s"hl16 AS (SELECT $keyCols, hx, hy, CAST(0 AS BIGINT) AS d, " +
        s"hx AS cx, hy AS cy FROM $src)"
    val levels = (ZBits - 1 to 0 by -1).map { level =>
      val s = 1L << level
      val rx = s"CASE WHEN (cx & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (cy & $s) > 0 THEN 1 ELSE 0 END"
      s"""hl$level AS (
           SELECT $keyCols, hx, hy,
                  d + CAST(${s * s} AS BIGINT)
                      * CAST(xor(3 * ($rx), ($ry)) AS BIGINT) AS d,
                  CASE WHEN ($ry) = 0
                       THEN CASE WHEN ($rx) = 1 THEN ${s - 1} - cy ELSE cy END
                       ELSE cx END AS cx,
                  CASE WHEN ($ry) = 0
                       THEN CASE WHEN ($rx) = 1 THEN ${s - 1} - cx ELSE cx END
                       ELSE cy END AS cy
           FROM hl${level + 1})"""
    }
    val tail = s"hf AS (SELECT $keyCols, hx, hy, d AS h FROM hl0)"
    (head +: levels :+ tail).mkString(",\n")
  }

  /** Registered projection: Hilbert indices over the same lineitem
    * (partkey, suppkey) pair as [[zOrderValues]] — the two curves side
    * by side on one table.
    */
  def hilbertValues(spark: SparkSession, sfDir: String): DataFrame =
    hilbertWithColumns(
      IO.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          pmod(col("l_partkey"), lit(65536L)).as("hx"),
          pmod(col("l_suppkey"), lit(65536L)).as("hy")))
      .select("l_orderkey", "l_linenumber", "hx", "hy", "h")
      .orderBy("l_orderkey", "l_linenumber")

  /** Re-layout `df` Hilbert-ordered on the (hx, hy) pair columns: one
    * range exchange on the curve index + per-partition sort — the
    * [[writeZOrdered]] twin.
    */
  def writeHilbertOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      dir: String,
      numFiles: Int): Unit =
    hilbertWithColumns(
      df.withColumn("hx", col(xCol)).withColumn("hy", col(yCol)))
      .repartitionByRange(numFiles, col("h"))
      .sortWithinPartitions("h")
      .drop("h", "hx", "hy")
      .write.mode("overwrite").parquet(dir)

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

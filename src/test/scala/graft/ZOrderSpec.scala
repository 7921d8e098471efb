package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout specs: the Morton code against a bit-twiddling reference,
  * and the actual row-group-pruning payoff measured on scan metrics — the
  * claim "either dimension prunes" as a number, not prose.
  */
class ZOrderSpec extends SparkTestBase {

  /** Reference interleave (scalar, driver-side). */
  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    z
  }

  test("zValue16 matches the reference interleave") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (1023L, 511L), (40000L, 7L))
    val got = pairs.toDF("x", "y")
      .withColumn("z", Layout.zValue16(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y), s"z($x, $y)")
    }
    // spot-check the SQL generator agrees with the Column fold: evaluate
    // the generated text through Spark's own SQL parser
    val viaSql = pairs.toDF("x", "y")
      .selectExpr("x", "y", s"(${Layout.zValue16Sql("x", "y")}) AS z")
      .collect().map(r => r.getLong(2)).toSeq
    assert(viaSql == got.map(_._3).toSeq)
  }

  private def scanOutputRows(df: DataFrame): Long = {
    // collect(), not a noop write: DataFrameWriter builds its OWN
    // QueryExecution, so writing would leave df.queryExecution's metrics
    // untouched (reads 0)
    df.collect()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = exec.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet scan in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("Z-ordered layout prunes a secondary-column range scan; linear layout cannot") {
    import spark.implicits._
    // deterministic 200k-point cloud over a 1024x1024 key space
    val df = spark.range(200000).select(
      pmod(col("id") * 2654435761L, lit(1024L)).as("x"),
      pmod((col("id") + 7919L) * 2246822519L, lit(1024L)).as("y"),
      col("id").as("payload"))
    val zDir = graft.sources.IO.scratchDir("zorder_z")
    val xDir = graft.sources.IO.scratchDir("zorder_linear")
    Layout.writeZOrdered(df, "x", "y", zDir, numFiles = 32)
    Layout.writeLinear(df, "x", xDir, numFiles = 32)

    def yScan(dir: String): DataFrame =
      spark.read.parquet(dir).filter(col("y").between(100, 131))

    // same answer either way...
    val zRows = yScan(zDir).count()
    val xRows = yScan(xDir).count()
    assert(zRows == xRows && zRows > 0)

    // ...but the z layout's files carry tight y min/max (each is a Morton
    // tile), so parquet row-group stats skip most of the table, while the
    // x-sorted layout has y spanning the full domain in every row group
    // and must surface everything to the post-scan filter
    val zScanned = scanOutputRows(yScan(zDir))
    val xScanned = scanOutputRows(yScan(xDir))
    assert(xScanned > (zScanned * 2),
      s"z layout should scan well under half the rows: z=$zScanned linear=$xScanned")
  }

  test("Hilbert layout prunes the secondary column at least as tightly as Morton") {
    import spark.implicits._
    val df = spark.range(200000).select(
      pmod(col("id") * 2654435761L, lit(1024L)).as("x"),
      pmod((col("id") + 7919L) * 2246822519L, lit(1024L)).as("y"),
      col("id").as("payload"))
    val hDir = graft.sources.IO.scratchDir("hilbert_h")
    val zDir = graft.sources.IO.scratchDir("hilbert_zref")
    val xDir = graft.sources.IO.scratchDir("hilbert_linear")
    Layout.writeHilbertOrdered(df, "x", "y", hDir, numFiles = 32)
    Layout.writeZOrdered(df, "x", "y", zDir, numFiles = 32)
    Layout.writeLinear(df, "x", xDir, numFiles = 32)

    def yScan(dir: String): DataFrame =
      spark.read.parquet(dir).filter(col("y").between(100, 131))

    assert(yScan(hDir).count() == yScan(xDir).count(), "layout must not change answers")
    val hScanned = scanOutputRows(yScan(hDir))
    val zScanned = scanOutputRows(yScan(zDir))
    val xScanned = scanOutputRows(yScan(xDir))
    assert(xScanned > hScanned * 2,
      s"hilbert layout should scan well under half the rows: h=$hScanned linear=$xScanned")
    // adjacency means no diagonal jumps inside a tile — Hilbert boxes
    // are at least as tight as Morton's (allow a small tiling wobble)
    assert(hScanned <= zScanned * 3 / 2,
      s"hilbert tiles should match or beat Morton: h=$hScanned z=$zScanned")
  }
}

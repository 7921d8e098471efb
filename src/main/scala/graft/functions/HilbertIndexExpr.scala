package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the order-16 HILBERT curve index (classic
  * xy2d walk) of a non-negative (x, y) pair, both in [0, 2¹⁶).
  *
  * Why an Expression and not composed Columns: the walk mutates (x, y)
  * per level, so a Column composition is either one folded tree (doubles
  * per level — 2¹⁶ nodes, planner death) or 16 chained projections —
  * which Catalyst's CollapseProject merges back BY SUBSTITUTION into the
  * same exponential tree (measured 7.6 s for 600k rows of pure integer
  * math). A 16-iteration loop in generated code is the honest shape:
  * allocation-free, whole-stage-codegen'd, linear.
  *
  * The DuckDB oracle replays the identical walk as 16 chained CTEs
  * (graft.operators.Layout.hilbertSql) — pure integer compares/adds/
  * flips, bit-identical.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_xy2d requires two BIGINT arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_xy2d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << 15; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_xy2d",
      (children: Seq[Expression]) => {
        require(children.size == 2, "hilbert_xy2d takes exactly 2 arguments")
        HilbertIndexExpr(children.head, children(1))
      },
      "built-in")
}

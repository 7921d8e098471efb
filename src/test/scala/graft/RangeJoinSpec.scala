package graft

import graft.operators.Relational

/** Bucketed interval join: correctness against the naive range join and the
  * plan-shape claim (equi-join on the bucket grid, no nested-loop join).
  */
class RangeJoinSpec extends SparkTestBase {

  test("bucketed range join returns exactly the naive range join's pairs") {
    val bucketed = Relational.rangeJoinBucketed(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = Relational.rangeJoinNaive(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == naive,
      s"bucketed \\ naive = ${(bucketed -- naive).take(3)}; " +
        s"naive \\ bucketed = ${(naive -- bucketed).take(3)}")
    assert(naive.nonEmpty, "testdata has purchase-attributable events")
  }

  test("bucketed range join plans as an equi-join, not a nested loop") {
    val p = Relational.rangeJoinBucketed(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucket grid must make the join an equi-join:\n$p")
  }
}

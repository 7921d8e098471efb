package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Accuracy bounds for the sketch aggregates (no byte-exact oracle exists
  * for approximate operators — the contract is the error bound).
  */
class RelationalSketchSpec extends SparkTestBase {

  test("HLL++ distinct counts are within 5% of exact; percentiles bracket the data") {
    val sketch = Relational.sketchProfile(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("users"),
        min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(sketch.keySet == exact.keySet)
    exact.foreach { case (k, (users, lo, hi)) =>
      val (approxUsers, p50, p99) = sketch(k)
      assert(math.abs(approxUsers - users) <= math.max(1L, (users * 0.05).toLong),
        s"$k: approx $approxUsers vs exact $users")
      assert(p50 >= lo && p50 <= hi && p99 >= p50 && p99 <= hi,
        s"$k: percentiles out of range: p50=$p50 p99=$p99 in [$lo,$hi]")
    }
  }

  test("HLL sketches are EXACTLY mergeable: union of halves == whole") {
    // registers merge by max, so this is bit-equality of the re-aggregated
    // rollup with the direct computation — the property that lets stored
    // per-partition sketches answer any coarser rollup without rescanning
    val merged = Relational.sketchMergeProfile(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      s"merged half-sketches must equal the whole-corpus sketch: $merged vs $direct")
  }

  test("CMS counts: merged half-sketches equal exact counts (collision-free domain)") {
    // the frequency-sketch analogue of the HLL property above, stronger:
    // with 5 keys in 2000-counter rows and a pinned seed, the merged CMS
    // point estimates equal the TRUE counts (CMS only over-estimates, and
    // only on full-depth collisions — probability ~1e-14 here)
    val est = Relational.sketchCmsCounts(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$Sf/events.parquet")
      .filter(col("event_type").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact, s"CMS estimates must be exact here: $est vs $exact")
  }
}

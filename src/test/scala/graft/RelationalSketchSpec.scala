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

  test("sketch_merge_exact certificate: every event type flags true") {
    val rows = Relational.sketchMergeExact(spark, Sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(1)),
      s"merge certificate must be all-true: ${rows.mkString(",")}")
  }

  test("DDSketch buckets: half-corpus sketches SUM to the whole; quantiles within α") {
    // quantile member of the mergeable-sketch family: bucket tables merge
    // by adding counts (exact, like the HLL/CMS properties above), and the
    // extracted representative is within α = 1% relative error of the true
    // rank statistic — DDSketch's published guarantee
    val whole = Relational.sketchQuantileBuckets(spark, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .filter(col("value").isNotNull && !isnan(col("value")))
    // merge = plain addition of the two half-corpus bucket tables
    def half(m: Int) = ev.filter(col("event_id") % 2 === m)
      .select(col("event_type"),
        when(col("value") > 0, 1).when(col("value") < 0, -1).otherwise(0).as("sign"),
        when(col("value") === 0, lit(0L))
          .otherwise(ceil(log(abs(col("value"))).cast("float").cast("double")
            / lit(Relational.DdLnGamma))).as("bucket"))
      .groupBy("event_type", "sign", "bucket").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val (h0, h1) = (half(0), half(1))
    val summed = (h0.keySet ++ h1.keySet)
      .map(k => k -> (h0.getOrElse(k, 0L) + h1.getOrElse(k, 0L))).toMap
    assert(summed == whole, "half-corpus bucket tables must sum to the whole")

    val got = Relational.sketchQuantileValues(spark, Sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getFloat(2)).toMap
    val exactVals = ev.select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    exactVals.foreach { case (k, vs) =>
      for (q <- Seq(0.5, 0.99)) {
        val rank = math.max(1, math.ceil(q * vs.length).toLong).toInt
        val truth = vs(rank - 1)
        val rep = got((k, q)).toDouble
        assert(math.abs(rep - truth) <= 0.0101 * math.abs(truth) + 1e-9,
          s"$k q=$q: rep $rep vs exact $truth exceeds α")
      }
    }
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

  test("HLL intersection: inclusion-exclusion lands within 10% of exact") {
    val est = Relational.sketchHllIntersect(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    val exact = Relational.sketchIntersectExact(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(est.keySet == exact.keySet, "same pair domain")
    exact.foreach { case (k, truth) =>
      val rep = est(k)
      // lgConfigK=12 HLL is ~1.6% per estimate; inclusion-exclusion
      // stacks three of them, so 10% + a small-count floor
      assert(math.abs(rep - truth).toDouble <= 0.10 * truth + 5.0,
        s"$k: est $rep vs exact $truth outside the band")
    }
    // the union estimate can never undershoot either side (registers
    // merge by max), so the clamped intersection never exceeds a side
    val bad = Relational.sketchHllIntersect(spark, Sf)
      .filter(col("est_intersect") > col("est_a")
        || col("est_intersect") > col("est_b"))
    assert(bad.isEmpty, "intersection estimate must not exceed a side")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Behavior specs for the round-10 operators: top-principal-component
  * training (one-pass fixed-point moments + driver power iteration) and
  * the map-side PC1 projection. Label propagation's specs live with the
  * other graph loops in CurationOpsSpec/PlanAuditSpec.
  */
class Round10OpsSpec extends SparkTestBase {

  test("pca component: unit norm, canonical sign, positive eigenvalue, memoized") {
    val t = Pca.topComponent(spark, Sf)
    val norm2 = t.component.map(x => x * x).sum
    // the L2 normalize runs through floor-fixed-point sums whose error is
    // RELATIVE to ‖y‖ ≈ eigenvalue (small), not absolute — the drift
    // bound is ~d×10⁻⁹/λ², a few 10⁻⁵ at this corpus's λ
    assert(math.abs(norm2 - 1.0) < 1e-3, s"component norm² $norm2")
    assert(t.component(0) >= 0.0, "sign canonicalization: first coord >= 0")
    assert(t.eigenvalue > 0.0)
    // train-once memo: the second call must return the cached artifact
    assert(Pca.topComponent(spark, Sf) eq t)
  }

  test("pca projection: centered scores (zero mean up to fix-point drift), deterministic") {
    val p = Pca.project(spark, Sf).cache()
    val mean = p.agg(avg("pc1")).collect()(0).getDouble(0)
    // E[(x-m)·v] = (E[x]-m)·v: m carries ≤10⁻⁶ per-dim quantization and
    // each row's fold ≤ d×10⁻⁹ — the score mean must sit near zero
    assert(math.abs(mean) < 1e-2, s"projection mean $mean")
    val again = Pca.project(spark, Sf).collect().toSeq
    assert(p.collect().toSeq == again, "bit-identical re-run")
    p.unpersist()
  }

  test("knn graph: per-node rank contract and exact agreement with the query-side LSH top-k") {
    import graft.operators.Similarity
    val g = Similarity.knnGraph(spark, Sf).cache()
    // rank contract: ≤k consecutive ranks per src, sims non-increasing
    val byRank = g.groupBy("src")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"))
    assert(byRank.filter(col("n") =!= col("maxr") || col("n") > 5).isEmpty,
      "ranks must be consecutive 1..n with n <= k")
    // the graph restricted to the LSH query ids IS the query-side top-k
    // (same bands, same planes, same tie-breaks) — column names aside
    val fromGraph = g.filter(col("src") < 10)
      .select(col("src").as("qid"), col("rank"), col("dst").as("vec_id"), col("sim"))
      .collect().toSeq
    val fromTopK = Similarity.lshCosineTopK(spark, Sf, planesPerBand = 8)
      .collect().toSeq
    assert(fromGraph == fromTopK)
    g.unpersist()
  }

  test("pca captures the dominant direction: pc1 variance ~ eigenvalue, >= any axis variance") {
    val t = Pca.topComponent(spark, Sf)
    val p = Pca.project(spark, Sf)
    val stats = p.agg(avg("pc1").as("m"), avg(col("pc1") * col("pc1")).as("m2"))
      .collect()(0)
    val varPc1 = stats.getDouble(1) - stats.getDouble(0) * stats.getDouble(0)
    // after Iters power rounds the Rayleigh estimate and the realized
    // projection variance must agree to a few percent
    assert(math.abs(varPc1 - t.eigenvalue) / t.eigenvalue < 0.05,
      s"var(pc1)=$varPc1 vs eigenvalue=${t.eigenvalue}")
    // and the learned direction must beat every axis-aligned one: its
    // variance is at least the largest covariance diagonal (within the
    // same few-percent convergence tolerance)
    val emb = graft.sources.IO.table(spark, Sf, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg((avg(col("x") * col("x")) - avg("x") * avg("x")).as("axisVar"))
      .agg(max("axisVar")).collect()(0).getDouble(0)
    assert(varPc1 > emb * 0.95,
      s"var(pc1)=$varPc1 must dominate best axis variance $emb")
  }
}

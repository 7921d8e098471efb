package graft

/** Scratch timing harness for the IVF-bounded rows' √N-nlist scale path
  * (not a test — a main invoked manually while profiling; kept out of
  * src/main so it never ships).
  *
  * The registered `emb_margin_pairs_ivf` / `emb_training_triplets` rows
  * pin nlist=16 because their DuckDB oracles replay that exact Lloyd
  * training. At a ×10 cut the pinned-nlist candidate volume grows
  * Σ|cell|² ≈ N²/nlist — the documented scale posture is nlist ∝ √N.
  * This main measures both settings at the same cut so the probe
  * payload can show the √N path, plus the IVF row's pair recall vs the
  * exact-margin baseline (the mining-quality number CCMatrix reports).
  */
object IvfScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val nlistScaled = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = GraftSession.build("ivf-scale-timer")
    import graft.operators.Similarity
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JIT + read path)
    noop(Similarity.marginBitextPairsIvf(spark, sfDir))
    time("margin_ivf_nlist16")(
      noop(Similarity.marginBitextPairsIvf(spark, sfDir)))
    time(s"margin_ivf_nlist$nlistScaled")(
      noop(Similarity.marginBitextPairsIvf(spark, sfDir,
        nlist = nlistScaled)))
    time("triplets_nlist16")(
      noop(Similarity.trainingTriplets(spark, sfDir)))
    time(s"triplets_nlist$nlistScaled")(
      noop(Similarity.trainingTriplets(spark, sfDir,
        nlist = nlistScaled)))

    // mining quality: how many exact-margin pairs the cell-bounded
    // variants recover (src_id, tgt_id) — the eval-suite convention
    val exact = Similarity.marginBitextPairs(spark, sfDir)
      .select("src_id", "tgt_id").localCheckpoint()
    val nExact = exact.count()
    for (nl <- Seq(16, nlistScaled)) {
      val got = Similarity.marginBitextPairsIvf(spark, sfDir, nlist = nl)
        .select("src_id", "tgt_id")
      val hit = exact.intersect(got).count()
      println(s"RECALL margin_ivf nlist=$nl: $hit/$nExact")
    }
    spark.stop()
  }
}

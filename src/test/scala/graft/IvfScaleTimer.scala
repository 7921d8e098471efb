package graft

/** Scratch timing harness for the IVF-bounded rows' √N-nlist scale path
  * (not a test — a main invoked manually while profiling; kept out of
  * src/main so it never ships).
  *
  * The registered `emb_margin_pairs_ivf` / `emb_training_triplets` rows
  * historically pinned nlist=16; at a ×10 cut the pinned-nlist candidate
  * volume grows Σ|cell|² ≈ N²/nlist, so the scale posture is nlist ∝ √N
  * with nprobe scaled to hold the probed fraction. This main measures
  * (nlist, nprobe) combos at the same cut: wall time plus the IVF row's
  * pair recall vs the exact-margin baseline (the mining-quality number
  * CCMatrix reports).
  *
  * Usage: Test/runMain graft.IvfScaleTimer <sfDir> <nl:np,nl:np,...>
  */
object IvfScaleTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val combos: Seq[(Int, Int)] = args.lift(1).getOrElse("16:4,142:9")
      .split(',').toSeq.map { s =>
        val Array(nl, np) = s.split(':'); (nl.toInt, np.toInt)
      }
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
    combos.foreach { case (nl, np) =>
      time(s"margin_ivf_nlist${nl}_nprobe$np")(
        noop(Similarity.marginBitextPairsIvf(spark, sfDir,
          nlist = nl, nprobe = np)))
    }
    time("triplets_nlist16")(
      noop(Similarity.trainingTriplets(spark, sfDir)))
    time(s"triplets_nlist${combos.last._1}")(
      noop(Similarity.trainingTriplets(spark, sfDir,
        nlist = combos.last._1)))

    // mining quality: how many exact-margin pairs the cell-bounded
    // variants recover (src_id, tgt_id) — the eval-suite convention
    val exact = graft.operators.Similarity.marginBitextPairs(spark, sfDir)
      .select("src_id", "tgt_id").localCheckpoint()
    val nExact = exact.count()
    combos.foreach { case (nl, np) =>
      val got = Similarity.marginBitextPairsIvf(spark, sfDir,
          nlist = nl, nprobe = np)
        .select("src_id", "tgt_id")
      val hit = exact.intersect(got).count()
      println(s"RECALL margin_ivf nlist=$nl nprobe=$np: $hit/$nExact")
    }
    spark.stop()
  }
}

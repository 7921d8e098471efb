package graft

/** Scratch ×100 probe (test scope, manual main): adaptive-geometry
  * margin mining and the pair-budgeted exact baseline at the sf10 cut —
  * the decade-up evidence for the √N nlist rule and, since round 13,
  * for the IVF row's 16M-pair budget (without it the ~1.25B-candidate
  * frame saturated one node and the round-12 run was killed at ~22
  * min). Also reports pair recall of the budgeted IVF row against the
  * budgeted exact baseline: both caps share the md5 salt and the exact
  * cut is always the tighter one, so every exact-sampled src survives
  * the IVF split and recall is measured over a common src population.
  */
object X100Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = GraftSession.build("x100-probe")
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"X100 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ivf = time("margin_ivf_adaptive_budgeted")(
      graft.operators.Similarity.marginBitextPairsIvf(spark, sfDir)
        .localCheckpoint())
    println(s"X100 margin_ivf rows ${ivf.count()} " +
      s"candidates ${graft.operators.Similarity.lastMarginIvfCandidates}")
    val exact = time("margin_exact_capped")(
      graft.operators.Similarity.marginBitextPairs(spark, sfDir)
        .localCheckpoint())
    val nExact = exact.count()
    println(s"X100 margin_exact rows $nExact")
    val hit = ivf.select("src_id", "tgt_id")
      .join(exact.select("src_id", "tgt_id"), Seq("src_id", "tgt_id"))
      .count()
    println(s"X100 recall $hit/$nExact")
    spark.stop()
  }
}

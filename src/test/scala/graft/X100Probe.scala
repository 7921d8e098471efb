package graft

/** Scratch ×100 probe (test scope, manual main): adaptive-geometry
  * margin mining and the pair-budgeted exact baseline at the sf10 cut —
  * the decade-up evidence for the √N nlist rule. Deliberately SKIPS
  * fixed-nlist arms: at 200k vectors nlist=16 is the N²/16 cliff the
  * rule exists to avoid (a prior run was killed at 28 min).
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
    def cnt(df: org.apache.spark.sql.DataFrame): Long = df.count()
    val n1 = time("margin_ivf_adaptive")(
      cnt(graft.operators.Similarity.marginBitextPairsIvf(spark, sfDir)))
    println(s"X100 margin_ivf rows $n1")
    val n2 = time("margin_exact_capped")(
      cnt(graft.operators.Similarity.marginBitextPairs(spark, sfDir)))
    println(s"X100 margin_exact rows $n2")
    spark.stop()
  }
}

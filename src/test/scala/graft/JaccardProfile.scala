package graft

import org.apache.spark.sql.functions._

/** Scratch stage profiler for the jaccard prefix join (test scope,
  * manual main): times index build, candidate join, and verify
  * separately and prints stage row counts — the numbers behind any
  * further pruning decision.
  *
  * Usage: Test/runMain graft.JaccardProfile <sfDir>
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("jaccard-profile")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"JPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    graft.operators.Dedup.jaccardPrefixPairs(spark, sfDir).count()

    val docs = graft.sources.IO.table(spark, sfDir, "documents")
    val toks = time("toks_checkpoint") {
      docs.select(col("doc_id"),
        array_sort(transform(graft.operators.Dedup.gramSet(col("text")),
          g => xxhash64(g))).as("toks"))
        .localCheckpoint()
    }
    println(s"JPROF toks_rows ${toks.count()}")
    val pre = time("prefix_index") {
      graft.operators.Dedup.jaccardPrefixIndex(toks).localCheckpoint()
    }
    println(s"JPROF prefix_rows ${pre.count()}")
    val verified = time("cand_plus_verify") {
      graft.operators.Dedup.jaccardVerifiedFrom(toks, pre, 1000000L)
        .localCheckpoint()
    }
    println(s"JPROF verified_rows ${verified.count()}")
    val full = time("end_to_end") {
      graft.operators.Dedup.jaccardPrefixPairs(spark, sfDir).count()
    }
    println(s"JPROF full_rows $full")
    spark.stop()
  }
}

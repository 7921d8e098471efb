package graft

/** Benchmark main — runs the headline queries (the ones BASELINE.md prices)
  * plus the LLM-pipeline operators on SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line. A failed query is reported as an explicit error entry (and excluded
  * from the total) rather than a fake timing.
  */
object Bench {

  /** Headline subset: keep the bench signal readable — full operator
    * coverage is Verify's job, timing trends are this one's.
    */
  private val headliners = Seq(
    "q1_pricing_summary", "q_join_agg", "q_star_join",
    "o1_sort_desc_string", "w1_row_number_topk",
    "ps_part2_best_apps", "ps_part3_standardize", "ps_part5_metrics",
    "dedup_exact", "dedup_minhash_pairs", "dedup_simhash_pairs",
    "ann_topk_bruteforce", "ann_topk_lsh",
    "txt_token_counts", "txt_fingerprints", "mm_features")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    val results: Seq[(String, Either[String, Double])] = headliners.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            name -> Left(e.getClass.getSimpleName)
        }
      }
    }

    val qs = results.map {
      case (k, Right(sec)) => s""""$k":$sec"""
      case (k, Left(err)) => s""""$k":"ERROR:$err""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(s)) => s }.sum
    val errors = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}

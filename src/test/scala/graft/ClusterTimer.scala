package graft

/** Scratch timing harness for the clustering path (not a test — a main
  * invoked manually while profiling; kept out of src/main so it never
  * ships).
  */
object ClusterTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("cluster-timer")
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    graft.operators.Dedup.simHashNearDupPairsMd5Unsorted(spark, sfDir).count()
    time("pairs_only") {
      graft.operators.Dedup.simHashNearDupPairsMd5Unsorted(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = graft.operators.Dedup
      .simHashNearDupPairsMd5Unsorted(spark, sfDir).localCheckpoint()
    val (comp, rounds) = time("contraction_only") {
      val r = graft.operators.Cluster.componentsWithRounds(pairs, "doc_a", "doc_b")
      r._1.write.format("noop").mode("overwrite").save()
      r
    }
    println(s"TIMER rounds=$rounds edges=${pairs.count()} nodes=${comp.count()}")
    // decompose one round: pre-shrunk frame, then each phase separately
    locally {
      import org.apache.spark.sql.functions._
      val oriented = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      val t0 = System.nanoTime()
      val e0 = oriented.localCheckpoint()
      println(f"TIMER phase_checkpoint_input ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      val t1 = System.nanoTime()
      val ss = e0.withColumn("m", min("v").over(w))
      val ssOut = ss.select(col("v").as("u"), col("m").as("v"))
        .union(ss.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct().localCheckpoint()
      println(f"TIMER phase_smallstar ${(System.nanoTime() - t1) / 1e9}%.2f s (${ssOut.count()} edges)")
      val t2 = System.nanoTime()
      val sym = ssOut.union(ssOut.select(col("v").as("u"), col("u").as("v")))
      val ls = sym.withColumn("m", least(min("v").over(w), col("u")))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).localCheckpoint()
      println(f"TIMER phase_largestar ${(System.nanoTime() - t2) / 1e9}%.2f s (${ls.count()} edges)")
      val t3 = System.nanoTime()
      val r = ssOut.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).head()
      println(f"TIMER phase_signature ${(System.nanoTime() - t3) / 1e9}%.2f s ($r)")
    }
    time("decision_full") {
      graft.operators.Cluster.dedupDecisionMd5(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch timing harness for the near-dup decontamination path (not a
  * test — a main invoked manually while profiling; kept out of src/main
  * so it never ships).
  */
object DecontamTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("decontam-timer")
    import graft.operators.{Decontaminate, Dedup}
    import graft.sources.IO
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

    val docs = IO.table(spark, sfDir, "documents")
      .withColumn("bucket",
        (conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long") % 100))
      .select(col("doc_id"), col("text"), col("bucket"))
    // warm-up
    noop(Decontaminate.nearDupContaminationReport(spark, sfDir))
    time("full_live")(noop(Decontaminate.nearDupContaminationReport(spark, sfDir)))
    time("full_stored")(noop(Decontaminate.nearDupContaminationReportStored(spark, sfDir)))
    time("train_banding")(noop(Dedup.minHashBandedTokensMd5From(
      docs.filter(col("bucket") < 95), 32, 8)))
    time("eval_banding")(noop(Dedup.minHashBandedTokensMd5From(
      docs.filter(col("bucket") >= 95), 32, 8)))
    val trainBanded = Dedup.minHashBandedTokensMd5From(
      docs.filter(col("bucket") < 95), 32, 8).localCheckpoint()
    val evalBanded = Dedup.minHashBandedTokensMd5From(
      docs.filter(col("bucket") >= 95), 32, 8).localCheckpoint()
    val cand = time("cand_distinct") {
      val c = trainBanded
        .join(broadcast(evalBanded
          .select(col("doc_id").as("eval_id"), col("band_key"))), "band_key")
        .select("doc_id", "eval_id")
        .distinct()
        .localCheckpoint()
      println(s"TIMER cand_rows=${c.count()}")
      c
    }
    def verifyWith(tokExpr: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val trainTok = docs.filter(col("bucket") < 95)
        .select(col("doc_id"), tokExpr(col("text")).as("tok_a"))
      val evalTok = docs.filter(col("bucket") >= 95)
        .select(col("doc_id").as("eval_id"), tokExpr(col("text")).as("tok_b"))
      noop(cand
        .join(trainTok, "doc_id")
        .join(broadcast(evalTok), "eval_id")
        .withColumn("inter",
          size(array_intersect(col("tok_a"), col("tok_b"))).cast("double"))
        .withColumn("jaccard",
          col("inter")
            / (size(col("tok_a")) + size(col("tok_b")) - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_eval_matches"),
          max(struct(col("jaccard"), (-col("eval_id")).as("neg_eval"))).as("best")))
    }
    time("verify_tail_strings")(verifyWith(t => array_distinct(split(t, " "))))
    time("verify_tail_hashed")(verifyWith(t =>
      array_distinct(transform(split(t, " "), x => xxhash64(x)))))
    time("verify_tail_strings2")(verifyWith(t => array_distinct(split(t, " "))))
    time("verify_tail_hashed2")(verifyWith(t =>
      array_distinct(transform(split(t, " "), x => xxhash64(x)))))
    spark.stop()
  }
}

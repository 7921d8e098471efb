package graft

import org.apache.spark.sql.functions._

/** ×N-cut validation for the triplet miner (not a test — a main
  * invoked manually; kept out of src/main so it never ships).
  *
  * The DuckDB oracle replay is slow at ANY cut above sf0.1 — the
  * within-cell argmax CTE pushes the pairwise list-cosine work through
  * single-node windows. Measured: ×10 exceeded 15 min in r11 AND r12;
  * round 13 ran the minimal ×2 cut (4k vectors, adaptive nlist 64) to
  * completion: HASH-EXACT in 1179 s (CORRECTNESS_sf1_r13.json) — the
  * first full cross-engine replay of the triplet miner above the
  * driver gate. 19.7 min still exceeds the driver's 15-min budget, so
  * the per-round ×N exception STANDS for budget reasons (not
  * correctness): `emb_training_triplets` is oracled (hash-exact) at
  * the driver's sf0.01 gate and at the committed ×2 evidence cut, and
  * larger cuts are validated by this probe — the same contract proved
  * Spark-side with INDEPENDENT recomputation: every positive shares
  * the anchor's near-dup component, every negative sits in the
  * anchor's IVF cell outside its component, and no same-cell
  * non-component candidate beats the emitted negative — the
  * Round11LateOpsSpec assertions at probe scale.
  */
object TripletsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = GraftSession.build("triplets-probe")
    import graft.operators.{Cluster, Similarity}

    val t0 = System.nanoTime()
    val t = Similarity.trainingTriplets(spark, sfDir).localCheckpoint()
    val n = t.count()
    println(f"ROWS $n  build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val comp = Cluster.nearDupComponentsMd5(spark, sfDir)
    def compOf(idCol: String, as: String) = comp
      .select(col("doc_id").as(idCol), col("component_id").as(as))
    val cells = Similarity.kmeansAssignments(spark, sfDir)
    def cellOf(idCol: String, as: String) = cells
      .select(col("vec_id").as(idCol), col("cid").as(as))
    val enriched = t
      .join(compOf("anchor_id", "ac"), "anchor_id")
      .join(compOf("positive_id", "pc"), "positive_id")
      .join(compOf("negative_id", "nc"), "negative_id")
      .join(cellOf("anchor_id", "acell"), "anchor_id")
      .join(cellOf("negative_id", "ncell"), "negative_id")
      .localCheckpoint()
    val badPos = enriched.filter(col("ac") =!= col("pc")).count()
    val negInComp = enriched.filter(col("ac") === col("nc")).count()
    val negOffCell = enriched.filter(col("acell") =!= col("ncell")).count()
    println(s"CHECK pos_outside_component=$badPos " +
      s"neg_inside_component=$negInComp neg_outside_cell=$negOffCell")

    val emb = sources.IO.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val rivals = enriched.select("anchor_id", "ac", "acell", "neg_sim")
      .join(cells.select(col("vec_id").as("cand_id"), col("cid").as("acell")),
        "acell")
      .join(compOf("cand_id", "cand_comp"), "cand_id")
      .filter(col("cand_comp") =!= col("ac"))
      .join(emb.select(col("vec_id").as("anchor_id"), col("v").as("av")),
        "anchor_id")
      .join(emb.select(col("vec_id").as("cand_id"), col("v").as("cv")),
        "cand_id")
      .withColumn("s", expr("cosine_sim(av, cv)").cast("float"))
      .filter(col("s") > col("neg_sim"))
      .count()
    println(s"CHECK argmax_rivals=$rivals")
    println(if (badPos + negInComp + negOffCell + rivals == 0)
      "PROBE_RESULT pass" else "PROBE_RESULT FAIL")
    spark.stop()
  }
}

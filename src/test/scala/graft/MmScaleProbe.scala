package graft

import org.apache.spark.sql.functions._

/** ×N wall/mass probe for the media near-dup family (scratch main, test
  * scope — never ships). The naive DuckDB replay is the per-round
  * correctness anchor up to ×10; past that the all-pairs oracle is the
  * bottleneck, so this probe answers the two SCALE questions directly
  * Spark-side: does the banded join complete comfortably, and how does
  * TRUE pair mass grow (the quantity the r14/r15 verdicts graded —
  * neighbors-per-media must stay near-constant, not quasi-quadratic;
  * the r16 exit bar is ×100 TOTAL mass within ~2× of the ×10 value)?
  *
  * Usage: Test/runMain graft.MmScaleProbe /tmp/sf10
  */
object MmScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = GraftSession.build("mm-scale-probe")
    import graft.operators.Multimodal
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"MMSCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // focused mode: time ONLY the curation live/stored pair in a fresh
    // session (the full probe holds ~15 checkpointed frames by the time
    // the capstone runs — session aging contaminates its wall there)
    if (args.contains("curation")) {
      Multimodal.persistMediaFace(spark, sfDir)
      val s1 = time("curation_stored")(
        Multimodal.curationDecisionsStored(spark, sfDir).localCheckpoint())
      println(s"MMSCALE curation_stored rows ${s1.count()}")
      val l1 = time("curation_live")(
        Multimodal.curationDecisions(spark, sfDir).localCheckpoint())
      println(s"MMSCALE curation_live rows ${l1.count()}")
      spark.stop(); return
    }
    // stream-start wall: time from mediaGateStream construction through
    // the first micro-batch verdict write, faces PRE-PRIMED (r18: the
    // stream reads the persisted face — stream (re)start must cost a
    // thin artifact scan, not the corpus decode it used to pay)
    if (args.contains("stream")) {
      Multimodal.persistMediaFace(spark, sfDir)
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val arrivals = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 10 === 0)
        .select("doc_id").limit(500).collect().map(_.getLong(0)).toSeq
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val outDir = graft.sources.IO.scratchDir("mm_stream_probe")
      time("gate_stream_start_plus_batch1") {
        val q = Multimodal.mediaGateStream(spark, sfDir,
          mem.toDF().toDF("media_id"), outDir)
        try {
          mem.addData(arrivals)
          q.processAllAvailable()
        } finally q.stop()
      }
      println(s"MMSCALE gate_stream_rows ${spark.read.parquet(s"$outDir/decisions").count()}")
      spark.stop(); return
    }
    // price the three artifact-read idioms against each other on ONE
    // machine state: (a) plain nullable parquet read, (b) the r17
    // createDataFrame(rdd, schema) round-trip, (c) the r18 plan-level
    // stamped read — each feeding the identical decontam serve core
    if (args.contains("readmodes")) {
      val path = Multimodal.persistMediaFace(spark, sfDir)
      def serve(face: org.apache.spark.sql.DataFrame, label: String): Unit = {
        val d = time(s"decontam_over_$label")(
          Multimodal.decontamReportOver(face, Multimodal.NearDupLenWindow,
            Multimodal.MediaFpMaxHamming, Multimodal.MediaFpL1Window)
            .localCheckpoint())
        println(s"MMSCALE decontam_over_$label rows ${d.count()}")
      }
      val faceCols = Multimodal.MediaFaceSchema.fieldNames.toSeq
      serve(spark.read.parquet(path)
        .select(faceCols.map(col): _*), "raw_nullable")
      serve(spark.createDataFrame(
        spark.read.parquet(path).rdd, Multimodal.MediaFaceSchemaV3)
        .select(faceCols.map(col): _*), "rdd_roundtrip")
      serve(graft.sources.IO.readStamped(spark, path, Multimodal.MediaFaceSchemaV3)
        .select(faceCols.map(col): _*), "stamped")
      spark.stop(); return
    }
    // stage-level dissection of the stored-vs-live curation gap
    if (args.contains("curstages")) {
      Multimodal.persistMediaFace(spark, sfDir)
      val liveFace = time("face_live_build")(
        Multimodal.fingerprintFace(spark, sfDir).localCheckpoint())
      println(s"MMSCALE live_face parts ${liveFace.rdd.getNumPartitions} rows ${liveFace.count()}")
      val rawRead = spark.read.parquet(Multimodal.mediaFaceArtifactPath(spark, sfDir))
      println(s"MMSCALE stored_schema ${rawRead.schema.map(f => s"${f.name}:${f.nullable}").mkString(",")}")
      println(s"MMSCALE live_schema ${liveFace.schema.map(f => s"${f.name}:${f.nullable}").mkString(",")}")
      val storedFace = time("face_stored_read")(
        spark.createDataFrame(rawRead.rdd, liveFace.schema)
          .repartition(spark.sparkContext.defaultParallelism).localCheckpoint())
      println(s"MMSCALE stored_face parts ${storedFace.rdd.getNumPartitions} rows ${storedFace.count()}")
      val ps = time("pairs_over_stored")(
        Multimodal.nearDupPairsOver(storedFace, Multimodal.NearDupLenWindow,
          Multimodal.MediaFpMaxHamming, Multimodal.MediaFpL1Window,
          kindBlocked = true).localCheckpoint())
      println(s"MMSCALE pairs_over_stored ${ps.count()}")
      val pl = time("pairs_over_live")(
        Multimodal.nearDupPairsOver(liveFace, Multimodal.NearDupLenWindow,
          Multimodal.MediaFpMaxHamming, Multimodal.MediaFpL1Window,
          kindBlocked = true).localCheckpoint())
      println(s"MMSCALE pairs_over_live ${pl.count()}")
      val dl = time("decontam_over_live")(
        Multimodal.decontamReportOver(liveFace, Multimodal.NearDupLenWindow,
          Multimodal.MediaFpMaxHamming, Multimodal.MediaFpL1Window).localCheckpoint())
      println(s"MMSCALE decontam_over_live ${dl.count()}")
      val dsx = time("decontam_over_stored")(
        Multimodal.decontamReportOver(storedFace, Multimodal.NearDupLenWindow,
          Multimodal.MediaFpMaxHamming, Multimodal.MediaFpL1Window).localCheckpoint())
      println(s"MMSCALE decontam_over_stored ${dsx.count()}")
      spark.stop(); return
    }
    val nMedia = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val pairs = time("neardup_pairs")(
      Multimodal.nearDupPairs(spark, sfDir).localCheckpoint())
    val nPairs = pairs.count()
    println(f"MMSCALE media $nMedia pairs $nPairs " +
      f"neighbors_per_media ${2.0 * nPairs / nMedia}%.4f")
    // fast/md5 twin agreement at scale: the spec corpus pins EXACT
    // pair-set equality; here the overlap is quantified (~98% at x10)
    // and the symmetric difference characterized below
    val fast = time("neardup_pairs_fast")(
      Multimodal.nearDupPairsFast(spark, sfDir).localCheckpoint())
    val pairIds = pairs.select("media_a", "media_b")
    val fastIds = fast.select("media_a", "media_b")
    val pairsetDiff = pairIds.exceptAll(fastIds).count() +
      fastIds.exceptAll(pairIds).count()
    println(s"MMSCALE fast_pairs ${fast.count()} pairset_diff $pairsetDiff")
    // divergence characterization: pairs one face accepts and the
    // other rejects are genuinely-near window sets whose majority-vote
    // projection differs by hash family — measured 8..31 under the
    // rejecting face, 0..7 under the accepting one, ~2% of the accept
    // set at xN; byte-identical payloads can never diverge
    val fastFace = Multimodal.fingerprintFaceFast(spark, sfDir).localCheckpoint()
    // (rejHam = the REJECTING face's Hamming over the divergent pairs —
    // must sit >= 8, i.e. just outside the accept window; accHam = the
    // ACCEPTING face's — where in [0,7] the flipping pairs live. A
    // solid duplicate (identical bytes) has identical sigs under BOTH
    // families and can never diverge.)
    def crossHam(onlyIds: org.apache.spark.sql.DataFrame,
        rej: org.apache.spark.sql.DataFrame, acc: org.apache.spark.sql.DataFrame) =
      onlyIds
        .join(rej.select(col("media_id").as("media_a"), col("sig").as("sa"),
          col("n_bytes").as("na")), "media_a")
        .join(rej.select(col("media_id").as("media_b"), col("sig").as("sb")), "media_b")
        .join(acc.select(col("media_id").as("media_a"), col("sig").as("xa")), "media_a")
        .join(acc.select(col("media_id").as("media_b"), col("sig").as("xb")), "media_b")
        .select(expr("cast(bit_count(sa ^ sb) as int)").as("h"),
          expr("cast(bit_count(xa ^ xb) as int)").as("ah"), col("na"))
        .agg(min("h"), max("h"), min("ah"), max("ah"),
          min("na"), max("na"), count(lit(1))).collect()(0)
    val md5Face = Multimodal.fingerprintFace(spark, sfDir).localCheckpoint()
    if (pairsetDiff > 0) {
      println(s"MMSCALE fast_divergence (rejHamMin,rejHamMax,accHamMin,accHamMax,nMin,nMax,count) " +
        s"md5only ${crossHam(pairIds.exceptAll(fastIds), fastFace, md5Face)} " +
        s"fastonly ${crossHam(fastIds.exceptAll(pairIds), md5Face, fastFace)}")
    }
    if (args.contains("pairs")) { spark.stop(); return }
    val dec = time("dedup_decision")(
      Multimodal.nearDupDecision(spark, sfDir).localCheckpoint())
    val drop = dec.filter(!col("keep")).count()
    val maxC = dec.agg(max("cluster_size")).head.getLong(0)
    println(s"MMSCALE decision rows ${dec.count()} dropped $drop max_cluster $maxC")
    val inc = time("incremental")(
      Multimodal.incrementalNearDup(spark, sfDir).localCheckpoint())
    println(s"MMSCALE incremental rows ${inc.count()} " +
      s"matched ${inc.filter(!col("is_new")).count()}")
    val cnt = time("content_neardup")(
      Multimodal.contentNearDupPairs(spark, sfDir).localCheckpoint())
    val nCnt = cnt.count()
    println(f"MMSCALE content pairs $nCnt cross_fmt " +
      s"${cnt.filter(col("fmt_a") =!= col("fmt_b")).count()} " +
      f"neighbors_per_media ${2.0 * nCnt / nMedia}%.4f")
    val cdec = time("content_decision")(
      Multimodal.contentNearDupDecision(spark, sfDir).localCheckpoint())
    println(s"MMSCALE content decision rows ${cdec.count()} " +
      s"dropped ${cdec.filter(!col("keep")).count()} " +
      s"max_cluster ${cdec.agg(max("cluster_size")).head.getLong(0)} " +
      s"cross_fmt_components ${cdec.groupBy("component_id")
        .agg(countDistinct("fmt").as("f")).filter(col("f") > 1).count()}")
    val dcr = time("decontam")(
      Multimodal.decontamReport(spark, sfDir).localCheckpoint())
    println(s"MMSCALE decontam flagged ${dcr.count()}")
    // stored-face serve: prime the artifact untimed (the scheduled-job
    // cost), then time the pure serve path
    Multimodal.persistMediaFace(spark, sfDir)
    val dcs = time("decontam_stored")(
      Multimodal.decontamReportStored(spark, sfDir).localCheckpoint())
    println(s"MMSCALE decontam_stored flagged ${dcs.count()}")
    val cur = time("curation")(
      Multimodal.curationDecisions(spark, sfDir).localCheckpoint())
    println(s"MMSCALE curation " + cur.groupBy("decision").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
    // stored-face re-curation: prime the audited face untimed, then
    // time the decode-free sweep
    Multimodal.persistMediaFace(spark, sfDir)
    val curS = time("curation_stored")(
      Multimodal.curationDecisionsStored(spark, sfDir).localCheckpoint())
    println(s"MMSCALE curation_stored rows ${curS.count()} kept " +
      s"${curS.filter(col("decision") === "kept").count()}")
    // admission-gate branch coverage: all four decisions must ENGAGE at
    // xN, not just wall-time (the r16 gap — x100 was only ExplainQuery'd)
    val ing = time("ingest_decisions")(
      Multimodal.ingestDecisions(spark, sfDir).localCheckpoint())
    println(s"MMSCALE ingest rows ${ing.count()} branches " +
      ing.groupBy("decision").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
    // stored-face admission: only the batch decodes on the serve path
    val ingS = time("ingest_stored")(
      Multimodal.ingestDecisionsStored(spark, sfDir).localCheckpoint())
    println(s"MMSCALE ingest_stored rows ${ingS.count()} branches " +
      ingS.groupBy("decision").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Cluster, CorpusPrep, Relational, Similarity}

/** Behavior specs for the round-7 operators: Gopher rule battery, PII
  * report, Matryoshka two-stage ANN, temperature-balanced language
  * mixture, cluster-size profile, and the mergeSchema evolution read.
  */
class Round7OpsSpec extends SparkTestBase {

  private lazy val nDocs =
    spark.read.parquet(s"$Sf/documents.parquet").count()

  test("gopher rules: signals are in range and keep is exactly their conjunction") {
    val rules = TextAnalysis.gopherRules(spark, Sf)
    assert(rules.count() == nDocs)
    val recomputed = rules.withColumn("keep2",
      col("n_words").between(50, 100000)
        && col("mean_word_len").between(3.0, 10.0)
        && col("frac_alpha_words") >= 0.80
        && col("symbol_ratio") <= 0.10
        && col("stop_hits") >= 2)
    assert(recomputed.filter(col("keep") =!= col("keep2")).isEmpty,
      "keep must be the conjunction of the emitted signals")
    assert(rules.filter(
      col("frac_alpha_words") < 0 || col("frac_alpha_words") > 1
        || col("mean_word_len") <= 0 || col("symbol_ratio") < 0).isEmpty)
    // the battery must split the fixture, not rubber-stamp it
    val kept = rules.filter(col("keep")).count()
    assert(kept > 0 && kept < nDocs, s"keep=$kept of $nDocs should be a real split")
  }

  test("pii report: has_pii is the count disjunction, and scrub rewrites imply scrub-class hits") {
    val pii = TextAnalysis.piiReport(spark, Sf)
    assert(pii.count() == nDocs)
    assert(pii.filter(col("has_pii") =!=
      (col("n_emails") + col("n_urls") + col("n_ipv4") + col("n_long_numbers") > 0)).isEmpty)
    // every doc scrub rewrote must report at least one hit in a class
    // scrub redacts (emails/urls/long digit runs; ipv4 is report-only)
    val changed = TextAnalysis.scrub(spark, Sf)
      .filter(col("changed") === 1).select("doc_id")
    val clean = pii.filter(col("n_emails") + col("n_urls") + col("n_long_numbers") === 0)
      .select("doc_id")
    assert(changed.join(clean, "doc_id").isEmpty,
      "scrub changed a doc the report calls clean")
  }

  test("mrl two-stage equals brute force when the shortlist covers the corpus") {
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count().toInt
    val full = Similarity.mrlTopK(spark, Sf, prefixDims = 16, shortlist = n)
      .collect().toSeq
    val brute = Similarity.cosineTopK(spark, Sf).collect().toSeq
    assert(full == brute,
      "with an exhaustive shortlist the rerank must reproduce exact top-k")
  }

  test("mrl shortlist recall: prefix stage keeps most true top-5 neighbors") {
    // default config (prefix 32 of 64, shortlist 50 of ~500): the fixture
    // embeddings have NO trained MRL structure, so this measures the
    // half-dims floor, not the trained-prefix ceiling
    val mrl = Similarity.mrlTopK(spark, Sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopK(spark, Sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (mrl & brute).size.toDouble / brute.size
    assert(recall >= 0.6, f"prefix-32 shortlist-50 recall $recall%.2f too low")
  }

  test("temperature mixture: deterministic, tail languages kept whole at targetFrac=1") {
    val a = CorpusPrep.temperatureMixture(spark, Sf).collect().toSeq
    val b = CorpusPrep.temperatureMixture(spark, Sf).collect().toSeq
    assert(a == b, "content-hash acceptance must be run-deterministic")
    // τ<1 at full target: the SMALLEST language's rate hits the min(1,·)
    // cap (kept whole) while the LARGEST is down-weighted below 1
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val smallest = counts.minBy(_._2)._1
    val largest = counts.maxBy(_._2)._1
    val kept = CorpusPrep.temperatureMixture(spark, Sf, targetFrac = 1.0)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept(smallest) == counts(smallest),
      s"smallest lang $smallest must be kept whole at targetFrac=1")
    assert(kept(largest) < counts(largest),
      s"largest lang $largest must be down-weighted at targetFrac=1")
    // overall draw tracks the target fraction (hash uniformity)
    val frac = a.size.toDouble / nDocs
    assert(frac > 0.35 && frac < 0.65, f"kept fraction $frac%.2f far from 0.5 target")
  }

  test("domain stats: counts are consistent with the pii report's url counts") {
    val dom = TextAnalysis.domainStats(spark, Sf)
    val rows = dom.collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1,
        "n_urls >= n_docs >= 1 per domain")
      assert(r.getString(0) == r.getString(0).toLowerCase)
    }
    val totalUrls = TextAnalysis.piiReport(spark, Sf)
      .agg(sum("n_urls")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalUrls,
      "every URL occurrence must land in exactly one domain bucket")
  }

  test("cluster size profile partitions the corpus") {
    val prof = Cluster.clusterSizeProfile(spark, Sf)
    val rows = prof.collect()
    assert(rows.map(_.getLong(2)).sum == nDocs, "n_docs must sum to the corpus")
    rows.foreach { r =>
      assert(r.getLong(0) * r.getLong(1) == r.getLong(2),
        "n_docs must equal cluster_size * n_clusters per row")
    }
    assert(rows.map(_.getLong(0)).max > 1, "fixture plants near-dup clusters")
  }

  test("plan audit: gopher rules and pii report are map-side passes (one sort exchange only)") {
    for (df <- Seq(TextAnalysis.gopherRules(spark, Sf),
                   TextAnalysis.piiReport(spark, Sf))) {
      val p = df.queryExecution.executedPlan.toString
      // r20: IO.widened's round-robin may widen the narrow testdata scan
      // below the scoring kernels (no-op at production scan widths); the
      // map-side claim is that no KEYED exchange appears besides the
      // presentation sort
      val exchanges = p.linesIterator
        .count(l => l.contains("Exchange") && !l.contains("RoundRobinPartitioning"))
      assert(exchanges == 1, s"expected only the presentation-sort exchange:\n$p")
      assert(p.contains("rangepartitioning"), "the one exchange must be the sort")
    }
  }

  test("plan audit: mrl and temperature mixture never sort-merge join (all joins broadcast)") {
    val mrl = Similarity.mrlTopK(spark, Sf).queryExecution.executedPlan.toString
    assert(!mrl.contains("SortMergeJoin"),
      s"corpus must join shortlist/queries broadcast, never shuffle:\n$mrl")
    val mix = CorpusPrep.temperatureMixture(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!mix.contains("SortMergeJoin"),
      s"rates must broadcast back to the corpus side:\n$mix")
    assert(mix.contains("BroadcastHashJoin"), mix)
  }

  test("mergeSchema read null-pads the old generation only") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val merged = Relational.k9MergeSchemaRoundTrip(spark, Sf)
    assert(merged.count() == li.count())
    assert(merged.filter(col("l_orderkey") % 2 === 0
      && col("l_extendedprice").isNotNull).isEmpty,
      "old-generation rows must read the added column as NULL")
    assert(merged.filter(col("l_orderkey") % 2 === 1
      && col("l_extendedprice").isNull).isEmpty,
      "new-generation rows must carry their values")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events, Tokenize}
import graft.functions.TextAnalysis

/** Round-19 OPTIMIZATION pins — every rewrite this round must be
  * result-identical to the shape it replaced:
  *
  *   - BPE segment counting: the sentinel replace CHAIN (the new serving
  *     path) equals the per-word char-array FOLD (the reference
  *     semantics) on adversarial words, not just the corpus.
  *   - txt_repetition's top-token count: longest-equal-run-of-sorted
  *     equals the distinct×filter max-occurrence scan.
  *   - events_bt_ratings: the driver-side MM loop is bit-identical
  *     (float bits included) to the distributed broadcast-vector loop it
  *     short-circuits.
  *   - txt_lang_id: the scoring struct is evaluated ONCE (plan pin for
  *     the duplicated-subtree fix).
  */
class Round19OptSpec extends SparkTestBase {

  test("BPE chain segment counts equal the fold on adversarial words") {
    import spark.implicits._
    // overlap runs, merged-pair repeats, cross-merge adjacency, shared
    // components (o,w)/(o,r), empties from double spaces, words shorter
    // than any pair
    val docs = Seq(
      (1L, "erer rer eer erre"),
      (2L, "orow owor oorr roor"),
      (3L, "inin nini iinn"),
      (4L, "e r o w i n x"),
      (5L, "wow  or"),
      (6L, ""),
      (7L, "worer power inner winnow"))
      .toDF("doc_id", "text")
    val merges = Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r")
    val chain = Tokenize.bpeSegmentCountsChain(docs, merges)
      .orderBy("doc_id").collect()
    val fold = Tokenize.bpeSegmentCountsFold(docs, merges)
      .orderBy("doc_id").collect()
    assert(chain.toSeq === fold.toSeq)
  }

  test("repetition top_token_share run-length form equals the distinct-scan form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "z y x w v"),
      (3L, "t t t t"),
      (4L, "a b a b a b b b"),
      (5L, "solo"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("r19_rep_docs")
    val toks = TextAnalysis.wsTokens(col("text"))
    val oldForm = docs.select(col("doc_id"),
      aggregate(
        transform(array_distinct(toks), t => size(filter(toks, x => x === t))),
        lit(0), (acc, c) => greatest(acc, c)).as("top"))
    val newForm = docs
      .withColumn("toks", toks)
      .select(col("doc_id"), expr(
        """aggregate(array_sort(toks),
             named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
             (acc, t) -> named_struct(
               'prev', t,
               'run',  if(t = acc.prev, acc.run + 1, 1),
               'best', greatest(acc.best, if(t = acc.prev, acc.run + 1, 1))),
             acc -> acc.best)""").as("top"))
    assert(newForm.orderBy("doc_id").collect().toSeq
      === oldForm.orderBy("doc_id").collect().toSeq)
  }

  test("btRatings driver-side MM loop is bit-identical to the distributed loop") {
    val fast = Events.btRatings(spark, Sf).collect()
    // ceiling 0 forces the limit-fused collect to overflow -> the
    // distributed broadcast-vector loop serves
    val dist = Events.btRatings(spark, Sf, pairCollectCeiling = 0).collect()
    assert(fast.length === dist.length && fast.nonEmpty)
    fast.zip(dist).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(a.getLong(2) === b.getLong(2))
      assert(java.lang.Float.floatToIntBits(a.getFloat(3))
        === java.lang.Float.floatToIntBits(b.getFloat(3)),
        s"rating bits diverged for item ${a.getLong(0)}")
    }
  }

  test("langId evaluates the 5-language scoring struct once") {
    val plan = TextAnalysis.languageId(spark, Sf)
      .queryExecution.optimizedPlan.toString
    // the scoring expression carries one array_max per evaluation; the
    // pre-r19 inline form carried two (guard + emit)
    val evals = "array_max".r.findAllIn(plan).length
    assert(evals === 1, s"expected exactly 1 array_max in the plan, saw $evals")
  }

  test("winnow element_at gram/window chains equal the slice forms") {
    import spark.implicits._
    val (k, w) = (3, 4)
    // short docs (< k tokens), docs with < w grams, tie-heavy repeats
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a a a a a a"), (6L, "x y z x y z x y z x y"),
      (7L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val now = TextAnalysis.winnowFingerprintFrame(docs, k, w)
      .orderBy("doc_id", "fp").collect()
    val sliceForm = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("gh", expr(
        s"""transform(sequence(1, greatest(size(toks) - ${k - 1}, 1)),
            i -> cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i, $k)) as binary)), 1, 15), 16, 10) as bigint))"""))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          s"""transform(sequence(1, greatest(size(gh) - ${w - 1}, 1)),
              i -> array_min(slice(gh, i, $w)))"""))).as("fp"))
      .orderBy("doc_id", "fp").collect()
    assert(now.toSeq === sliceForm.toSeq)
  }

  test("IVF cell assignment is never duplicated into an inferred not-null filter") {
    // nullable cid let every cid-equi join infer an IsNotNull filter whose
    // constraint substitution inlined the whole literal-codebook distance
    // scan (2-3 evaluations per corpus row across the IVF/semantic
    // families). The coalesce-narrowed assignment leaves nothing to infer.
    for (df <- Seq(
      graft.operators.Similarity.ivfCosineTopK(spark, Sf),
      graft.operators.Similarity.semDedupDecisions(spark, Sf))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("isnotnull(element_at("),
        "assignment expression leaked into an inferred filter")
    }
  }

  test("fuzzy-lev verify pays at most one DP per conjunct site") {
    // the threshold kernel returns -1 past the bound, so `lev >= 0` is the
    // whole filter; the old second conjunct re-ran the banded DP per pair
    val plan = graft.operators.Dedup.fuzzyLevPairs(spark, Sf)
      .queryExecution.optimizedPlan.toString
    val evals = "levenshtein".r.findAllIn(plan).length
    assert(evals <= 2,
      s"expected <= 2 levenshtein sites (condition + projection), saw $evals")
  }

  test("ngram jaccard sized-intersect form matches the intersect/union definition") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(spark, Sf, maxDocId = 60L).collect()
    // recompute the textbook |∩|/|∪| per emitted pair and compare the
    // division results bit-for-bit
    val docs = graft.sources.IO.table(spark, Sf, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"),
        array_distinct(expr(
          """transform(sequence(0, greatest(size(split(text, ' ')) - 2, 0)),
               i -> concat_ws(' ', slice(split(text, ' '), i + 1, 2)))"""))
          .as("grams"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (docs(r.getLong(0)), docs(r.getLong(1)))
      val expectJ = (a & b).size.toDouble / (a | b).size
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        === java.lang.Double.doubleToLongBits(expectJ))
    }
  }
}

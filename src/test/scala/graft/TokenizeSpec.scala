package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorCentroidAggregator
import graft.operators.{Curate, Dedup, Tokenize}

/** Behavior specs for the round-6 operators: tokenizer training (vocab,
  * BPE), vector centroids, fuzzy edit-distance dedup, and the composed
  * curation pipeline — each checked against an independent driver-side
  * reference computation over the sf0.001 table.
  */
class TokenizeSpec extends SparkTestBase {

  private lazy val texts: Seq[String] =
    spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq

  // ---- reference implementations (plain Scala, no Spark) ----

  private def refWordCounts(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  /** Greedy left-to-right non-overlapping fusion of (l, r) in `syms`. */
  private def refFuse(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
      else acc :+ s
    }

  /** Reference BPE trainer: same statistic (pair counts weighted by word
    * frequency), same tie-break (count desc, lhs asc, rhs asc).
    */
  private def refBpeMerges(
      docs: Seq[String], n: Int): Seq[(String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      refWordCounts(docs).map { case (w, c) => w.split("").toVector -> c }
        .groupBy(_._1).map { case (k, g) => k -> g.values.sum }
    val out = Seq.newBuilder[(String, String, String, Long)]
    for (_ <- 1 to n) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((l, r, l + r, c))
        vocab = vocab.toSeq.map { case (syms, wc) => (refFuse(syms, l, r), wc) }
          .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      }
    }
    out.result()
  }

  // ---- vocabulary ----

  test("vocabulary matches a driver-side recount (counts and doc freq)") {
    val got = Tokenize.vocabulary(spark, Sf, topN = 10000).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val cnt = refWordCounts(docs.map(_._2))
    val dfq = docs.flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).distinct.size.toLong }
    assert(got.keySet == cnt.keySet)
    got.foreach { case (w, (c, d)) =>
      assert(c == cnt(w), s"count for '$w'")
      assert(d == dfq(w), s"doc_freq for '$w'")
    }
  }

  test("vocabulary top-N order is (cnt desc, word asc) and truncates") {
    val rows = Tokenize.vocabulary(spark, Sf, topN = 5).collect()
    assert(rows.length == 5)
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted, "rows must arrive in (cnt desc, word asc) order")
  }

  // ---- BPE ----

  test("bpeTrainMerges matches the reference trainer merge-for-merge") {
    val got = Tokenize.bpeTrainMerges(spark, Sf, numMerges = 6).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val want = refBpeMerges(texts, 6)
    assert(got.toSeq == want, s"merge tables differ:\n got: ${got.toSeq}\nwant: $want")
  }

  test("batched BPE trainer equals the sequential trainer merge-for-merge, in fewer rounds") {
    val sequential = Tokenize.bpeTrainMerges(spark, Sf, numMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val (batchedDf, rounds) =
      Tokenize.bpeTrainMergesBatchedWithRounds(spark, Sf, numMerges = 8, maxBatch = 4)
    val batched = batchedDf.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(batched.toSeq == sequential.toSeq,
      s"merge tables differ:\n batched: ${batched.toSeq}\n sequential: ${sequential.toSeq}")
    assert(rounds < 8, s"batching must need fewer count passes than merges, took $rounds")
  }

  test("bpeSegmentCounts equals driver-side greedy segmentation per doc") {
    val merges = Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r")
    val got = Tokenize.bpeSegmentCounts(spark, Sf, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect().foreach { row =>
        val (id, t) = (row.getLong(0), row.getString(1))
        val words = t.split(" ", -1).toVector
        val n = words.map { w =>
          merges.foldLeft(w.split("").toVector) {
            case (syms, (l, r)) => refFuse(syms, l, r)
          }.size.toLong
        }.sum
        assert(got(id) == ((words.size.toLong, n)), s"doc $id")
      }
  }

  test("BPE merges strictly shrink the segmented token count") {
    val none = Tokenize.bpeSegmentCounts(spark, Sf, Seq.empty)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    val four = Tokenize.bpeSegmentCounts(
      spark, Sf, Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r"))
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(none > four, s"4 merges must reduce tokens: $none vs $four")
  }

  // ---- vector centroids ----

  test("centroids match a driver-side fixed-point recomputation") {
    val got = VectorCentroidAggregator.perLabel(spark, Sf).collect()
      .map(r => r.getInt(0) -> ((r.getSeq[Double](1).toVector, r.getLong(2))))
      .toMap
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toVector)
    vecs.groupBy(_._1).foreach { case (label, g) =>
      val n = g.length
      val dim = g.head._2.length
      val sums = Array.fill(dim)(0L)
      g.foreach { case (_, v) =>
        v.zipWithIndex.foreach { case (x, i) =>
          sums(i) += math.floor(x.toDouble * 1e6).toLong
        }
      }
      val want = sums.toVector.map(s => s.toDouble / 1e6 / n)
      val (centroid, cnt) = got(label)
      assert(cnt == n.toLong)
      // fixed-point sums are exact and order-independent -> bit equality
      assert(centroid == want, s"label $label")
    }
  }

  test("centroids are partitioning-invariant (order-independent sums)") {
    val base = VectorCentroidAggregator.perLabelExploded(spark, Sf).collect().toSeq
    val repart = {
      import spark.implicits._
      val ds = spark.read.parquet(s"$Sf/embeddings.parquet")
        .repartition(13).select(col("label"), col("embedding"))
        .as[VectorCentroidAggregator.VecIn]
      ds.groupByKey(_.label).agg(VectorCentroidAggregator.agg.toColumn.name("c"))
        .select(col("key").as("label"), col("c.centroid").as("centroid"),
          col("c.n").as("n"))
        .select(col("label"), col("n"), posexplode(col("centroid")))
        .select(col("label"), col("pos").cast("int").as("pos"),
          col("col").as("centroid_val"), col("n"))
        .orderBy("label", "pos").collect().toSeq
    }
    assert(base == repart)
  }

  // ---- fuzzy Levenshtein dedup ----

  /** Textbook O(nm) edit distance for the ground truth. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("fuzzyLevPairs equals the brute-force truth on sf0.001") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      d = lev(docs(i)._2, docs(j)._2) if d <= 8
    } yield (docs(i)._1, docs(j)._1, d.toLong)).toSet
    val got = Dedup.fuzzyLevPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the length-bucket dimension is lossless; the affix keys catch every
    // pair whose edits spare one end — which holds for this corpus' near
    // dups, so blocking recall is exactly 1 here
    assert(got == truth, s"got ${got.size} pairs, truth ${truth.size}")
  }

  // ---- curation pipeline ----

  test("curation decisions are internally consistent and cap-bounded") {
    val cap = 3
    val d = Curate.decisions(spark, Sf, minQuality = 0.6, cap = cap)
    val rows = d.collect()
    rows.foreach { r =>
      val (canon, qual, keep) = (r.getInt(5), r.getInt(6), r.getInt(7))
      if (keep == 1) assert(canon == 1 && qual == 1, s"keep implies stages: $r")
    }
    val perSource = rows.groupBy(_.getString(1)).map { case (s, g) =>
      s -> g.count(_.getInt(7) == 1)
    }
    perSource.foreach { case (s, n) => assert(n <= cap, s"source $s over cap: $n") }
    // curated view == keep=1 slice of decisions
    val curated = Curate.curatedCorpus(spark, Sf, minQuality = 0.6, cap = cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated == rows.filter(_.getInt(7) == 1).map(_.getLong(0)).toSet)
    // report funnel sums agree with the decision trail
    val rep = Curate.report(spark, Sf, minQuality = 0.6, cap = cap).collect()
    val bySource = rows.groupBy(_.getString(1))
    rep.foreach { r =>
      val g = bySource(r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.count(_.getInt(5) == 1).toLong)
      assert(r.getLong(3) == g.count(x => x.getInt(5) == 1 && x.getInt(6) == 1).toLong)
      assert(r.getLong(4) == g.count(_.getInt(7) == 1).toLong)
    }
    // the funnel is monotone per source
    rep.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3)
        && r.getLong(3) >= r.getLong(4))
    }
  }
}

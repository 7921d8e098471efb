package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths:
  *   - [[cosineTopK]]: brute-force exact top-k — broadcast the (small) query
  *     set against the full corpus; correct baseline at any scale where the
  *     query set is small, since the corpus never shuffles.
  *   - [[lshCosineTopK]]: random-hyperplane LSH bucketing — the 100 TB path.
  *     Corpus and queries are hashed into `bands` INDEPENDENT sign-pattern
  *     bucket sets (an OR-construction, same shape as
  *     [[Dedup.minHashNearDupPairs]]'s banding): a pair is a candidate if it
  *     collides in ANY band, so recall is 1-(1-p^planes)^bands instead of a
  *     single band's p^planes. The planes-per-band count scales with corpus
  *     size (2^planes ≈ N / targetBucketRows), holding expected bucket
  *     occupancy — and therefore the per-bucket join residue — constant as
  *     the corpus grows: candidate volume is O(N × bands × bucketRows),
  *     linear in N, never the O(N²/2^fixedPlanes) a fixed bucket count
  *     degrades to.
  *
  * All vector math is Catalyst higher-order functions (zip_with/aggregate)
  * over double arrays — codegen-friendly, no UDFs, no driver collect.
  */
object Similarity {

  /** TRAIN-ONCE cache for bounded codebook artifacts (k-means coarse
    * quantizers, PQ sub-codebooks, residual-PQ books), keyed by
    * (table path, every training parameter). A real user trains a
    * codebook once and queries against it many times; before this cache
    * every registered IVF/PQ/SemDedup query re-derived the identical
    * artifact per invocation — 6-8 redundant full-corpus passes per call.
    * Memoizing is sound because training is fully deterministic (fixed
    * init, fixed iteration count, fixed-point integer accumulation — the
    * artifact is bit-identical on every retrain of the same inputs) and
    * the benchmark tables are immutable for the life of the driver; the
    * production contract is the same artifact MATERIALIZED as a parquet
    * codebook table (see SCALING.md "Train-once model artifacts").
    *
    * Same driver-side idiom as IO.rowCountCache. NOT computeIfAbsent:
    * the residual-PQ trainer looks up the coarse codebook on the same
    * map mid-train, and ConcurrentHashMap forbids that reentrancy —
    * get/putIfAbsent instead, where a rare race merely retrains the
    * identical artifact.
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cachedArtifact[T <: AnyRef](key: String)(train: => T): T = {
    val hit = codebookCache.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val trained = train
      codebookCache.putIfAbsent(key, trained)
      trained
    }
  }

  /** Test seam: drop every memoized codebook (spec isolation). */
  private[graft] def clearCodebookCache(): Unit = codebookCache.clear()

  /** Sequential-fold dot product (deterministic double arithmetic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    // widen-if-narrow: the per-pair cosine/dot kernels stream THIS scan
    // (query sides broadcast), and the single-row-group testdata file
    // would run them in ONE task (IO.widened — no-op at production
    // scan widths)
    IO.widened(IO.table(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))

  /** Per-query top-k over a scored candidate frame (qid, vec_id, sim):
    * rank by the FLOAT score — the float rounding absorbs the ≤1-ulp
    * double drift between engines (JVM vs C libm), so the DuckDB
    * list_cosine_similarity / list_inner_product oracles select the same
    * top-k rows and hash identically (same rationale as
    * TextAnalysis.tfIdfTopTerms).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
      .orderBy("qid", "rank")
  }

  /** Shared exhaustive-ANN scaffold: broadcast the (small) query side
    * against `c` (must expose vec_id and v), score every pair with `sim`,
    * keep k per query.
    */
  private def rankTopK(
      c: DataFrame,
      simCol: org.apache.spark.sql.Column,
      numQueries: Int,
      k: Int): DataFrame = {
    val q = c.filter(col("vec_id") < numQueries)
      .select(c.columns.toIndexedSeq.map(n => col(n).as(s"q_$n")): _*)
      .withColumnRenamed("q_vec_id", "qid")
      .withColumnRenamed("q_v", "qv")
    topKPerQuery(
      c.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("sim", simCol.cast("float")),
      k)
  }

  /** Exact brute-force cosine top-k: for each query vector (vec_id <
    * numQueries) the k nearest other vectors. The query side is broadcast;
    * ranking is a per-query row_number window (k rows survive per query
    * partition — no global sort).
    */
  def cosineTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(corpus(spark, sfDir).select("vec_id", "v"),
      cosine(col("qv"), col("v")), numQueries, k)

  /** [[cosineTopK]] with the native codegen'd
    * [[graft.functions.CosineSimilarityExpr]] instead of the HOF
    * composition — one fused loop per pair; bitwise-identical scores
    * (same fold order), registered in GraftSession as SQL `cosine_sim`.
    */
  def cosineTopKNative(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(corpus(spark, sfDir).select("vec_id", "v"),
      expr("cosine_sim(qv, v)"), numQueries, k)

  /** Deterministic pseudo-random hyperplanes (fixed LCG) — no RNG at plan
    * time, so the bucketing is stable across runs/executors; `seed`
    * decorrelates the plane sets of different bands. (private[graft]: the
    * registered-query oracles inline these planes as SQL literals so DuckDB
    * reproduces the exact bucketing.)
    */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    var state = seed * 0x9E3779B97F4A7C15L + 0x5DEECE66DL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-pattern bucket id of vector column `v` under the given planes.
    * Projections go through the native dot_product expression — with
    * bands × planes projections per corpus row this is the bucketing
    * stage's hot loop, and the fused codegen'd loop replaces an
    * interpreted zip_with+aggregate fold per plane.
    */
  private def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit(_)): _*)
      when(call_function("dot_product", v, planeLit) > 0, lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** One PACKED bucket key per band (band << 32 | bucket), each band from an
    * independent hyperplane set. Packing band index and sign-pattern bucket
    * into a single long halves the join-key width crossing the exchange —
    * the banded frame is bands× the corpus row count, so its key width is
    * the candidate join's dominant shuffle cost at 100 TB.
    */
  private def bandedBuckets(v: Column, bands: Int, planesPerBand: Int, dim: Int): Column =
    array((0 until bands).map { b =>
      lit(b.toLong << 32)
        .bitwiseOR(lshBucket(v, hyperplanes(planesPerBand, dim, b + 1L)).cast("long"))
    }: _*)

  /** Planes-per-band scaled to the corpus: 2^planes ≈ rows/targetBucketRows
    * keeps expected bucket occupancy constant as the corpus grows, so the
    * per-bucket self-join residue stays linear in corpus size. The corpus
    * row count is parquet-metadata-cheap (count-pushdown scan).
    */
  private[operators] def adaptivePlanesPerBand(
      corpusRows: Long,
      targetBucketRows: Int = 64): Int = {
    val needed = math.ceil(
      math.log(math.max(corpusRows, 1).toDouble / targetBucketRows)
        / math.log(2.0)).toInt
    math.min(math.max(needed, 4), 24)
  }

  /** Banded (vec_id, bucket_key) frame of the corpus — the LSH analogue of
    * [[Dedup.minHashNearDupPairs]]'s band explode, pre-materialization
    * (test seam — PlanAuditSpec asserts the candidate join's exchange keys
    * on this live lineage).
    */
  private[graft] def bandedEmbeddings(
      spark: SparkSession,
      sfDir: String,
      bands: Int = 4,
      planesPerBand: Int = 8,
      dim: Int = 64): DataFrame =
    corpus(spark, sfDir).select("vec_id", "v")
      .select(col("vec_id"),
        explode(bandedBuckets(col("v"), bands, planesPerBand, dim)).as("bucket_key"))

  /** Size-adaptive materialization (see [[Dedup.materializeIfLarge]]): the
    * banded frame feeds both sides of the candidate join, so at scale it is
    * checkpointed to avoid a second full projection pass; below the
    * threshold the checkpoint's job + block-store round-trip costs more
    * than recomputing the (shuffle-free, codegen'd) bucketing inline.
    */
  private def bandedCorpus(
      c: DataFrame,
      bands: Int,
      planesPerBand: Int,
      dim: Int,
      corpusRows: Long): DataFrame =
    Dedup.materializeIfLarge(
      c.select(col("vec_id"),
        explode(bandedBuckets(col("v"), bands, planesPerBand, dim)).as("bucket_key")),
      corpusRows)

  /** Approximate top-k via multi-band random-hyperplane LSH: a corpus
    * vector is scored for a query iff they share a (band, bucket) key —
    * an equi-join on the banded keys (hash shuffle, never a cross join),
    * candidates deduplicated before scoring so multi-band collisions are
    * scored once.
    */
  def lshCosineTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      bands: Int = 4,
      planesPerBand: Int = -1,
      dim: Int = 64): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    // corpus size from parquet footer metadata (memoized, no Spark job) —
    // a count() here would put a full job inside every query invocation
    val rows = IO.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
    val ppb =
      if (planesPerBand > 0) planesPerBand
      else adaptivePlanesPerBand(rows)
    val banded = bandedCorpus(c, bands, ppb, dim, rows)
    val qBanded = banded.filter(col("vec_id") < numQueries)
      .withColumnRenamed("vec_id", "qid")
    val candIds = banded.join(broadcast(qBanded), Seq("bucket_key"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
      .distinct()
    val qv = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    // native fused-loop scoring on the scale path (bitwise-identical to the
    // HOF form — see StreamingSpec's equality test)
    topKPerQuery(
      candIds.join(c, "vec_id")
        .join(broadcast(qv), "qid")
        .withColumn("sim", expr("cosine_sim(qv, v)").cast("float")),
      k)
  }

  /** Approximate kNN GRAPH: for EVERY corpus vector, its k nearest
    * neighbors among LSH band candidates — the all-pairs analogue of
    * [[lshCosineTopK]] and the input artifact of graph-based dedup
    * sweeps, NN-descent refinement, and cluster-free SemDeDup variants.
    *
    * Scale shape: candidate volume is the banded self-join residue
    * (Σ bucket² per band), held linear in corpus size by
    * [[adaptivePlanesPerBand]]'s constant expected bucket occupancy; the
    * registered row pins planesPerBand so the oracle can inline the
    * hyperplanes. Unlike the query-side top-k there is no broadcast-able
    * side — both vector joins are candidate-keyed hash joins, which is
    * the honest cost of an all-nodes kNN graph at 100 TB (each embedding
    * crosses an exchange once per side). The per-node top-k is the
    * two-phase TopKPerKey rewrite; rank ties break on the FLOAT score
    * then neighbor id (the cross-engine contract of [[topKPerQuery]]).
    */
  def knnGraph(
      spark: SparkSession,
      sfDir: String,
      k: Int = 5,
      bands: Int = 4,
      planesPerBand: Int = 8,
      dim: Int = 64): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val rows = IO.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
    val banded = bandedCorpus(c, bands, planesPerBand, dim, rows)
    val cand = banded
      .join(banded.withColumnRenamed("vec_id", "dst"), Seq("bucket_key"))
      .filter(col("vec_id") =!= col("dst"))
      .select(col("vec_id").as("src"), col("dst"))
      .distinct()
    val scored = cand
      .join(c.select(col("vec_id").as("src"), col("v").as("sv")), "src")
      .join(c.select(col("vec_id").as("dst"), col("v").as("dv")), "dst")
      .withColumn("sim", expr("cosine_sim(sv, dv)").cast("float"))
    val w = Window.partitionBy("src").orderBy(desc("sim"), asc("dst"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src", "rank", "dst", "sim")
      .orderBy("src", "rank")
  }

  /** One NN-DESCENT refinement round over [[knnGraph]] (Dong et al.,
    * "Efficient K-Nearest Neighbor Graph Construction for Generic
    * Similarity Measures", WWW 2011): a node's improved neighbors are
    * found among its neighbors' neighbors. Candidates for each node are
    * its UNDIRECTED current neighborhood (out ∪ in) plus all two-hop
    * nodes through it; re-score, keep the per-node top-k. Because the
    * candidate set is a superset of the node's current list, every rank's
    * similarity is MONOTONICALLY non-decreasing (spec-pinned), and recall
    * against the exact top-k can only improve — the standard cheap fix
    * for LSH's per-band misses without touching the bucket structure.
    *
    * Scale shape: degrees in the undirected graph are ≤ 2k, so the
    * two-hop join emits ≤ 4k² candidates per node — LINEAR in corpus
    * size for constant k, independent of bucket occupancy (the
    * NN-descent core win). The adjacency is (long, long) rows end to
    * end; vectors join in only for the candidate-keyed re-score (each
    * embedding crosses once per side, the knnGraph contract), and the
    * per-node cut is the TopKPerKey rn≤k rewrite. The seed graph is
    * checkpointed once — the two-hop self-join and the union both read
    * the materialized adjacency, not the LSH pipeline twice.
    */
  def knnGraphRefined(
      spark: SparkSession,
      sfDir: String,
      k: Int = 5,
      bands: Int = 4,
      planesPerBand: Int = 8,
      dim: Int = 64): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val g0 = knnGraph(spark, sfDir, k, bands, planesPerBand, dim)
      .select("src", "dst")
    val und = g0
      .union(g0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val twoHop = und.as("a")
      .join(und.select(col("src").as("dst"), col("dst").as("far")).as("b"),
        "dst")
      .where(col("src") =!= col("far"))
      .select(col("src"), col("far").as("dst"))
    val cand = und.union(twoHop).distinct()
    val scored = cand
      .join(c.select(col("vec_id").as("src"), col("v").as("sv")), "src")
      .join(c.select(col("vec_id").as("dst"), col("v").as("dv")), "dst")
      .withColumn("sim", expr("cosine_sim(sv, dv)").cast("float"))
    val w = Window.partitionBy("src").orderBy(desc("sim"), asc("dst"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src", "rank", "dst", "sim")
      .orderBy("src", "rank")
  }

  /** IVF (inverted-file) approximate top-k — the second classic ANN scale
    * path next to [[lshCosineTopK]]: a small coarse-quantizer codebook of
    * `nlist` centroids partitions the corpus by nearest centroid, and each
    * query scans only its `nprobe` nearest cells, so the scored candidate
    * volume is ≈ corpus × nprobe / nlist.
    *
    * The centroids here are a deterministic corpus sample (vec_id < nlist)
    * standing in for an offline-trained k-means codebook — centroid
    * training is a separate offline job at scale; this operator consumes
    * whatever codebook exists. The codebook is collected to the driver
    * ONCE and inlined as literal vectors: it is a bounded model artifact
    * (nlist rows, like the LSH hyperplanes), NOT a data-scale collect —
    * which makes cell assignment a per-row codegen'd argmax over nlist
    * fused dot products: the corpus never shuffles for assignment, and the
    * only exchange in the query is the final per-qid top-k (TopK-rewritten).
    */
  def ivfCosineTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val cent = c.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // bounded codebook: nlist rows -> literal (cid, vector) pairs, sorted
    // by cid (see scaladoc). The REAL cid rides along as a literal lookup
    // array: the argmax yields a position into the codebook, and the
    // position maps back to the centroid's actual id — positional ids
    // would silently diverge from the probe side whenever the id space has
    // gaps (the probe/oracle sides key cells by real vec_id).
    val codebook: Seq[(Long, Array[Double])] = cent.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    ivfTopKWithCodebook(spark, c, codebook, numQueries, k, nprobe)
  }

  /** ANN RECALL REPORT — the evaluation row every approximate index needs
    * before it replaces the exact scan: recall@k of [[ivfCosineTopK]]
    * against the [[cosineTopK]] ground truth, across an nprobe ladder
    * (1, 2, 4). One row per (nprobe, query): exact-integer hit count
    * (|IVF top-k ∩ brute top-k|) and the hits/k recall — so the
    * "raise nprobe until recall clears the bar" decision reads straight
    * off the table.
    *
    * Scale shape: ground truth and each ladder rung are k-bounded
    * per-query lists (numQueries·k rows), so the intersection join and
    * the report aggregation are evaluation-sized, never corpus-sized;
    * the corpus-scale work is the underlying scans, each of which keeps
    * its own operator's plan (brute: one broadcast-query pass; IVF:
    * codegen argmax + probe-bounded rank). At 100 TB the query set is a
    * sampled eval suite and this report is exactly the artifact an
    * offline tuning job publishes.
    *
    * Determinism: both rankings are the registered operators' own
    * (float sims, vec_id tie-break — each independently hash-oracled);
    * hits are exact integers and recall is one exact-operand double
    * divide.
    */
  def annRecallReport(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobeLadder: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    import spark.implicits._
    val brute = cosineTopK(spark, sfDir, numQueries, k)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint() // numQueries*k rows; three consumers below
    // one assignment pass and ONE widest-rung candidate scoring pass
    // serve every ladder rung: each corpus vector lives in exactly one
    // cell, so a scored row tagged with its cell's probe rank `rn`
    // belongs to rung np iff rn <= np — running the full ivfCosineTopK
    // per rung would re-assign and re-scan the corpus once per rung for
    // byte-identical candidate rows (measured ~2.4x this plan's wall)
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val cent0 = c.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val codebook: Seq[(Long, Array[Double])] = cent0.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val assigned = assignToCodebook(c, codebook)
    val cent = codebook.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val q = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val maxNp = nprobeLadder.max
    val wP = Window.partitionBy("qid").orderBy(desc("psim"), asc("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("psim", expr("cosine_sim(qv, cv)").cast("float"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= maxNp)
      .select(col("qid"), col("qv"), col("cid"), col("rn"))
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr("cosine_sim(qv, v)").cast("float"))
      .select("qid", "vec_id", "sim", "rn")
      .localCheckpoint() // probe-bounded candidates, one row per rung use
    val wq = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    val ladder = nprobeLadder.map { np =>
      scored.filter(col("rn") <= np)
        .withColumn("rnk", row_number().over(wq)).filter(col("rnk") <= k)
        .select(lit(np).as("nprobe"), col("qid"), col("vec_id"))
    }.reduce(_ unionByName _)
    val hits = ladder.join(brute, Seq("qid", "vec_id"))
      .groupBy("nprobe", "qid").agg(count(lit(1)).as("hits"))
    // scaffold every (nprobe, qid) cell so a zero-recall rung still rows
    val cells = nprobeLadder
      .map(np => brute.select(col("qid")).distinct()
        .withColumn("nprobe", lit(np)))
      .reduce(_ unionByName _)
    cells.join(hits, Seq("nprobe", "qid"), "left")
      .select(col("nprobe"), col("qid"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double")
          / lit(k.toDouble)).as("recall"))
      .orderBy("nprobe", "qid")
  }

  /** Nearest-centroid cell assignment against a LITERAL codebook: a
    * per-row codegen'd argmax over `codebook.size` fused dot products — no
    * shuffle, no join; first-max position = lowest cid among float ties
    * (the codebook must be cid-sorted; the oracle orders by sim DESC, cid
    * ASC — identical tie-break).
    */
  private def assignToCodebook(
      c: DataFrame,
      codebook: Seq[(Long, Array[Double])]): DataFrame = {
    val cidLookup = array(codebook.map(cb => lit(cb._1)): _*)
    c.withColumn("sims", simsAgainst(col("v"), codebook.map(_._2)))
      .withColumn("cid",
        // coalesce-to-literal NARROWS NULLABILITY, it never fires: sims is
        // non-empty (the codebook is), so first-max position always
        // resolves. Without it `cid` is nullable, every downstream
        // cid-equi join infers an IsNotNull filter, and constraint
        // substitution inlines the WHOLE literal-codebook distance scan
        // into that filter — the assignment ran 2-3× per corpus row
        // across the IVF/semantic families (r19 plan audit: 8 rows
        // carried `isnotnull(element_at(..cosine_sim..))` conditions).
        coalesce(
          element_at(cidLookup,
            array_position(col("sims"), array_max(col("sims"))).cast("int")),
          lit(codebook.head._1)))
      .select("vec_id", "v", "cid")
  }

  /** Float-cast COSINE similarity of `v` against each literal centroid,
    * in codebook order — the argmax input for coarse cell assignment
    * (first-max = lowest position resolves float ties, matching the
    * oracle's `ORDER BY sim DESC, cid` rn=1). The PQ encoder's
    * inner-product analogue is [[pqSims]] (one transform loop, not
    * unrolled calls — see the codegen-size lesson in SCALING.md).
    */
  private def simsAgainst(
      v: Column,
      centroids: Seq[Array[Double]]): Column =
    // one transform LOOP over a typedLit constant, not nlist unrolled
    // calls (the pqSims codegen-size lesson): unrolled literal arrays
    // made codegen compile time grow ~linearly in nlist x dim, which is
    // what capped practical nlist at ~16-32 (round-12 measurement:
    // margin IVF at 20k vectors went 48 s at nlist=128 from codegen
    // alone). The loop form keeps the codebook a constant OBJECT in the
    // generated code, so assignment cost is pure arithmetic at any
    // nlist — the prerequisite for the sqrt(N)-adaptive sizing rule.
    transform(typedLit(centroids.map(_.toSeq)),
      cv => call_function("cosine_sim", v, cv).cast("float"))

  /** IVF search against an explicit codebook (see [[ivfCosineTopK]] for the
    * shape rationale). The codebook is a bounded model artifact (nlist
    * rows) — inlined as literals for assignment, materialized as a
    * broadcast frame for the probe ranking.
    */
  private def ivfTopKWithCodebook(
      spark: SparkSession,
      c: DataFrame,
      codebook: Seq[(Long, Array[Double])],
      numQueries: Int,
      k: Int,
      nprobe: Int): DataFrame = {
    import spark.implicits._
    val assigned = assignToCodebook(c, codebook)
    val cent = codebook.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    // query probes: numQueries x nlist rows — window cost is negligible and
    // the probe list broadcasts
    val q = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wP = Window.partitionBy("qid").orderBy(desc("psim"), asc("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("psim", expr("cosine_sim(qv, cv)").cast("float"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    topKPerQuery(
      assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", expr("cosine_sim(qv, v)").cast("float")),
      k)
  }

  /** Fixed-point scale for k-means centroid accumulation: sums of
    * round(x * 1e6) longs are exact and ORDER-INDEPENDENT, so the trained
    * centroids are identical across partitionings, runs, and engines —
    * a naive double sum would drift with Spark's partition order and
    * could never hash-match a sequential-sum oracle (same technique as
    * the q1 fixed-point aggregation; micro-precision ≈ 1e-6 is far below
    * any clustering-relevant signal).
    */
  private val KmeansFixedScale = 1000000.0

  /** Lloyd's k-means over the embedding corpus — trains the coarse-quantizer
    * codebook the IVF path consumes, as a Spark job (the "offline training"
    * [[ivfCosineTopK]]'s scaladoc defers to).
    *
    * Each iteration is two distributed steps:
    *   1. ASSIGN — per-row codegen'd nearest-centroid argmax against the
    *      current centroids inlined as literals (map-only, no shuffle);
    *   2. UPDATE — per-dimension fixed-point sums via posexplode +
    *      groupBy(cid, pos). The explode multiplies rows by `dim`, but
    *      hash aggregation map-side-combines to ≤ k×dim rows per task, so
    *      the exchange carries k×dim×partitions rows regardless of corpus
    *      size.
    *
    * Only the k×dim centroid table (a bounded model artifact, like the LSH
    * hyperplanes) is ever collected. Similarity is COSINE, matching the
    * IVF probe metric; ties and empty cells resolve deterministically
    * (lowest cid wins; an emptied cell drops out of the codebook — both
    * sides of the oracle lose it identically). Iteration count is fixed
    * (no convergence test): deterministic cost, deterministic result.
    */
  def kmeansCodebook(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2): Seq[(Long, Array[Double])] =
    cachedArtifact(s"kmeans|$sfDir|$k|$iters") {
      trainCodebook(corpus(spark, sfDir).select("vec_id", "v"), k, iters)
    }

  /** [[kmeansCodebook]]'s Lloyd loop over an arbitrary (vec_id, v) frame
    * (cosine assignment; the PQ trainer has its own fused inner-product
    * loop in [[pqCodebooksOn]]).
    */
  private def trainCodebook(
      c: DataFrame,
      k: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    var codebook: Seq[(Long, Array[Double])] = c.filter(col("vec_id") < k)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    for (_ <- 1 to iters) {
      val sums = assignToCodebook(c, codebook)
        .select(col("cid"), posexplode(col("v")))
        .groupBy("cid", "pos")
        .agg(sum(round(col("col") * KmeansFixedScale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      codebook = sums.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          val dim = rows.length
          val arr = new Array[Double](dim)
          rows.foreach { r =>
            // same op order as the SQL oracle: CAST(s AS DOUBLE) / (n * 1e6)
            arr(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3).toDouble * KmeansFixedScale)
          }
          (cid, arr)
      }
    }
    codebook
  }

  /** Final k-means cell assignments (vec_id, cid) after [[kmeansCodebook]]
    * training — the registered, oracle-hashed surface of the trainer (the
    * codebook itself is its by-product).
    */
  def kmeansAssignments(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2): DataFrame =
    assignToCodebook(
      corpus(spark, sfDir).select("vec_id", "v"),
      kmeansCodebook(spark, sfDir, k, iters))
      .select("vec_id", "cid")
      .orderBy("vec_id")

  /** SEMANTIC PRUNE — per-cell prototypicality pruning (the SemDeDup /
    * D4 "Semantic Deduplication and Diversification" decision, Abbas et
    * al. 2023/2024, applied at the cell level): inside each trained
    * k-means cell, rank points by cosine similarity to their own
    * centroid and DROP the most prototypical `dropFrac` of the cell —
    * the near-centroid mass is semantically redundant (many documents
    * saying the template thing), while the tail carries the diversity
    * worth training on. Complements [[semDedupDecisions]]: that drops
    * pairwise near-identical points, this thins whole dense regions.
    *
    * Scale shape: assignment and the own-centroid similarity are the
    * same map-side codegen'd argmax as every IVF row (embeddings never
    * shuffle — pruned to (vec_id, cid, sim) before any exchange), and
    * the per-cell ranking exchanges only those 20-byte triples, hashed
    * on cid across nlist-bounded partitions. The rank is a full per-cell
    * ordering (a quantile DECISION, not a top-k — TopKPerKey does not
    * apply), which is exactly the shape of a one-shot curation pass.
    *
    * `keep` = cell_rank > floor(dropFrac · cell_n): exact-integer floor
    * on both engines, rank ties impossible (row_number with a vec_id
    * tiebreak), so the decision replays bit-for-bit.
    */
  def semanticPruneDecisions(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2,
      dropFrac: Double = 0.25): DataFrame = {
    val codebook = kmeansCodebook(spark, sfDir, k, iters)
    val cidLookup = array(codebook.map(cb => lit(cb._1)): _*)
    val assigned = corpus(spark, sfDir).select("vec_id", "v")
      .withColumn("sims", simsAgainst(col("v"), codebook.map(_._2)))
      .select(col("vec_id"),
        element_at(cidLookup,
          array_position(col("sims"), array_max(col("sims"))).cast("int"))
          .as("cid"),
        array_max(col("sims")).as("sim"))
    val byCell = Window.partitionBy("cid")
    assigned
      .withColumn("cell_rank",
        row_number().over(byCell.orderBy(col("sim").desc, col("vec_id"))))
      .withColumn("cell_n", count(lit(1)).over(byCell))
      .select(col("vec_id"), col("cid"), col("sim"), col("cell_rank"),
        (col("cell_rank") > floor(lit(dropFrac) * col("cell_n")))
          .cast("int").as("keep"))
      .orderBy("vec_id")
  }

  /** CLUSTER TOPIC LABELING — the human-readable face of the k-means
    * partition: per trained cell, the top tf-idf terms of its member
    * DOCUMENTS (embeddings join documents on vec_id = doc_id; the
    * embedded subset is the labeled corpus). Each cluster is scored as
    * one pseudo-document: tf = term share of the cluster's tokens, idf
    * damps terms present in most clusters — the classic topic-label
    * readout over any clustering (here the same Lloyd codebook every
    * IVF/SemDeDup row trains).
    *
    * Determinism: the score is cast to FLOAT before ranking (the tf-idf
    * convention — JVM log vs libm ln differ by 1 ulp on some inputs and
    * the float rounding absorbs it; ranking on the float keeps top-k
    * selection cross-engine stable, with a term tiebreak).
    *
    * Scale shape: ONE co-partitioned id join moves document text next
    * to its assignment (the assignment side is map-side codegen'd
    * argmax — embeddings never shuffle), tokens collapse map-side to
    * (cid, term) counts, and everything after is vocabulary-scale. The
    * rn ≤ topN filter rewrites to the two-phase TopKPerKey operator.
    */
  def clusterTopTerms(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2,
      topN: Int = 5): DataFrame = {
    val assign = assignToCodebook(
      corpus(spark, sfDir).select("vec_id", "v"),
      kmeansCodebook(spark, sfDir, k, iters))
      .select(col("vec_id"), col("cid"))
    val docs = IO.table(spark, sfDir, "documents")
      .select(col("doc_id").as("vec_id"), col("text"))
    val tf = assign.join(docs, "vec_id")
      .select(col("cid"), explode(split(col("text"), " ")).as("term"))
      .groupBy("cid", "term").agg(count(lit(1)).as("tfreq"))
      .localCheckpoint() // three consumers: clen, cdf, the scored frame
    val clen = tf.groupBy("cid").agg(sum("tfreq").as("clen"))
    val cdf = tf.groupBy("term").agg(count(lit(1)).as("cdf"))
    val kTotal = clen.agg(count(lit(1)).as("kn"))
    val w = Window.partitionBy("cid").orderBy(desc("score"), asc("term"))
    tf.join(broadcast(clen), "cid")
      .join(cdf, "term")
      .crossJoin(broadcast(kTotal))
      .withColumn("score",
        ((col("tfreq").cast("double") / col("clen"))
          * log((col("kn") + lit(1.0)) / (col("cdf") + lit(1.0))))
          .cast("float"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select("cid", "term", "tfreq", "score")
      .orderBy("cid", "term")
  }

  /** The trained coarse codebook as a TABLE (cid, pos, centroid_val) —
    * the materialized form of the train-once contract: write this frame
    * as parquet beside the corpus and every later query loads it via
    * [[codebookFromTable]] instead of retraining (SCALING.md "Train-once
    * model artifacts"). Registered and oracle-hashed: the DuckDB side
    * replays the full Lloyd training, so a hash match certifies the
    * trained VALUES, not just the assignments they induce.
    */
  def kmeansCodebookTable(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2): DataFrame = {
    import spark.implicits._
    kmeansCodebook(spark, sfDir, k, iters)
      .map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
      .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "centroid_val")))
      .orderBy("cid", "pos")
  }

  /** Parse a materialized (cid, pos, centroid_val) codebook table back
    * into the bounded driver artifact the search paths consume — the
    * load half of the materialization contract (k×dim rows; the collect
    * is a model artifact, not data).
    */
  def codebookFromTable(table: DataFrame): Seq[(Long, Array[Double])] =
    table.select("cid", "pos", "centroid_val").collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        (cid, arr)
      }

  /** IVF search against a MATERIALIZED codebook table — what a
    * production query runs: no training, the codebook arrives as data.
    */
  def ivfCosineTopKFromTable(
      spark: SparkSession,
      sfDir: String,
      codebookTable: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      nprobe: Int = 4): DataFrame =
    ivfTopKWithCodebook(spark,
      corpus(spark, sfDir).select("vec_id", "v"),
      codebookFromTable(codebookTable),
      numQueries, k, nprobe)

  /** [[ivfCosineTopK]] with a TRAINED codebook: the k-means centroids
    * replace the deterministic corpus sample, tightening cells and with
    * them the recall/candidate-volume trade-off.
    */
  def ivfCosineTopKTrained(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame =
    ivfTopKWithCodebook(
      spark,
      corpus(spark, sfDir).select("vec_id", "v"),
      kmeansCodebook(spark, sfDir, nlist, iters),
      numQueries, k, nprobe)

  /** Maximum-inner-product top-k (un-normalized dot score) — the ranking
    * used when embedding magnitude carries signal (e.g. popularity-scaled
    * retrieval vectors). Same broadcast/no-corpus-shuffle shape as
    * [[cosineTopK]], scored by the native dot_product expression.
    */
  def dotTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(corpus(spark, sfDir).select("vec_id", "v"),
      expr("dot_product(qv, v)"), numQueries, k)

  /** Int8 vector quantization: per-vector symmetric scale (127 / max|x|),
    * stored as array<tinyint> + one float scale — 4x smaller than float32,
    * 8x smaller than the double pipeline. At 100 TB of embeddings the
    * quantized corpus is what fits in cluster memory for ANN; the spec
    * checks recall@k against the full-precision ranking.
    */
  def quantize(spark: SparkSession, sfDir: String): DataFrame =
    corpus(spark, sfDir)
      .withColumn("max_abs",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("scale",
        when(col("max_abs") > 0, col("max_abs") / 127.0).otherwise(lit(1.0)))
      .select(col("vec_id"), col("label"), col("scale"),
        transform(col("v"), x => round(x / col("scale"), 0).cast("byte")).as("q"))

  /** Brute-force top-k over the QUANTIZED vectors (dequantize on the fly:
    * cosine is scale-invariant per vector, so the int8 arrays compare
    * directly).
    */
  def quantizedTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5): DataFrame =
    rankTopK(
      quantize(spark, sfDir)
        .select(col("vec_id"), transform(col("q"), _.cast("double")).as("v")),
      expr("cosine_sim(qv, v)"), numQueries, k)

  /** Product-quantization codebooks: the vector space is split into
    * `numSub` contiguous subvector slices and an independent codebook of
    * `codesPerSub` centroids is trained per slice with the same
    * fixed-point Lloyd loop as [[kmeansCodebook]], under the
    * INNER-PRODUCT assignment metric (the PQ scorer approximates
    * dot(q, x) by Σ_s dot(q_s, centroid(code_s)), so encoding maximizes
    * the quantity the scorer reads back). Returns per-sub centroids in
    * cid-sorted order — the code of a vector is its centroid's POSITION
    * in that order, making codes dense 0..k-1 even when Lloyd empties a
    * cell.
    *
    * The whole artifact is numSub × codesPerSub × (dim/numSub) doubles =
    * dim × codesPerSub — same size as one coarse codebook, bounded, and
    * driver-held like the LSH planes.
    */
  def pqCodebooks(
      spark: SparkSession,
      sfDir: String,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      iters: Int = 1,
      dim: Int = 64): Seq[IndexedSeq[Array[Double]]] =
    cachedArtifact(s"pq|$sfDir|$numSub|$codesPerSub|$iters|$dim") {
      pqCodebooksOn(corpus(spark, sfDir).select("vec_id", "v"),
        numSub, codesPerSub, iters, dim)
    }

  /** PQ sub-codebooks trained on COARSE-CELL RESIDUALS (the residual
    * IVF-PQ training input), train-once cached like the raw flavor —
    * the coarse codebook it depends on resolves through its own cache
    * entry, so a cold driver trains coarse + residual books exactly once
    * each no matter how many queries consume them.
    */
  def residualPqCodebooks(
      spark: SparkSession,
      sfDir: String,
      nlist: Int = 16,
      coarseIters: Int = 2,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      pqIters: Int = 1,
      dim: Int = 64): Seq[IndexedSeq[Array[Double]]] =
    cachedArtifact(
      s"pqres|$sfDir|$nlist|$coarseIters|$numSub|$codesPerSub|$pqIters|$dim") {
      val c = corpus(spark, sfDir).select("vec_id", "v")
      val coarse = kmeansCodebook(spark, sfDir, nlist, coarseIters)
      pqCodebooksOn(residualFrame(c, coarse), numSub, codesPerSub, pqIters, dim)
    }

  /** [[pqCodebooks]] over an arbitrary (vec_id, v) frame — the residual
    * IVF-PQ path trains on coarse-cell residuals instead of raw vectors.
    */
  private[graft] def pqCodebooksOn(
      c: DataFrame,
      numSub: Int,
      codesPerSub: Int,
      iters: Int,
      dim: Int): Seq[IndexedSeq[Array[Double]]] = {
    val subDim = dim / numSub
    // All numSub trainings share their jobs: ONE init collect (the first
    // codesPerSub full vectors, sliced driver-side) and ONE
    // assign+aggregate job per Lloyd iteration covering every subvector —
    // not numSub independent trainer loops (8× the scheduling for
    // identical numbers; the per-sub math below is expression-for-
    // expression the [[trainCodebook]] iteration, so the oracle replay is
    // unchanged).
    val init: Seq[(Long, Array[Double])] = c.filter(col("vec_id") < codesPerSub)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    var books: IndexedSeq[Seq[(Long, Array[Double])]] =
      (0 until numSub).map(s =>
        init.map { case (cid, v) => (cid, v.slice(s * subDim, (s + 1) * subDim)) })
    for (_ <- 1 to iters) {
      val perSub = array((0 until numSub).map { s =>
        val sv = slice(col("v"), s * subDim + 1, subDim)
        val sims = pqSims(sv, books(s).map(_._2))
        val cidLookup = array(books(s).map(b => lit(b._1)): _*)
        struct(lit(s).as("sub"),
          element_at(cidLookup,
            array_position(sims, array_max(sims)).cast("int")).as("cid"),
          sv.as("sv"))
      }: _*)
      val sums = c.select(explode(perSub).as("e"))
        .select(col("e.sub").as("sub"), col("e.cid").as("cid"),
          posexplode(col("e.sv")))
        .groupBy("sub", "cid", "pos")
        .agg(sum(round(col("col") * KmeansFixedScale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      books = (0 until numSub).map { s =>
        sums.filter(_.getInt(0) == s).groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (cid, rows) =>
            val arr = new Array[Double](subDim)
            rows.foreach { r =>
              // same op order as the SQL oracle: CAST(s AS DOUBLE) / (n * 1e6)
              arr(r.getInt(2)) =
                r.getLong(3).toDouble / (r.getLong(4).toDouble * KmeansFixedScale)
            }
            (cid, arr)
          }
      }
    }
    books.map(_.sortBy(_._1).map(_._2).toIndexedSeq)
  }

  /** Float-cast inner products of one subvector slice against the whole
    * sub-codebook as ONE generated loop: `transform` over the nested
    * codebook literal, not codesPerSub unrolled dot calls — the unrolled
    * form multiplies generated-code size by codes×subDim and its janino
    * compile time dwarfs the actual math at query-submission time. Scores,
    * fold order, and first-max ties are expression-identical either way,
    * so the oracle replay is unaffected.
    */
  private def pqSims(sv: Column, book: Seq[Array[Double]]): Column =
    transform(typedLit(book.map(_.toSeq)),
      cv => call_function("dot_product", sv, cv).cast("float"))

  /** 0-based PQ code of one subvector slice: first-max position in the
    * float-cast inner products against the sub-codebook.
    */
  private def pqCode(vSub: Column, book: Seq[Array[Double]]): Column = {
    val sims = pqSims(vSub, book)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** PQ-encode the corpus: one INT code per subvector — the stored ANN
    * artifact. At 100 TB this is THE memory path: numSub bytes-ish per
    * vector versus dim×4 for float32 (64× smaller at the 4×16 default),
    * which is what lets a billion-vector index live in cluster RAM.
    * Encoding is map-side only (codegen'd argmax per slice, no shuffle —
    * same posture as the IVF cell assignment).
    */
  def pqEncode(
      spark: SparkSession,
      sfDir: String,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      iters: Int = 1,
      dim: Int = 64): DataFrame = {
    val books = pqCodebooks(spark, sfDir, numSub, codesPerSub, iters, dim)
    val subDim = dim / numSub
    corpus(spark, sfDir).select(
      Seq(col("vec_id")) ++ (0 until numSub).map { s =>
        pqCode(slice(col("v"), s * subDim + 1, subDim), books(s))
          .as(s"code_$s")
      }: _*)
      .orderBy("vec_id")
  }

  /** Concatenated sub-centroid reconstruction of `vCol` under `books`
    * (shared by the PQ scorers and the reconstruction-error test seam).
    */
  private def pqReconExpr(
      books: Seq[IndexedSeq[Array[Double]]],
      vCol: Column,
      numSub: Int,
      subDim: Int): Column =
    concat((0 until numSub).map { s =>
      element_at(typedLit(books(s).map(_.toSeq)),
        pqCode(slice(vCol, s * subDim + 1, subDim), books(s)) + 1)
    }: _*)

  /** Mean squared reconstruction error of the PQ codebooks over the
    * corpus — raw or residual flavor (test seam for the residual-beats-raw
    * claim).
    */
  private[graft] def pqReconstructionMse(
      spark: SparkSession,
      sfDir: String,
      residual: Boolean,
      nlist: Int = 16,
      coarseIters: Int = 2,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      pqIters: Int = 1,
      dim: Int = 64): Double = {
    val subDim = dim / numSub
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val withRecon =
      if (!residual) {
        val books = pqCodebooksOn(c, numSub, codesPerSub, pqIters, dim)
        c.withColumn("recon", pqReconExpr(books, col("v"), numSub, subDim))
      } else {
        val coarse = kmeansCodebook(spark, sfDir, nlist, coarseIters)
        val books = residualPqCodebooks(spark, sfDir, nlist, coarseIters,
          numSub, codesPerSub, pqIters, dim)
        assignToCodebook(c, coarse)
          .withColumn("res", residualCol(coarse))
          .withColumn("recon",
            zip_with(centroidCol(coarse),
              pqReconExpr(books, col("res"), numSub, subDim), (a, b) => a + b))
      }
    withRecon
      .select(aggregate(zip_with(col("v"), col("recon"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x).as("se"))
      .agg(avg("se")).head().getDouble(0)
  }

  /** Asymmetric-distance PQ top-k (the IVF-PQ scoring half): EXACT query
    * vectors against the RECONSTRUCTED corpus — each corpus vector is
    * replaced by the concatenation of its coded sub-centroids, so the
    * score is Σ_s dot(q_s, centroid(code_s)), computed here as one fused
    * dot over the concatenated reconstruction. Approximation error comes
    * only from the codebook, never the query (the "A" in ADC). The
    * reconstruction is a per-row literal lookup — the corpus reads as
    * codes, the books ride along as literals, nothing shuffles but the
    * final top-k window.
    */
  def pqTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      iters: Int = 1,
      dim: Int = 64): DataFrame = {
    val books = pqCodebooks(spark, sfDir, numSub, codesPerSub, iters, dim)
    val subDim = dim / numSub
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val encoded = c.withColumn("recon",
      pqReconExpr(books, col("v"), numSub, subDim))
    val q = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    topKPerQuery(
      encoded.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("sim",
          call_function("dot_product", col("qv"), col("recon")).cast("float")),
      k)
  }

  /** The full IVF-PQ index: coarse k-means cells bound the scan (only
    * `nprobe`/`nlist` of the corpus is scored per query — the IVF half)
    * and PQ codes bound the memory (the scored candidates read as
    * reconstructed byte codes, never raw vectors — the PQ half). This is
    * the composition every public billion-vector ANN system ships; both
    * codebooks are the bounded driver artifacts trained above.
    */
  def ivfPqTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      coarseIters: Int = 2,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      pqIters: Int = 1,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val coarse = kmeansCodebook(spark, sfDir, nlist, coarseIters)
    val books = pqCodebooks(spark, sfDir, numSub, codesPerSub, pqIters, dim)
    val subDim = dim / numSub
    val recon = concat((0 until numSub).map { s =>
      element_at(typedLit(books(s).map(_.toSeq)),
        pqCode(slice(col("v"), s * subDim + 1, subDim), books(s)) + 1)
    }: _*)
    // cell id and reconstruction are BOTH map-side columns of one pass
    val assigned = assignToCodebook(c, coarse).withColumn("recon", recon)
    val cent = coarse.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val q = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wP = Window.partitionBy("qid").orderBy(desc("psim"), asc("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("psim", expr("cosine_sim(qv, cv)").cast("float"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    topKPerQuery(
      assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim",
          call_function("dot_product", col("qv"), col("recon")).cast("float")),
      k)
  }

  /** RESIDUAL IVF-PQ — the canonical composition (what the public
    * billion-vector libraries actually ship): PQ codebooks are trained on
    * the RESIDUALS x − centroid(cell) rather than raw vectors. Residuals
    * concentrate near the origin with much smaller spread than the raw
    * space, so the same code budget quantizes them with lower
    * reconstruction error; scoring adds the cell centroid back
    * (x̂ = centroid + residual-recon) before the dot product. The spec
    * pins the error claim: residual reconstruction MSE must beat raw-PQ
    * MSE on the corpus.
    */
  def ivfPqResidualTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      coarseIters: Int = 2,
      numSub: Int = 8,
      codesPerSub: Int = 16,
      pqIters: Int = 1,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val coarse = kmeansCodebook(spark, sfDir, nlist, coarseIters)
    val books = residualPqCodebooks(spark, sfDir, nlist, coarseIters,
      numSub, codesPerSub, pqIters, dim)
    val subDim = dim / numSub
    val assigned = assignToCodebook(c, coarse)
      .withColumn("res", residualCol(coarse))
    // x̂ = cell centroid + residual reconstruction (element-wise)
    val fullRecon = zip_with(centroidCol(coarse),
      pqReconExpr(books, col("res"), numSub, subDim), (a, b) => a + b)
    val encoded = assigned.withColumn("recon", fullRecon)
    val cent = coarse.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val wP = Window.partitionBy("qid").orderBy(desc("psim"), asc("cid"))
    val probes = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("psim", expr("cosine_sim(qv, cv)").cast("float"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    topKPerQuery(
      encoded.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim",
          call_function("dot_product", col("qv"), col("recon")).cast("float")),
      k)
  }

  /** The coarse centroid of each row's assigned cell, as a literal lookup
    * on the `cid` column (cid-sorted nested literal + position lookup —
    * cids stay stable even when Lloyd empties a cell).
    */
  private def centroidCol(coarse: Seq[(Long, Array[Double])]): Column = {
    val sorted = coarse.sortBy(_._1)
    element_at(typedLit(sorted.map(_._2.toSeq)),
      array_position(typedLit(sorted.map(_._1)), col("cid")).cast("int"))
  }

  /** v − centroid(cid), element-wise (requires `v` and `cid` columns). */
  private def residualCol(coarse: Seq[(Long, Array[Double])]): Column =
    zip_with(col("v"), centroidCol(coarse), (x, cc) => x - cc)

  /** (vec_id, v) frame of coarse-cell residuals — the residual-PQ
    * training input.
    */
  private def residualFrame(
      c: DataFrame,
      coarse: Seq[(Long, Array[Double])]): DataFrame =
    assignToCodebook(c, coarse)
      .select(col("vec_id"), residualCol(coarse).as("v"))

  /** Distinct LSH candidate pairs of the corpus under the multi-band
    * OR-construction — exposed so the scale spec can assert candidate
    * volume grows ~linearly (not quadratically) with corpus size.
    */
  def embeddingCandidatePairs(
      spark: SparkSession,
      sfDir: String,
      bands: Int = 4,
      planesPerBand: Int = -1,
      dim: Int = 64,
      targetBucketRows: Int = 64): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    // footer-metadata row count, not a count() job — see lshCosineTopK
    val rows = IO.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
    val ppb =
      if (planesPerBand > 0) planesPerBand
      else adaptivePlanesPerBand(rows, targetBucketRows)
    val banded = bandedCorpus(c, bands, ppb, dim, rows)
    banded.as("a")
      .join(banded.as("b"),
        col("a.bucket_key") === col("b.bucket_key")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** SemDeDup-style SEMANTIC deduplication (the published web-corpus
    * pipeline shape — cluster the embedding space, then dedup only WITHIN
    * a cluster; Abbas et al. 2023, arXiv:2303.09540): a vector is dropped
    * when its k-means cell contains a ≥ `tau`-cosine neighbor with a
    * smaller vec_id — the greedy keep-one-per-duplicate-group policy, made
    * run-to-run deterministic by the id order. One decision row per vector:
    * (vec_id, cid, keep); `filter(keep)` is the semantically deduplicated
    * corpus.
    *
    * The 100 TB shape: candidate volume is Σ cell² — never corpus² — and
    * the cell population stays bounded by scaling `k` with the corpus
    * (exactly the IVF argument in [[ivfCosineTopK]]); cell assignment is a
    * map-side codegen'd argmax (no shuffle), so the only data motion is
    * the cid-keyed pair join plus the drop-list backjoin, both on
    * (id, cid, vector) rows with text/payload never involved.
    */
  def semDedupDecisions(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    // materialize the assignment when large: three consumers below, and
    // above the threshold re-running the argmax scan costs more than the
    // checkpoint (same policy as the banded dedup paths)
    val assigned = Dedup.materializeIfLarge(
      assignToCodebook(c, kmeansCodebook(spark, sfDir, k, iters)),
      IO.parquetRowCount(spark, s"$sfDir/embeddings.parquet"))
    // threshold on the DOUBLE cosine in both engines (the emb_near_dup
    // convention); the semi-join keeps only a's columns
    val dropIds = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("b.vec_id") < col("a.vec_id")
          && expr("cosine_sim(a.v, b.v)") >= tau,
        "left_semi")
      .select(col("vec_id"), lit(true).as("dup"))
    assigned.select("vec_id", "cid")
      .join(dropIds, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("dup").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** INCREMENTAL semantic near-dup verdicts — the embedding member of the
    * incremental family beside [[graft.operators.Dedup.incrementalExact]]
    * / `incrementalMinHashMd5Stored` / `incrementalNearDupMd5`, and the
    * serve path of [[semDedupDecisions]]: every batch vector (vec_id %
    * 10 == 0 — the same synthetic carve as the other incremental rows)
    * is cell-assigned against the trained codebook and compared ONLY to
    * same-cell corpus vectors; the verdict row carries the best corpus
    * match (cosine desc, corpus id asc — deterministic) or a null-padded
    * admit.
    *
    * Scale shape: assignment is the map-side literal-codebook argmax on
    * BOTH sides (the corpus never shuffles for it — in production the
    * corpus side IS the stored assignment, here recomputed at scan
    * speed); the batch broadcasts, so candidate generation is a
    * broadcast hash join on cid with volume Σ(batch_cell × corpus_cell)
    * — the SemDeDup cell bound, never batch × corpus. Only the
    * (batch_id, corpus_id, cos) triples of above-threshold hits reach
    * the per-batch-vector argmax, which map-combines via max(struct).
    * Cosine doubles are pure IEEE mul/add/sqrt — bit-identical across
    * engines, so the oracle replays the pick exactly.
    */
  /** Declared schemas of the persisted ANN artifacts — vectors are dense
    * (a null element is corruption, caught loudly by the stamp), the
    * codebook rows exact by construction; served through
    * [[IO.readStamped]] so the cosine/assign expressions stay
    * branch-free off a serve.
    */
  private[graft] val CellIndexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("cid", LongType, nullable = false)))
  }

  private[graft] val IvfCodebookSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("centroid_val", DoubleType, nullable = false)))
  }

  /** Stable artifact path for the persisted CELL INDEX — the corpus as a
    * (vec_id, v, cid) table under the trained codebook (the IVF index in
    * table form; mhidx conventions).
    */
  private[graft] def cellIndexArtifactPath(
      spark: SparkSession,
      sfDir: String,
      k: Int,
      iters: Int): String =
    IO.contentKeyedArtifactPath(spark, s"$sfDir/embeddings.parquet",
      "embedding", "cellidx", s"cellidx_v1|$sfDir|$k|$iters") + ".parquet"

  /** Build the corpus-side cell index ONCE and persist it — the artifact
    * [[incrementalSemanticNearDup]] and [[embIngestStream]] consume. In
    * production this is the maintained semantic index (appended per
    * admitted batch); the corpus-wide assignment pass runs only here.
    */
  def persistCellIndex(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2): String = {
    val path = cellIndexArtifactPath(spark, sfDir, k, iters)
    assignToCodebook(
      corpus(spark, sfDir).select("vec_id", "v")
        .filter(col("vec_id") % 10 =!= 0),
      kmeansCodebook(spark, sfDir, k, iters))
      .write.mode("overwrite").parquet(path)
    path
  }

  def incrementalSemanticNearDup(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val batch = corpus(spark, sfDir).select("vec_id", "v")
      .filter(col("vec_id") % 10 === 0)
    incrementalSemanticNearDupFrames(spark, sfDir, batch, k, iters, tau)
  }

  /** Verdict core over an explicit batch (vec_id, v) frame — the
    * production/streaming entry; consumes the PERSISTED cell index
    * (self-priming on first use, the stored-artifact convention), so a
    * repeat batch pays one index scan plus the cell-bounded verify.
    */
  private[graft] def incrementalSemanticNearDupFrames(
      spark: SparkSession,
      sfDir: String,
      batch: DataFrame,
      k: Int = 16,
      iters: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val corpusA = IO.servedArtifact(spark,
      cellIndexArtifactPath(spark, sfDir, k, iters), CellIndexSchema) {
      persistCellIndex(spark, sfDir, k, iters); ()
    }
    val batchA = assignToCodebook(batch, kmeansCodebook(spark, sfDir, k, iters))
    val best = corpusA
      .join(broadcast(batchA.select(col("vec_id").as("batch_id"),
        col("v").as("bv"), col("cid"))), "cid")
      .withColumn("cos", expr("cosine_sim(v, bv)"))
      // threshold on the DOUBLE (bit-identical IEEE arithmetic — the
      // emb_near_dup convention); rank and report the FLOAT cast (the
      // topKPerQuery convention, absorbing any ulp of engine drift in
      // the pick)
      .filter(col("cos") >= tau)
      // max(struct) argmax: map-side combine beats a window sort over the
      // hit volume (the decontam worst-offender pattern)
      .groupBy("batch_id")
      .agg(max(struct(col("cos").cast("float").as("cos_f"),
        (-col("vec_id")).as("neg_id"))).as("b"))
      .select(col("batch_id").as("vec_id"), (-col("b.neg_id")).as("dup_of"),
        col("b.cos_f").as("cos"))
    batch.select("vec_id")
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of").isNull.as("is_new"),
        col("dup_of"), col("cos"))
      .orderBy("vec_id")
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * [[Decontaminate]] family (exact-gram, bloom, containment, and
    * lexical-minhash all miss a paraphrased eval item; embedding cosine
    * is the tier that catches it, the published recipe for rewrite-
    * resistant benchmark decontamination). For every TRAIN vector (the
    * persisted cell index's carve), report whether ANY eval vector
    * (the held-out vec_id % 10 = 0 slice) sits at cosine ≥ tau, with
    * the worst offender and its similarity — the contaminated rows
    * only, the [[graft.operators.Decontaminate]] report shape.
    *
    * Scale shape: the TRAIN side is the persisted (vec_id, v, cid)
    * cell index — one artifact scan, the corpus never re-assigns; the
    * eval suite assigns map-side against the literal codebook and
    * BROADCASTS (eval suites are bounded — the decontam family's
    * standing asymmetry), so candidates are cell-bounded
    * (Σ train_cell × eval_cell, the SemDeDup bound) and the only
    * exchange is the per-train-vector argmax, map-combined via
    * max(struct). Same-cell candidacy is the deliberate SemDeDup
    * recall trade (shared with dedup_semantic), replayed exactly by
    * the oracle — cross-engine parity, not approximation drift.
    */
  def semanticContaminationReport(
      spark: SparkSession,
      sfDir: String,
      k: Int = 16,
      iters: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val trainA = IO.servedArtifact(spark,
      cellIndexArtifactPath(spark, sfDir, k, iters), CellIndexSchema) {
      persistCellIndex(spark, sfDir, k, iters); ()
    }
    val evalA = assignToCodebook(
      corpus(spark, sfDir).select("vec_id", "v")
        .filter(col("vec_id") % 10 === 0),
      kmeansCodebook(spark, sfDir, k, iters))
    trainA
      .join(broadcast(evalA.select(col("vec_id").as("eval_id"),
        col("v").as("ev"), col("cid"))), "cid")
      .withColumn("cos", expr("cosine_sim(v, ev)"))
      // threshold on the DOUBLE, rank/report the FLOAT cast — the
      // incrementalSemanticNearDup convention
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos").cast("float").as("cos_f"),
        (-col("eval_id")).as("neg_id"))).as("b"))
      .select(col("vec_id"), (-col("b.neg_id")).as("worst_eval"),
        col("b.cos_f").as("cos"))
      .orderBy("vec_id")
  }

  /** Streaming twin of [[incrementalSemanticNearDup]] — the vector-ingest
    * analogue of `Curate.ingestGateStream`: arriving (vec_id, embedding)
    * micro-batches get verdict rows against the SAME persisted cell
    * index, written idempotently per batch id (re-running a micro-batch
    * overwrites its own directory, never duplicates). Artifacts prime
    * EAGERLY before `.start()` so micro-batch 0 never pays a
    * corpus-scale training/assignment job (the ingest-gate lesson).
    */
  def embIngestStream(
      spark: SparkSession,
      sfDir: String,
      arrivals: DataFrame,
      outDir: String,
      k: Int = 16,
      iters: Int = 2,
      tau: Double = 0.35): org.apache.spark.sql.streaming.StreamingQuery = {
    val path = cellIndexArtifactPath(spark, sfDir, k, iters)
    if (!IO.artifactExists(spark, path))
      persistCellIndex(spark, sfDir, k, iters)
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalSemanticNearDupFrames(spark, sfDir,
          batch.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v")),
          k, iters, tau)
          .write.mode("overwrite")
          .parquet(s"$outDir/verdicts/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions with
    * a PINNED ±1 sign matrix (Achlioptas 2003's database-friendly
    * projections: E[⟨Px,Py⟩] ∝ ⟨x,y⟩ with the same concentration bounds as
    * Gaussian matrices, but the matmul is adds/subtracts). The matrix is
    * derived from a bit-mixed hash of (i, j) — deterministic, no stored
    * model artifact, identical on every executor by construction, and the
    * oracle regenerates it from the same function.
    *
    * Map-side only: `outDims` fused dot products per row, no shuffle, no
    * UDF — at 100 TB this runs at scan speed and cuts every downstream
    * ANN/LSH/clustering pass by dim/outDims. Elements are float-cast: the
    * projection feeds similarity ops that tolerate quantization by design,
    * and the cast absorbs the ≤1-ulp double-fold drift between engines.
    */
  def randomProjection(
      spark: SparkSession,
      sfDir: String,
      outDims: Int = 16,
      dim: Int = 64): DataFrame = {
    val m = projectionMatrix(outDims, dim)
    corpus(spark, sfDir)
      .select(col("vec_id"),
        array(m.map { row =>
          call_function("dot_product", col("v"),
            array(row.map(lit(_)): _*)).cast("float")
        }: _*).as("proj"))
      .orderBy("vec_id")
  }

  /** The pinned projection rows (outDims × dim, entries ±1/√outDims).
    * Shared with the oracle SQL generator so both engines multiply by the
    * same matrix. The sign comes from the HIGH bits of a 64-bit
    * multiply-xor mix — low-bit formulas like (i+j)&1 degenerate into a
    * checkerboard whose rows are linearly dependent.
    */
  private[graft] def projectionMatrix(outDims: Int, dim: Int): Seq[IndexedSeq[Double]] = {
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    def sign(i: Int, j: Int): Double = {
      val h0 = i.toLong * 0x9E3779B97F4A7C15L + (j + 1).toLong * 0xC2B2AE3D27D4EB4FL
      val h = (h0 ^ (h0 >>> 33)) * 0xFF51AFD7ED558CCDL
      if (((h >>> 37) & 1L) == 0L) scale else -scale
    }
    (0 until outDims).map(j => (0 until dim).map(i => sign(i, j)))
  }

  /** Embedding-cosine near-duplicate pairs: LSH candidates (any-band
    * collision) verified with exact cosine. The near-dup analogue of
    * [[Dedup.minHashNearDupPairs]] for dense vectors.
    */
  def embeddingNearDupPairs(
      spark: SparkSession,
      sfDir: String,
      minCosine: Double = 0.35,
      bands: Int = 4,
      planesPerBand: Int = -1,
      dim: Int = 64): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    // native fused-loop expression: one pass per pair vs three
    // interpreted HOF folds
    embeddingCandidatePairs(spark, sfDir, bands, planesPerBand, dim)
      .join(c.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(c.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cos_sim", expr("cosine_sim(va, vb)"))
      .filter(col("cos_sim") >= minCosine)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy("vec_a", "vec_b")
  }

  /** Matryoshka-style two-stage retrieval (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): shortlist with the PREFIX of each embedding
    * (MRL-trained models pack the coarse signal into the leading
    * dimensions), then rerank only the shortlist with the full vector.
    * The published retrieve-then-rerank contract: stage 1 touches every
    * corpus row but reads `prefixDims`/`dim` of each vector's floats;
    * stage 2 reads full vectors for `shortlist` rows per query only.
    *
    * Scale shape: stage 1 is the brute-force scaffold (query side
    * broadcast, corpus never shuffles, TopK window bounded per query) over
    * sliced vectors — at 100 TB the prefix slice is the point: ~4× less
    * arithmetic and, with a column layout that stores the prefix
    * separately, ~4× less I/O. Stage 2 re-scans the corpus and joins the
    * tiny (qid, vec_id) shortlist BROADCAST — the corpus side never
    * shuffles in either stage. Cosine over a prefix normalizes by the
    * prefix norm (cosine() computes both norms on the sliced arrays), so
    * no stored-norm bookkeeping is needed.
    */
  def mrlTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      prefixDims: Int = 32,
      shortlist: Int = 50): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val cPrefix = c.select(col("vec_id"), slice(col("v"), 1, prefixDims).as("v"))
    // stage 1: prefix-cosine shortlist (float-ranked, deterministic ties)
    val short = rankTopK(cPrefix, expr("cosine_sim(qv, v)"), numQueries, shortlist)
      .select("qid", "vec_id")
    // stage 2: full-dim rerank of shortlist rows only; both join sides
    // against the corpus are broadcast (shortlist = numQueries×shortlist
    // rows, queries = numQueries rows)
    topKPerQuery(
      c.join(broadcast(short), "vec_id")
        .join(broadcast(c.filter(col("vec_id") < numQueries)
          .select(col("vec_id").as("qid"), col("v").as("qv"))), "qid")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", expr("cosine_sim(qv, v)").cast("float")),
      k)
  }

  /** Embedding-quality gate: flag vectors whose PEAK coordinate
    * (L∞ norm, "spikiness") is a z-score outlier of the corpus
    * distribution. On the unit-normalized embeddings every real encoder
    * emits, the L2 norm is constant by construction and carries zero
    * signal — what varies is how concentrated the mass is: a
    * near-one-hot spike means a collapsed/saturated encoding and an
    * abnormally flat vector means a washed-out one, and both poison
    * cosine-based dedup/ANN silently (a spiked pair matches on one
    * coordinate). Production pipelines gate on exactly this kind of
    * distributional statistic before any similarity pass. Output: the
    * flagged (vec_id, max_abs, z) rows at |z| ≥ `zCut`.
    *
    * Scale shape: one map-side pass computes each vector's fixed-point
    * peak; the mean/variance reduce to ONE 3-long partial-sum row per
    * partition (map-side combined — the distilled-classifier shape); the
    * flag pass is a map-side filter against broadcast scalars.
    *
    * Determinism: max-of-abs is exact (no accumulation), and the
    * float-wash + round(·×10⁶) BIGINT makes both moments exact integer
    * sums — partition-order independent, cross-engine exact. Σ nf²
    * stays ~10¹² per million rows at unit scale, so the BIGINT sum
    * holds to ~10⁶ corpus rows; past that the same query runs the
    * moments in DECIMAL(38,0) unchanged.
    */
  def embSpikeOutliers(
      spark: SparkSession,
      sfDir: String,
      zCut: Double = 2.0): DataFrame = {
    val normed = corpus(spark, sfDir)
      .select(col("vec_id"),
        round(array_max(transform(col("v"), x => abs(x))).cast("float")
          * lit(1000000.0), 0)
          .cast("long").as("nf"))
    val moments = normed.agg(
      count(lit(1)).as("n"),
      sum("nf").as("s1"),
      sum(col("nf") * col("nf")).as("s2"))
    normed
      .crossJoin(broadcast(moments))
      .withColumn("mean", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("std", sqrt(
        (col("s2").cast("double") / col("n").cast("double"))
          - (col("mean") * col("mean"))))
      .withColumn("z", (col("nf").cast("double") - col("mean")) / col("std"))
      .filter(abs(col("z")) >= lit(zCut))
      .select(col("vec_id"),
        (col("nf").cast("double") / lit(1000000.0)).as("max_abs"), col("z"))
      .orderBy("vec_id")
  }

  // --------------------------------------------------------------------
  // Persisted IVF index (the train-once contract, materialized)
  // --------------------------------------------------------------------

  /** Stable artifact path for a persisted IVF coarse codebook, keyed by
    * the training parameters PLUS a footer-derived content fingerprint
    * of the corpus (row count + embedding byte volume — no Spark job):
    * the artifact outlives the JVM, and a regenerated corpus at the same
    * path must miss the stale index. Same idiom as
    * [[graft.operators.Decontaminate.bloomArtifactPath]]; in production
    * the index lives BESIDE the corpus it derives from.
    */
  private[graft] def ivfArtifactPath(
      spark: SparkSession,
      sfDir: String,
      nlist: Int,
      iters: Int): String = {
    val embPath = s"$sfDir/embeddings.parquet"
    val fingerprint = s"${IO.parquetRowCount(spark, embPath)}:" +
      s"${IO.parquetColumnUncompressedBytes(spark, embPath, "embedding")}"
    val key = s"ivf_v1|$sfDir|$nlist|$iters|$fingerprint"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_$digest"
  }

  /** Train the coarse codebook ONCE and persist it as a parquet table —
    * the "train" half of the stored-index contract. At 100 TB this is a
    * scheduled job that reruns only when the corpus version changes;
    * every search after that loads k×dim rows of data instead of running
    * Lloyd iterations over the corpus. Only the codebook persists, not
    * per-vector cell codes: re-assignment from the loaded codebook is a
    * map-side argmax over nlist centroids (no shuffle, no join), whereas
    * stored codes would have to JOIN the corpus on vec_id — a corpus-wide
    * shuffle that costs more than it saves at any nlist this engine uses.
    * (Stored codes win only when assignment itself is the bottleneck —
    * huge nlist — and then they belong in the corpus table as a
    * write-time column, not a side artifact.)
    */
  def persistIvfIndex(
      spark: SparkSession,
      sfDir: String,
      nlist: Int = 16,
      iters: Int = 2): String = {
    val path = ivfArtifactPath(spark, sfDir, nlist, iters)
    kmeansCodebookTable(spark, sfDir, nlist, iters)
      .write.mode("overwrite").parquet(s"$path/codebook")
    path
  }

  /** IVF search against the PERSISTED codebook artifact, self-priming on
    * first use — the production query path: repeat invocations pay a
    * k×dim artifact scan plus the probe-bounded search, never a training
    * pass. Row-identical to [[ivfCosineTopKTrained]] by construction
    * (the artifact IS the trained codebook — k-means here is
    * deterministic to the bit), so the registered row keeps the trained
    * variant's full-training-replay oracle.
    */
  def ivfCosineTopKStored(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    val path = ivfArtifactPath(spark, sfDir, nlist, iters)
    ivfCosineTopKFromTable(spark, sfDir,
      IO.servedArtifact(spark, s"$path/codebook", IvfCodebookSchema) {
        persistIvfIndex(spark, sfDir, nlist, iters); ()
      }, numQueries, k, nprobe)
  }

  // --------------------------------------------------------------------
  // Binary (1-bit) quantization ANN
  // --------------------------------------------------------------------

  /** Sign-bit signature of a 64-dim vector packed into ONE long: bit i
    * set iff v[i] > 0. Distinct powers of two sum without carries, so
    * the fold is a bitwise OR in disguise (bit 63's term is negative in
    * two's complement — still carry-free). 8 bytes per vector instead of
    * 512: the signature column is what a 100 TB corpus actually ships
    * through the candidate stage.
    */
  private def signBits(vCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          (acc, i) -> acc + CASE WHEN element_at($vCol, i + 1) > CAST(0 AS DOUBLE)
                                 THEN shiftleft(CAST(1 AS BIGINT), i)
                                 ELSE CAST(0 AS BIGINT) END)""")

  /** Binary-quantization ANN: Hamming distance between sign-bit
    * signatures shortlists candidates, exact cosine reranks the
    * shortlist — the 1-bit end of the quantization ladder (int8 is
    * [[quantizedTopK]]). For random-rotation-free sign quantization,
    * Hamming(sig(a), sig(b)) is a monotone estimator of angular distance
    * (Charikar 2002 hyperplane LSH with axis-aligned planes), so a
    * shortlist of `shortlist` ≫ k by Hamming recovers near-exact top-k
    * after rerank (recall spec-pinned against brute force).
    *
    * Scale shape: the Hamming stage scans 8-byte signatures (computed
    * map-side, never stored wide), scored against the broadcast query
    * signatures with bit_count(xor) — one codegen'd instruction pair per
    * candidate; the per-query shortlist window rewrites through
    * TopKPerKey so the exchange carries ≤ shortlist×queries rows. The
    * rerank joins the corpus against the BROADCAST shortlist ids
    * (queries×shortlist rows, bounded), so full vectors are touched
    * map-side only for shortlist members — the corpus never shuffles.
    *
    * Determinism: Hamming is integer-exact; both shortlist and final
    * rank tie-break on vec_id; the rerank cosine goes through the float
    * cast like every other ANN scorer.
    */
  def binarySignTopK(
      spark: SparkSession,
      sfDir: String,
      numQueries: Int = 10,
      k: Int = 5,
      shortlist: Int = 50): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
      .withColumn("sig", signBits("v"))
    val q = c.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("sig").as("qsig"))
    val wS = Window.partitionBy("qid").orderBy(asc("ham"), asc("vec_id"))
    val short = c.select("vec_id", "sig")
      .join(broadcast(q.select("qid", "qsig")),
        col("vec_id") =!= col("qid"))
      .withColumn("ham", expr("bit_count(sig ^ qsig)"))
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= shortlist)
      .select("qid", "vec_id")
    topKPerQuery(
      c.select("vec_id", "v")
        .join(broadcast(short), Seq("vec_id"))
        .join(broadcast(q.select("qid", "qv")), Seq("qid"))
        .withColumn("sim", expr("cosine_sim(qv, v)").cast("float")),
      k)
  }

  /** MARGIN-BASED BITEXT MINING (Artetxe & Schwenk, ACL 2019; the
    * CCMatrix/LASER alignment recipe): candidate translation pairs
    * between an English side and a non-English side of the corpus,
    * scored by the RATIO MARGIN — a pair's cosine divided by the mean
    * of the two endpoints' average similarity to their k nearest
    * cross-lingual neighbors:
    *
    *   margin(x,y) = cos(x,y) / ((avgₖNN_B(x) + avgₖNN_A(y)) / 2)
    *
    * Absolute cosine is uncalibrated across embedding neighborhoods
    * (hubness); the margin keeps a pair only when the two docs are
    * closer to EACH OTHER than to their general neighborhoods, which is
    * what makes mined bitext usable as training data. Emitted: each
    * English doc's forward top-1 with margin ≥ `threshold`.
    *
    * Determinism: pair cosines are cut to FLOAT (the topKPerQuery
    * rationale — absorbs ≤1-ulp libm drift), the k-NN averages are
    * fixed-point BIGINT sums of round(sim×10⁶) (order-independent),
    * and the margin is ONE pinned double op sequence over those exact
    * inputs, mirrored in the oracle — hash-exact cross-engine.
    *
    * Scale shape: the all-pairs A×B scoring here is the sf-local EXACT
    * baseline (the eval-suite convention of annRecallReport — mining
    * quality is judged against exact margins). The 100 TB path swaps
    * ONLY the candidate generator: both sides assign to the trained IVF
    * cells ([[kmeansCells]]) and score within probed cells — the
    * CCMatrix practice — leaving the margin algebra unchanged; the
    * sides frame builds from ONE embeddings scan + a broadcast-joined
    * doc-lang projection, and the scored frame localCheckpoints once
    * because three consumers (forward top-k/avg, backward avg) would
    * otherwise replay the scoring.
    */
  /** Pair budget of the EXACT margin baseline: past it the src side is
    * thinned by a deterministic md5 split so the eval anchor stays
    * runnable at any registered scale instead of going quadratic
    * unbounded (the r11 flag: 135 s at the ×10 cut). 16M pairs keeps
    * every driver sf uncapped (sf0.1 is ~0.9M) while bounding probe
    * cuts; the sampled anchor is still an EXACT margin eval — over a
    * uniformly-sampled query side, the standard recall-eval shape.
    */
  private[graft] val MarginExactPairBudget = 16000000L

  def marginBitextPairs(
      spark: SparkSession,
      sfDir: String,
      k: Int = 4,
      threshold: Double = 1.0,
      maxPairs: Long = MarginExactPairBudget): DataFrame = {
    val langs = IO.table(spark, sfDir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("is_en"))
    val sides = corpus(spark, sfDir).select("vec_id", "v")
      .join(langs, col("vec_id") === col("doc_id"))
      .localCheckpoint() // counted for the cap, then read by both sides
    val a0 = sides.filter(col("is_en"))
      .select(col("vec_id").as("src_id"), col("v").as("src_v"))
    val b = sides.filter(!col("is_en"))
      .select(col("vec_id").as("tgt_id"), col("v").as("tgt_v"))
    val nA = a0.count()
    val nB = b.count()
    val a =
      if (nA * nB <= maxPairs) a0
      else {
        // deterministic md5-split src sample (the corpus-split span
        // convention), threshold from the same double op order the
        // oracle computes: maxPairs / (nA*nB) * 2^32
        val cut = math.floor(
          maxPairs.toDouble / (nA * nB).toDouble * 4294967296.0).toLong
        a0.filter(
          conv(substring(md5(concat(col("src_id").cast("string"),
            lit("|margin_cap")).cast("binary")), 1, 8), 16, 10)
            .cast("long") < lit(cut))
      }
    val sims = a.crossJoin(broadcast(b))
      .select(col("src_id"), col("tgt_id"),
        expr("cosine_sim(src_v, tgt_v)").cast("float").as("sim"))
    marginFromScoredPairs(sims, k, threshold)
  }

  /** The margin algebra over any scored (src_id, tgt_id, sim) candidate
    * frame — shared by the exact all-pairs baseline and the IVF-bounded
    * production path: forward/backward k-NN fixed-point averages, the
    * forward top-1, and the gated ratio margin. Checkpoints the scored
    * frame once (three consumers) and the forward cut once (two).
    */
  private def marginFromScoredPairs(
      scored: DataFrame,
      k: Int,
      threshold: Double): DataFrame = {
    val sims = scored.localCheckpoint()
    val fpSim = sum(round(col("sim").cast("double") * lit(1000000.0))
      .cast("long")).as("fp")
    val wF = Window.partitionBy("src_id").orderBy(desc("sim"), asc("tgt_id"))
    val fwd = sims.withColumn("rn", row_number().over(wF))
      .filter(col("rn") <= k)
      .localCheckpoint() // read twice: the per-src average and the top-1
    val fwdAvg = fwd.groupBy("src_id")
      .agg(fpSim, count(lit(1)).as("n"))
      .select(col("src_id"),
        (col("fp").cast("double") / col("n").cast("double")).as("x_avg_fp"))
    val top1 = fwd.filter(col("rn") === 1).select("src_id", "tgt_id", "sim")
    val wB = Window.partitionBy("tgt_id").orderBy(desc("sim"), asc("src_id"))
    val bwdAvg = sims.withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= k)
      .groupBy("tgt_id")
      .agg(fpSim, count(lit(1)).as("n"))
      .select(col("tgt_id"),
        (col("fp").cast("double") / col("n").cast("double")).as("y_avg_fp"))
    top1
      .join(fwdAvg, "src_id")
      .join(bwdAvg, "tgt_id")
      .withColumn("margin",
        (col("sim").cast("double")
          / (((col("x_avg_fp") + col("y_avg_fp")) / lit(2.0)) / lit(1000000.0)))
          .cast("float"))
      .filter(col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin"))
      .orderBy("src_id")
  }

  /** [[marginBitextPairs]] with IVF-CELL-BOUNDED candidates — the
    * production shape of CCMatrix mining (Schwenk et al., 2021: FAISS
    * IVF indexes on both sides, margin scored within probed cells):
    * train the coarse quantizer once over the whole embedding corpus
    * ([[kmeansCodebook]] — both languages share the space, so one
    * codebook serves both sides), assign each side to its nearest cell,
    * and score a (src, tgt) pair only when tgt lies in one of the
    * src's `nprobe` closest cells (and symmetrically for the backward
    * neighborhood pass, which probes from the tgt side). The margin
    * algebra is [[marginFromScoredPairs]], unchanged — only the
    * candidate generator narrows.
    *
    * Both directions' k-NN averages are measured over the ONE
    * forward-probed candidate frame (the backward pass reads the same
    * scored pairs grouped by tgt) — the standard one-index
    * simplification of the two-index FAISS recipe; what it costs in
    * fidelity the spec measures directly as pair recall against the
    * exact baseline.
    *
    * Scale shape: per src the candidate set is Σ(probed cell sizes) ≈
    * nprobe×|B|/nlist — never |B|; the registered row pins nlist=16
    * (the ann-ladder oracle convention). At 100 TB nlist grows ∝ √N
    * (the FAISS sizing rule), holding per-query probe work ~constant;
    * the one-off codebook training is the [[kmeansCodebook]] bounded
    * artifact and assignment stays a map-side codegen argmax.
    */
  /** CONTRASTIVE TRAINING TRIPLETS mined from the pipeline's own
    * artifacts — the (anchor, positive, hard-negative) rows an
    * embedding-model trainer consumes (the SimCSE/SBERT data recipe,
    * and the reason a curation pipeline keeps its near-dup clusters
    * instead of just deleting duplicates):
    *
    *   - positive: the anchor's most-similar OTHER member of its
    *     near-dup component ([[Cluster.nearDupComponentsMd5]] — docs
    *     the dedup pipeline proved are the same content);
    *   - hard negative: the anchor's most-similar doc from its own
    *     trained IVF cell that is NOT in its component — close in
    *     embedding space yet different content, exactly the
    *     gradient-bearing negative (a random negative is trivially
    *     separable and teaches nothing).
    *
    * Anchors with no component sibling (non-duplicated docs) or no
    * same-cell non-sibling emit nothing. Ties break by float-washed
    * cosine then id, the ann-ladder convention.
    *
    * Scale shape: positives join WITHIN components (Σ|comp|² — dup
    * clusters are small by nature and the decision op spec-bounds
    * them); negatives join WITHIN cells (Σ|cell|² — the SemDeDup
    * candidate bound, nlist grows ∝ √N at scale). Embeddings cross
    * each join once per side; both argmax cuts are the TopKPerKey
    * rn=1 rewrite. The assigned frame checkpoints once for its four
    * consumers.
    */
  def trainingTriplets(
      spark: SparkSession,
      sfDir: String,
      nlist: Int = 0, // 0 = corpus-size-adaptive (see adaptiveNlist)
      iters: Int = 2): DataFrame = {
    val nl = resolveNlist(spark, sfDir, nlist)
    tripletsFromArtifacts(spark, sfDir,
      Cluster.nearDupComponentsMd5Unsorted(spark, sfDir),
      kmeansCodebook(spark, sfDir, nl, iters))
  }

  /** nlist = 0 resolves to the corpus-size-adaptive rule over the full
    * embedding table (the count the oracle's `COUNT(*) FROM v0`
    * mirrors); explicit values pass through for the fixed-geometry
    * ANN-ladder rows.
    */
  private def resolveNlist(
      spark: SparkSession,
      sfDir: String,
      nlist: Int): Int =
    if (nlist > 0) nlist
    else adaptiveNlist(IO.table(spark, sfDir, "embeddings").count())

  /** [[trainingTriplets]] consuming the PERSISTED component map and IVF
    * codebook — the production serve shape (both artifacts are
    * train-once, refreshed per corpus version; the triplet miner pays
    * only the within-component and within-cell joins). Row-identical by
    * construction, so the registered row keeps the rebuild's oracle.
    */
  def trainingTripletsStored(
      spark: SparkSession,
      sfDir: String,
      nlist: Int = 0, // 0 = corpus-size-adaptive (see adaptiveNlist)
      iters: Int = 2): DataFrame = {
    val nl = resolveNlist(spark, sfDir, nlist)
    val path = ivfArtifactPath(spark, sfDir, nl, iters)
    tripletsFromArtifacts(spark, sfDir,
      Cluster.componentMapStored(spark, sfDir),
      codebookFromTable(
        IO.servedArtifact(spark, s"$path/codebook", IvfCodebookSchema) {
          persistIvfIndex(spark, sfDir, nl, iters); ()
        }))
  }

  private def tripletsFromArtifacts(
      spark: SparkSession,
      sfDir: String,
      comp: DataFrame,
      codebook: Seq[(Long, Array[Double])]): DataFrame = {
    val c = corpus(spark, sfDir).select("vec_id", "v")
    val assigned = assignToCodebook(c, codebook)
      .join(comp, col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("v"), col("cid"), col("component_id"))
      .localCheckpoint()
    val pos = assigned.select(col("vec_id").as("anchor_id"),
        col("v").as("av"), col("component_id"))
      .join(assigned.select(col("vec_id").as("positive_id"),
        col("v").as("pv"), col("component_id")), Seq("component_id"))
      .filter(col("anchor_id") =!= col("positive_id"))
      .withColumn("pos_sim", expr("cosine_sim(av, pv)").cast("float"))
    val wP = Window.partitionBy("anchor_id")
      .orderBy(desc("pos_sim"), asc("positive_id"))
    val bestPos = pos.withColumn("rn", row_number().over(wP))
      .filter(col("rn") === 1)
      .select("anchor_id", "positive_id", "pos_sim")
    val neg = assigned.select(col("vec_id").as("anchor_id"),
        col("v").as("av"), col("cid"), col("component_id").as("acomp"))
      .join(assigned.select(col("vec_id").as("negative_id"),
        col("v").as("nv"), col("cid"), col("component_id").as("ncomp")),
        Seq("cid"))
      .filter(col("acomp") =!= col("ncomp"))
      .withColumn("neg_sim", expr("cosine_sim(av, nv)").cast("float"))
    val wN = Window.partitionBy("anchor_id")
      .orderBy(desc("neg_sim"), asc("negative_id"))
    val bestNeg = neg.withColumn("rn", row_number().over(wN))
      .filter(col("rn") === 1)
      .select("anchor_id", "negative_id", "neg_sim")
    bestPos.join(bestNeg, "anchor_id")
      .select("anchor_id", "positive_id", "pos_sim", "negative_id", "neg_sim")
      .orderBy("anchor_id")
  }

  /** Corpus-size-adaptive IVF geometry (the FAISS sizing rule, now that
    * [[simsAgainst]]'s loop form makes assignment cost nlist-flat):
    * nlist = max(16, ceil(√N)) and nprobe = max(4, nlist/8), so the
    * probed fraction shrinks ~1/√N and candidate volume grows ~N^1.5
    * instead of the fixed-nlist N²/16. Round-12 measurement at the ×10
    * cut (20k vectors): (142, 17) mines FASTER than the old fixed
    * (16, 4) — 14.1 s vs 20.3 s — at HIGHER pair recall vs the exact
    * margin baseline (1700/2570 vs 1300/2570); at sf0.1 (2k vectors,
    * (45, 6)) it is also faster at parity recall. The oracle computes
    * the same rule from COUNT(*) over the same frame, so greenness is
    * preserved by construction.
    */
  private[graft] def adaptiveNlist(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  private[graft] def adaptiveNprobe(nlist: Int): Int =
    math.max(4, nlist / 8)

  /** Pair budget of the IVF (production) margin row. The adaptive √N
    * geometry shrinks the probed FRACTION, but absolute candidate volume
    * still grows ~N^1.5 — the round-12 ×100 probe (200k vectors, ~1.25B
    * candidates) saturated a single node and had to be killed. The
    * budget is measured on the EXACT per-cell product volume
    * Σ_cells |en probes in cell| × |non-en assigned in cell| — two thin
    * counts and one ≤nlist-row aggregate, known BEFORE any pairs
    * materialize, so past the budget the SRC side thins BEFORE the
    * candidate join and the over-budget frame never rides an exchange
    * at all (budgeting after a 1.25B-row distinct would have paid the
    * very shuffle the budget exists to avoid). Thinning is BY SRC (a
    * surviving src keeps its entire probed neighborhood, so its forward
    * margin stays the IVF-exact value) with the SAME deterministic md5
    * split and salt as [[MarginExactPairBudget]]: the exact row's cut
    * is always tighter (its denominator nA·nB ≥ the cell-product
    * volume), so every src the exact baseline samples survives here too
    * and pair recall between the two rows stays well-defined under both
    * caps.
    */
  private[graft] val MarginIvfPairBudget = 16000000L

  /** Telemetry: the last IVF margin run's pre-cap candidate VOLUME (the
    * per-cell product sum the budget is measured on) — read by the
    * budget spec (the LinkGraph.lastSccSweeps convention). None when the
    * run skipped the volume aggregate (see [[lastMarginIvfSkippedBound]]).
    */
  @volatile var lastMarginIvfCandidates: Option[Long] = None

  /** Telemetry: the cheap upper bound |src probe rows| × |tgt cell rows|
    * when it proved the budget can't engage (bound ≤ maxPairs ⇒
    * Σ_c ns_c·nt_c ≤ (Σns)(Σnt) = bound ≤ maxPairs) and the run skipped
    * the volume machinery entirely; None when the exact volume agg ran.
    */
  @volatile var lastMarginIvfSkippedBound: Option[Long] = None

  def marginBitextPairsIvf(
      spark: SparkSession,
      sfDir: String,
      k: Int = 4,
      threshold: Double = 1.0,
      nlist: Int = 0, // 0 = corpus-size-adaptive (see adaptiveNlist)
      nprobe: Int = 0, // 0 = nlist/8-adaptive (see adaptiveNprobe)
      iters: Int = 2,
      maxPairs: Long = MarginIvfPairBudget): DataFrame = {
    import spark.implicits._
    val langs = IO.table(spark, sfDir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("is_en"))
    val sides = corpus(spark, sfDir).select("vec_id", "v")
      .join(langs, col("vec_id") === col("doc_id"))
      .select("vec_id", "v", "is_en")
      .localCheckpoint() // counted for sizing, then read by three plans
    val nSides = sides.count()
    val nl = resolveNlist(spark, sfDir, nlist)
    val np = if (nprobe > 0) nprobe else adaptiveNprobe(nl)
    val codebook = kmeansCodebook(spark, sfDir, nl, iters)
    val cent = codebook.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    // each side: its own cell (map-side argmax) for the candidate index,
    // and its nprobe closest cells for the probe list
    val assigned = assignToCodebook(sides, codebook)
      .join(sides.select(col("vec_id"), col("is_en")), "vec_id")
    val wP = Window.partitionBy("vec_id").orderBy(desc("psim"), asc("cid"))
    val probes = sides.crossJoin(broadcast(cent))
      .withColumn("psim", expr("cosine_sim(v, cv)").cast("float"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") <= np)
      .select(col("vec_id"), col("is_en"), col("cid"))
    // forward candidates as THIN (src, tgt) pairs: dedup (a tgt can sit
    // in several probed cells of the same src) BEFORE the vectors join
    // in, so the distinct's exchange carries 16-byte pairs instead of
    // two 64-dim embeddings per row — the vectors then ride one
    // ceiling-gated broadcast lookup each (the verify-join convention:
    // past the ceiling the same joins run shuffle-hash, keeping the
    // fat embedding rows out of any sort) and cosine runs once per
    // UNIQUE pair
    val emb = sides.select(col("vec_id"), col("v"))
    val embSmall = nSides <= Dedup.VerifySetBroadcastCeiling
    def gate(df: DataFrame): DataFrame =
      if (embSmall) broadcast(df) else df.hint("shuffle_hash")
    val srcProbesAll = probes.filter(col("is_en"))
      .select(col("vec_id").as("src_id"), col("cid"))
    val tgtCellsAll = assigned.filter(!col("is_en"))
      .select(col("vec_id").as("tgt_id"), col("cid"))
    // skip guard: every en vector emits exactly min(np, nl) probe rows
    // and every non-en vector exactly one cell row, so the row-count
    // product — one cheap count on the already-checkpointed thin sides
    // frame — upper-bounds the per-cell volume (Σ_c ns_c·nt_c ≤
    // (Σns)(Σnt)). Under the bound the budget provably cannot engage,
    // so the volume machinery (two localCheckpoints + a ≤nlist-row agg)
    // is pure overhead and is skipped.
    val nEn = sides.filter(col("is_en")).count()
    val bound = nEn * math.min(np, nl).toLong * (nSides - nEn)
    val (srcProbes, tgtCells) =
      if (bound <= maxPairs) {
        lastMarginIvfCandidates = None
        lastMarginIvfSkippedBound = Some(bound)
        (srcProbesAll, tgtCellsAll)
      } else {
        lastMarginIvfSkippedBound = None
        val srcProbes0 = srcProbesAll
          .localCheckpoint() // volume count + (possibly thinned) join side
        val tgtCells0 = tgtCellsAll
          .localCheckpoint() // volume count + join side
        // exact pre-materialization candidate volume: Σ per-cell products
        // over two thin (id, cid) frames — known before any pair exists
        val nPairs = srcProbes0.groupBy("cid").agg(count(lit(1)).as("ns"))
          .join(tgtCells0.groupBy("cid").agg(count(lit(1)).as("nt")), "cid")
          .agg(coalesce(sum(col("ns") * col("nt")), lit(0L)))
          .head.getLong(0)
        lastMarginIvfCandidates = Some(nPairs)
        val thinned =
          if (nPairs <= maxPairs) srcProbes0
          else {
            // the exact row's deterministic md5-split src thinning (same
            // salt; see MarginIvfPairBudget), cut from the same double op
            // order the oracle computes: maxPairs / nPairs * 2^32 — applied
            // BEFORE the candidate join so the over-budget frame never
            // materializes
            val cut = math.floor(
              maxPairs.toDouble / nPairs.toDouble * 4294967296.0).toLong
            srcProbes0.filter(
              conv(substring(md5(concat(col("src_id").cast("string"),
                lit("|margin_cap")).cast("binary")), 1, 8), 16, 10)
                .cast("long") < lit(cut))
          }
        (thinned, tgtCells0)
      }
    val pairs = srcProbes
      .join(tgtCells, Seq("cid"))
      .select("src_id", "tgt_id")
      .distinct()
    val sims = pairs
      .join(gate(emb.select(col("vec_id").as("src_id"),
        col("v").as("src_v"))), "src_id")
      .join(gate(emb.select(col("vec_id").as("tgt_id"),
        col("v").as("tgt_v"))), "tgt_id")
      .select(col("src_id"), col("tgt_id"),
        expr("cosine_sim(src_v, tgt_v)").cast("float").as("sim"))
    marginFromScoredPairs(sims, k, threshold)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.IO

/** PageRank over the item-transition graph mined from the events table —
  * the web-corpus quality signal (Common Crawl curation ranks domains by
  * link centrality before anything touches the text). The graph is
  * data-derived: each user's time-ordered event stream yields weighted
  * src→dst edges between consecutive items (`props.$.k`), the classic
  * click-graph construction; PageRank then runs a FIXED number of power
  * iterations with dangling-mass redistribution.
  *
  * Scale shape: edges are aggregated once to (src, dst, weight) — the
  * only event-scale shuffles are the per-user sessionization window and
  * that aggregation. The rank vector is |nodes| rows (items/domains —
  * orders of magnitude below edge volume at web scale), broadcast to the
  * edge side every iteration so EDGES NEVER SHUFFLE inside the loop; the
  * per-iteration exchange is the dst-keyed contribution sum, map-side
  * combined and bounded by |nodes|. Each round localCheckpoints the rank
  * frame — O(iters) plan depth, not O(iters) recomputation. (When the
  * rank vector itself outgrows broadcast, the same loop runs with edges
  * pre-hash-partitioned on src and a shuffle join whose edge side
  * reuses its partitioning every round — noted in SCALING.md.)
  *
  * Determinism: per-edge contributions r(u)·(w/outw(u)) are float-washed
  * and fixed-pointed to round(·×10⁹) BIGINT before the per-dst sum, and
  * the dangling mass is the BIGINT sum of round(r·10⁹) — both integer
  * sums, partition-order independent. The rank update runs in pinned
  * operation order on exact inputs, so every iteration's rank vector is
  * bit-identical across runs and engines; the DuckDB oracle replays all
  * iterations unrolled and hash-matches the final vector.
  */
object LinkGraph {

  private def items(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = IO.table(spark, sfDir, "events")
    // µs event time via the schema-aware accessor — ordering by raw ts
    // would diverge from the oracle's µs TIMESTAMPs on the legacy
    // nanos-as-long encoding (same-µs ties ordering by ns instead of
    // event_id), and the divergence would bake into the persisted graph
    // every PageRank/HITS/walk consumer reads
    ev.select(col("user_id"), EventTime.tsUs(ev).as("tus"), col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("item"))
  }

  /** The weighted transition edge list: (src, dst, weight) over
    * consecutive same-user events, self-loops dropped. This IS the graph
    * artifact — build once, iterate many.
    */
  def transitionEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    items(spark, sfDir)
      .withColumn("src", lag("item", 1).over(w))
      .where(col("src").isNotNull && col("src") =!= col("item"))
      .groupBy(col("src"), col("item").as("dst"))
      .agg(count(lit(1)).as("weight"))
      .orderBy("src", "dst")
  }

  /** PageRank after `iters` power iterations at damping `d`. Output:
    * (node, pr) for every distinct item, ordered by node.
    */
  def pageRank(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      d: Double = 0.85): DataFrame = {
    val t0 = System.nanoTime()
    // materialize the freshly-built edge list ONCE: it has two build-time
    // consumers (the out-weight aggregation and the share join), and
    // un-checkpointed each would replay the whole event-scale
    // construction (scan + per-user window + aggregation). The stored
    // entry points skip this — their edges are already a parquet
    // artifact, re-scanned for pennies.
    pageRankOver(
      transitionEdges(spark, sfDir).select("src", "dst", "weight")
        .localCheckpoint(),
      items(spark, sfDir).select(col("item").as("node")).distinct()
        .localCheckpoint(),
      iters, d, buildT0 = t0)
  }

  /** (build seconds, loop seconds) of the last [[pageRankOver]] run —
    * bench telemetry splitting a rebuild row's edge-construction cost
    * from its iteration cost (the cc-telemetry precedent).
    */
  @volatile private[graft] var lastBuildStats: Option[(Double, Double)] = None

  /** The broadcast ceiling in NODES (not bytes): ~10⁸ (long, double) rank
    * rows ≈ 3–5 GB materialized per executor — the practical edge of
    * Spark's broadcast (SCALING.md "Broadcast ceiling"). Graphs above it
    * run the co-partitioned contrib-JOIN loop instead.
    */
  private val BroadcastNodeCeiling = 100000000L

  private def pageRankOver(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int,
      d: Double,
      broadcastCeiling: Long = BroadcastNodeCeiling,
      widthRows: Option[Long] = None,
      buildT0: Long = -1L): DataFrame = {
    val t0 = if (buildT0 > 0) buildT0 else System.nanoTime()
    val outw = edges.groupBy(col("src"))
      .agg(sum("weight").cast("double").as("outw"))
    val nCount = nodes.count()
    // past the ceiling the rank vector cannot broadcast: pre-hash-
    // partition the enriched edges on src ONCE (the checkpoint pins the
    // partitioning, so edges never re-shuffle across rounds) and make
    // each round a shuffle-hash join whose build side is the |nodes|-row
    // rank frame — only (node, rank) pairs move per iteration. Identical
    // arithmetic either way: the strategy changes WHERE rows meet, never
    // their values (the joinloop row reuses the broadcast row's oracle).
    val joinLoop = nCount > broadcastCeiling
    // Width estimate: the per-round contrib join shuffles EDGE-volume
    // rows, so artifact-backed callers pass the edge row count (parquet
    // footer metadata — no job). Fresh-frame callers fall back to the
    // node count — an edges.count() here would re-run the whole edge
    // construction — which UNDER-sizes the loop on dense graphs (avg
    // degree >> 1); the floor at session width covers the small-graph
    // regime, and every stored/production entry point passes the edge
    // estimate.
    LoopWidth.pinned(edges.sparkSession, widthRows.getOrElse(nCount)) {
    val enriched = enrichedShares(edges, outw, joinLoop)
    // nodes WITH out-edges, materialized ONCE from the already-built
    // enriched frame (weights are counts >= 1, so outw's key set and
    // enriched's src set are the same set): the per-round dangling-mass
    // anti-join previously re-derived `outw` from the RAW edge frame,
    // replaying the entire edge construction every iteration on a
    // fresh-build caller
    val srcNodes = enriched.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val tLoop = System.nanoTime()
    val n = nCount.toDouble
    var ranks = nodes.withColumn("r", lit(1.0) / lit(n)).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = contribOf(enriched, ranks, joinLoop)
      // dangling mass: ranks of nodes with no out-edges, as exact fix-point
      val dangRow = ranks
        .join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum(round(col("r") * lit(1000000000.0), 0).cast("long")),
          lit(0L)).as("dfix"))
        .collect()(0)
      val dang = dangRow.getLong(0).toDouble / 1000000000.0
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - d) / n) + lit(d) *
            ((coalesce(col("sfix"), lit(0L)).cast("double") / lit(1000000000.0))
              + lit(dang / n))).as("r"))
        .localCheckpoint()
    }
    // the final ranks checkpoint is eager, so the cached edge frame is no
    // longer needed (broadcast mode's localCheckpoint is cleaned by the
    // ContextCleaner instead)
    if (joinLoop) enriched.unpersist()
    lastBuildStats = Some((buildSec, (System.nanoTime() - tLoop) / 1e9))
    ranks.select(col("node"), col("r").as("pr")).orderBy("node")
    }
  }

  /** Edge side enriched with its src's total out-weight once, before the
    * loop — w/outw is then a per-edge constant across iterations. In
    * join-loop mode the frame is hash-partitioned on src and CACHED
    * (persist, not localCheckpoint: the checkpoint's LogicalRDD forgets
    * its partitioning under AQE, while InMemoryRelation pins the
    * exchange's output partitioning — and
    * `canChangeCachedPlanOutputPartitioning` defaults false), so every
    * round's contrib join sees edges already partitioned on src and
    * never re-shuffles them; [[pageRankOver]] unpersists after the loop.
    * On a real cluster the production form of the same contract is the
    * src-bucketed edge TABLE (partitioning pinned on disk across jobs).
    */
  private def enrichedShares(
      edges: DataFrame,
      outw: DataFrame,
      joinLoop: Boolean): DataFrame = {
    val e = edges
      .join(outw, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("outw")).as("share"))
    if (joinLoop) pinnedPartitioned(e, "src") else e.localCheckpoint()
  }

  /** Cache a frame hash-partitioned on `key`, materialized EAGERLY: an
    * unexecuted cached plan reports unknown partitioning under AQE and a
    * loop would re-shuffle it every round; once final, the scan exposes
    * HashPartitioning(key). persist, not localCheckpoint: the
    * checkpoint's LogicalRDD forgets its partitioning under AQE, while
    * InMemoryRelation pins the exchange's output partitioning (and
    * `canChangeCachedPlanOutputPartitioning` defaults false). Callers
    * unpersist after their loop.
    */
  private def pinnedPartitioned(df: DataFrame, key: String): DataFrame = {
    val cached = df.repartition(col(key)).persist()
    cached.count()
    cached
  }

  /** One round's dst-keyed fixed-point contribution sum. Broadcast mode
    * ships the rank vector to the edge partitions; join-loop mode makes
    * it the BUILD side of a shuffle-hash join against the pre-partitioned
    * edges (only the |nodes|-row rank frame moves). Same arithmetic, same
    * values — only where the rows meet changes.
    */
  private def contribOf(
      enriched: DataFrame,
      ranks: DataFrame,
      joinLoop: Boolean): DataFrame = {
    val rankSide = ranks.withColumnRenamed("node", "src")
    val pulled =
      if (joinLoop) enriched.join(rankSide.hint("shuffle_hash"), "src")
      else enriched.join(broadcast(rankSide), "src")
    pulled
      .select(col("dst"),
        round((col("r") * col("share")).cast("float") * lit(1000000000.0), 0)
          .cast("long").as("cfix"))
      .groupBy("dst")
      .agg(sum("cfix").as("sfix"))
  }

  /** First-iteration contribution frame in FORCED join-loop mode — plan-
    * audit seam (the loop's per-round checkpoints hide iteration plans
    * from the returned rank frame).
    */
  private[graft] def joinLoopRoundSeam(
      spark: SparkSession,
      sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    val outw = edges.groupBy(col("src"))
      .agg(sum("weight").cast("double").as("outw"))
    val enriched = enrichedShares(edges, outw, joinLoop = true)
    val n = nodes.count().toDouble
    val ranks = nodes.withColumn("r", lit(1.0) / lit(n)).localCheckpoint()
    contribOf(enriched, ranks, joinLoop = true)
  }

  /** Content-keyed artifact location for the persisted transition graph —
    * the [[Cluster.componentArtifactPath]] convention: the key
    * fingerprints the events table from footer metadata (row count +
    * uncompressed props bytes, no Spark job), so a changed corpus primes
    * a fresh artifact instead of silently reusing a stale graph.
    */
  private[graft] def graphArtifactPath(
      spark: SparkSession,
      sfDir: String): String =
    IO.contentKeyedArtifactPath(spark, s"$sfDir/events.parquet", "props",
      "graph", s"graph_v1|$sfDir|transitions")

  /** Mine the transition graph ONCE and persist both halves of the
    * artifact — the weighted edge list and the node universe (isolated
    * items hold rank mass, so the node list cannot be re-derived from the
    * edges alone). Every iterative consumer (PageRank, HITS, any future
    * walk) then reads two small parquet scans instead of re-running the
    * event-scale sessionization window — the graph analogue of the
    * train-once codebook contract.
    */
  /** Declared schemas of the persisted graph artifacts — ids and counts
    * non-null by construction, re-stamped on read through
    * [[IO.readStamped]].
    */
  private[graft] val GraphEdgesSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("src", LongType, nullable = false),
      StructField("dst", LongType, nullable = false),
      StructField("weight", LongType, nullable = false)))
  }

  private[graft] val GraphNodesSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("node", LongType, nullable = false)))
  }

  private[graft] val SccMapSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("scc_id", LongType, nullable = false)))
  }

  def persistTransitionGraph(spark: SparkSession, sfDir: String): String = {
    val path = graphArtifactPath(spark, sfDir)
    transitionEdges(spark, sfDir)
      .write.mode("overwrite").parquet(s"$path/edges")
    items(spark, sfDir).select(col("item").as("node")).distinct()
      .write.mode("overwrite").parquet(s"$path/nodes")
    path
  }

  /** The persisted (edges, nodes) pair, self-priming on first use. */
  private[graft] def transitionGraphStored(
      spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val path = graphArtifactPath(spark, sfDir)
    if (!IO.artifactExists(spark, s"$path/nodes"))
      persistTransitionGraph(spark, sfDir)
    (IO.readStamped(spark, s"$path/edges", GraphEdgesSchema),
      IO.readStamped(spark, s"$path/nodes", GraphNodesSchema))
  }

  /** [[pageRank]] consuming the PERSISTED transition graph: repeat
    * invocations pay |edges| + |nodes| artifact scans plus the
    * |nodes|-bounded iteration loop — the event-scale window and edge
    * aggregation run only at priming. Row-identical by construction (the
    * artifact IS the graph), so the registered row keeps [[pageRank]]'s
    * oracle.
    */
  def pageRankStored(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      d: Double = 0.85): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    pageRankOver(edges, nodes, iters, d,
      widthRows = Some(storedEdgeRows(spark, sfDir)))
  }

  /** Edge row count of the persisted transition graph from parquet
    * footer metadata — the no-job width estimate every artifact-backed
    * iterative loop sizes its exchanges with (the contrib joins shuffle
    * edge-volume rows, so |edges|, not |nodes|, is the honest estimate
    * on dense graphs).
    */
  private def storedEdgeRows(spark: SparkSession, sfDir: String): Long =
    IO.parquetRowCount(spark, s"${graphArtifactPath(spark, sfDir)}/edges")

  /** [[pageRankStored]] FORCING the past-ceiling join loop (ceiling 0):
    * the code path a web-scale graph (|nodes| > ~10⁸, past the broadcast
    * ceiling) selects automatically. Bit-identical ranks — the strategy
    * changes where rows meet, not their values — so the registered row
    * reuses the broadcast loop's oracle; the plan contract (edges never
    * re-shuffle across rounds, only the |nodes|-row rank frame moves) is
    * asserted in PlanAuditSpec.
    */
  def pageRankJoinLoop(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      d: Double = 0.85): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    pageRankOver(edges, nodes, iters, d, broadcastCeiling = 0L,
      widthRows = Some(storedEdgeRows(spark, sfDir)))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over the transition
    * graph — the complementary centrality to [[pageRank]]: authorities
    * are items many strong hubs point AT, hubs are items that point at
    * strong authorities (in curation terms: link-farm detection and
    * directory-page discovery run on exactly this pair). Runs `iters`
    * rounds of the mutual-reinforcement update with L1 normalization:
    *   a(v) = Σ_{u→v} h(u)·w(u,v) / ‖·‖₁,   h(u) = Σ_{u→v} a(v)·w(u,v) / ‖·‖₁
    *
    * Scale shape: identical to [[pageRank]] — the edge list never
    * shuffles inside the loop (the |nodes|-row score vector broadcasts to
    * the edge side), each half-step's exchange is one node-keyed
    * map-side-combined sum, and the L1 norm is an exact BIGINT driver
    * scalar (the dangling-mass contract).
    *
    * Determinism: per-edge products are float-washed then fixed-pointed
    * to round(·×10⁹) BIGINT before the per-node sum; the norm is the
    * exact BIGINT sum of those sums, and the normalized score is the
    * pinned division fix/norm — bit-identical across partition orders
    * and engines; the oracle unrolls every half-step.
    */
  def hits(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 2,
      broadcastCeiling: Long = BroadcastNodeCeiling): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
    // Past the broadcast ceiling (|nodes| > ~10⁸) the score vector
    // cannot ship to the edge partitions; HITS pulls across the edges in
    // BOTH directions, so join-loop mode maintains TWO pinned edge
    // layouts — forward (src-partitioned) and reverse (dst-partitioned)
    // adjacency, the standard pair a web-scale graph store keeps on disk
    // — and each half-step is a shuffle-hash join whose build side is
    // the |nodes|-row score frame. Identical arithmetic either way (the
    // strategy changes where rows meet, never their values), so the
    // join-loop row reuses this row's oracle.
    val joinLoop = nodes.count() > broadcastCeiling
    val eRaw = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
    val eBySrc =
      if (joinLoop) pinnedPartitioned(eRaw, "src") else eRaw.localCheckpoint()
    val eByDst =
      if (joinLoop) pinnedPartitioned(eRaw, "dst") else eBySrc
    // h₀ = 1 for every node; each half-step ends L1-normalized, so the
    // init scale cancels after the first authority update
    var hubs = nodes.withColumn("s", lit(1.0)).localCheckpoint()
    var auths = nodes.withColumn("s", lit(0.0))
    for (_ <- 0 until iters) {
      auths = halfStep(eBySrc, nodes, hubs, "src", "dst", joinLoop)
      hubs = halfStep(eByDst, nodes, auths, "dst", "src", joinLoop)
    }
    if (joinLoop) { eBySrc.unpersist(); eByDst.unpersist() }
    val hsel = hubs.select(col("node"), col("s").as("hub"))
    val asel = auths.select(col("node"), col("s").as("authority"))
    // presentation join: |nodes|-row sides — broadcastable below the
    // ceiling, plain co-keyed joins past it
    val joined =
      if (joinLoop)
        nodes.join(hsel, Seq("node"), "left").join(asel, Seq("node"), "left")
      else
        nodes.join(broadcast(hsel), Seq("node"), "left")
          .join(broadcast(asel), Seq("node"), "left")
    joined.select(col("node"), col("hub"), col("authority")).orderBy("node")
    }
  }

  /** [[hits]] FORCING the past-ceiling join loop (ceiling 0) — the code
    * path a web-scale graph selects automatically, bit-identical scores
    * (same oracle); the per-round plan contract (edges keep their two
    * pinned layouts, only score rows shuffle) is asserted in
    * PlanAuditSpec via [[hitsJoinLoopRoundSeam]].
    */
  def hitsJoinLoop(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 2): DataFrame =
    hits(spark, sfDir, iters, broadcastCeiling = 0L)

  /** First HITS half-step's pre-normalization aggregation in FORCED
    * join-loop mode — plan-audit seam (the loop's per-round checkpoints
    * and the norm collect hide iteration plans from the returned frame).
    */
  private[graft] def hitsJoinLoopRoundSeam(
      spark: SparkSession,
      sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    val eBySrc = pinnedPartitioned(
      edges.select(col("src"), col("dst"),
        col("weight").cast("double").as("w")), "src")
    val hubs = nodes.withColumn("s", lit(1.0)).localCheckpoint()
    pulledSums(eBySrc, hubs, "src", "dst", joinLoop = true)
  }

  /** Personalized PageRank (random walk with restart): identical power
    * iteration to [[pageRank]] but teleportation — and dangling mass —
    * returns to a SEED SET instead of the uniform vector:
    *   r(v) = (1−d)·tele(v) + d·(Σ contrib + dang·tele(v)),
    * tele uniform over the seeds, zero elsewhere. This is the
    * seed-expansion primitive of corpus curation ("rank everything by
    * proximity to these known-good domains") — the published
    * Common-Crawl curation signal is exactly a PPR from a trusted seed
    * list. Seeds here are the pinned predicate node % 10 = 0 (a
    * deterministic, data-independent selection the oracle replays); a
    * production caller passes any seed table into the same shape.
    *
    * Scale shape and determinism: exactly [[pageRank]] — edges never
    * shuffle in the loop, contributions and dangling mass are
    * fixed-point BIGINT sums, and the PPR-specific teleport arithmetic
    * runs in its own pinned operation order (this loop does NOT reuse
    * [[pageRank]]'s scalar constants, whose driver-folded (1−d)/n would
    * round differently from (1−d)·tele(v)).
    */
  def personalizedPageRank(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      d: Double = 0.85,
      broadcastCeiling: Long = BroadcastNodeCeiling): DataFrame = {
    val (edges, nodes0) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
    val outw = edges.groupBy(col("src"))
      .agg(sum("weight").cast("double").as("outw"))
    // past the ceiling: same seam as PageRank — src-pinned cached edges,
    // per-round shuffle-hash contrib join with the rank frame as build
    // side ([[enrichedShares]]/[[contribOf]]); same arithmetic either
    // way, so the join-loop row reuses this row's oracle
    val joinLoop = nodes0.count() > broadcastCeiling
    val enriched = enrichedShares(edges, outw, joinLoop)
    // dangling-set seam: one distinct over the materialized enriched
    // frame instead of re-aggregating outw from the edge scan per round
    // (the pageRankOver srcNodes fix)
    val srcNodes = enriched.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val nSeeds = nodes0.filter(col("node") % 10 === 0).count().toDouble
    val nodes = nodes0
      .withColumn("tele",
        when(col("node") % 10 === 0, lit(1.0) / lit(nSeeds)).otherwise(lit(0.0)))
      .localCheckpoint()
    var ranks = nodes.select(col("node"), col("tele").as("r")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = contribOf(enriched, ranks, joinLoop)
      val dang = ranks
        .join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum(round(col("r") * lit(1000000000.0), 0).cast("long")),
          lit(0L)).as("dfix"))
        .collect()(0).getLong(0).toDouble / 1000000000.0
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - d) * col("tele") + lit(d) *
            ((coalesce(col("sfix"), lit(0L)).cast("double") / lit(1000000000.0))
              + lit(dang) * col("tele"))).as("r"))
        .localCheckpoint()
    }
    if (joinLoop) enriched.unpersist()
    ranks.select(col("node"), col("r").as("ppr")).orderBy("node")
    }
  }

  /** [[personalizedPageRank]] FORCING the past-ceiling join loop (ceiling
    * 0) — bit-identical scores (strategy, not values), same oracle.
    */
  def personalizedPageRankJoinLoop(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      d: Double = 0.85): DataFrame =
    personalizedPageRank(spark, sfDir, iters, d, broadcastCeiling = 0L)

  /** Deterministic weighted random walks over the stored transition
    * graph — the DeepWalk/node2vec corpus generator: one walk per start
    * node, each step drawn ∝ edge weight, emitted as (walk_id, step,
    * node) sequences ready for the skip-gram/packing pipeline. The
    * "randomness" is the repo's standard hash-derandomization: step t of
    * walk w draws u = md5(w:t) mod outweight(cur), so every walk is
    * reproducible across runs, partition orders, and engines (the oracle
    * replays each step), and walks ending at a sink stop early — exactly
    * the published termination rule.
    *
    * Scale shape: out-edges get exact integer cumulative-weight spans
    * ONCE (one window over the edge artifact, src-partitioned); each
    * step is then one join of the |nodes|-bounded walk frontier against
    * the span table on the current node — the frontier shuffles, edges
    * are the build side, nothing rescans the events table. Walk count
    * scales with |nodes| (start-per-node), not corpus volume; longer
    * walks are O(length) such joins.
    *
    * Determinism: spans are exact integer cumsums over a pinned
    * (src, dst) order; the draw is an exact integer mod; membership is
    * integer interval containment — no floating point anywhere.
    */
  def randomWalks(
      spark: SparkSession,
      sfDir: String,
      length: Int = 4): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
    val wspans = Window.partitionBy("src").orderBy("dst")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = edges
      .withColumn("hi", sum("weight").over(wspans))
      .withColumn("lo", col("hi") - col("weight"))
      .withColumn("total", sum("weight").over(Window.partitionBy("src")))
      .localCheckpoint()
    var frontier = nodes
      .select(col("node").as("walk_id"), col("node").as("cur"))
    var out = frontier
      .select(col("walk_id"), lit(0).as("step"), col("cur").as("node"))
    for (t <- 1 to length) {
      val u = pmod(
        conv(substring(md5(concat(
          col("walk_id").cast("string"), lit(":"), lit(t).cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long"),
        col("total"))
      frontier = frontier
        .join(spans.withColumnRenamed("src", "cur"), "cur")
        .where(u >= col("lo") && u < col("hi"))
        .select(col("walk_id"), col("dst").as("cur"))
        .localCheckpoint()
      out = out.unionByName(
        frontier.select(col("walk_id"), lit(t).as("step"), col("cur").as("node")))
    }
    out.orderBy("walk_id", "step")
    }
  }

  /** SKIP-GRAM PAIR EXTRACTION over the deterministic [[randomWalks]]
    * corpus — the DeepWalk/node2vec training-set builder (Perozzi et al.
    * KDD 2014): every ordered (center, context) node pair co-occurring
    * within `window` steps of the same walk, with its exact multiplicity
    * — the co-occurrence table a skip-gram embedding trains on.
    *
    * Scale shape: walks are |nodes|·(length+1) rows (they scale with the
    * node universe, not corpus volume); the windowed self-join keys on
    * walk_id, so each join group is one walk (≤ length+1 rows) and the
    * output is ≤ 2·window·|walk rows| before the count aggregation —
    * linear in the walk corpus with a constant factor, never quadratic.
    * The pair table is what ships to the embedding trainer; at 100 TB of
    * events the walk corpus is still node-scale.
    *
    * Determinism: walks are hash-derandomized (each step an exact
    * integer draw), steps and counts are exact integers — the pair
    * table is bit-stable across runs and engines.
    */
  def walkSkipgrams(
      spark: SparkSession,
      sfDir: String,
      length: Int = 4,
      window: Int = 2): DataFrame = {
    // two consumers (both join sides): materialize the walk corpus once
    val walks = randomWalks(spark, sfDir, length).localCheckpoint()
    val a = walks.select(col("walk_id"), col("step").as("sa"),
      col("node").as("center"))
    val b = walks.select(col("walk_id"), col("step").as("sb"),
      col("node").as("context"))
    a.join(b, Seq("walk_id"))
      .where(col("sa") =!= col("sb")
        && abs(col("sa") - col("sb")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("center", "context")
  }

  /** One HITS half-step: pull `scores` across the edges from `from` to
    * `to`, fixed-point-sum per target node, L1-normalize by the exact
    * BIGINT total, null-fill unreached nodes with 0.
    */
  private def halfStep(
      e: DataFrame,
      nodes: DataFrame,
      scores: DataFrame,
      from: String,
      to: String,
      joinLoop: Boolean): DataFrame = {
    val pulled = pulledSums(e, scores, from, to, joinLoop)
    val norm = pulled.agg(coalesce(sum("sfix"), lit(0L)))
      .collect()(0).getLong(0)
    nodes
      .join(pulled, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("sfix"), lit(0L)).cast("double")
          / lit(norm.toDouble)).as("s"))
      .localCheckpoint()
  }

  /** The half-step's node-keyed fixed-point sum: broadcast mode ships the
    * score vector to the (checkpointed) edge partitions; join-loop mode
    * makes it the BUILD side of a shuffle-hash join against an edge
    * frame pre-partitioned on `from`, so edges never re-shuffle — only
    * the |nodes|-row score frame moves. Same arithmetic, same values.
    */
  private def pulledSums(
      e: DataFrame,
      scores: DataFrame,
      from: String,
      to: String,
      joinLoop: Boolean): DataFrame = {
    val scoreSide = scores.withColumnRenamed("node", from)
    val joined =
      if (joinLoop) e.join(scoreSide.hint("shuffle_hash"), Seq(from))
      else e.join(broadcast(scoreSide), Seq(from))
    joined
      .select(col(to).as("node"),
        round((col("s") * col("w")).cast("float") * lit(1000000000.0), 0)
          .cast("long").as("cfix"))
      .groupBy("node")
      .agg(sum("cfix").as("sfix"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * UNDIRECTED transition graph — community detection for the click
    * graph (curation-pipeline use: group items/domains into traffic
    * communities, then cap or stratify sampling per community instead of
    * per raw domain). Each round every node adopts the label with the
    * highest total incident edge weight among its neighbors' current
    * labels, ties broken by the SMALLEST label; isolated nodes keep
    * their own. Initial label = node id, `iters` fixed synchronous
    * rounds (the deterministic variant — asynchronous order-dependent
    * updates would not replay cross-engine).
    *
    * Scale shape: the directed edge artifact symmetrizes and weight-
    * merges ONCE before the loop ((u,v)+(v,u) collapse, at most 2|E|
    * rows); inside the loop edges never shuffle — the |nodes|-row label
    * frame broadcasts to the edge side (or, past the broadcast ceiling,
    * becomes the build side of a shuffle-hash join against the v-pinned
    * cached edge layout, the [[pageRankOver]] seam), the per-round
    * exchange is the (u,label)-keyed weight sum (map-side combined,
    * bounded by distinct incident labels ≤ 2|E|), and the argmax is the
    * two-phase TopKPerKey rn=1 rewrite. O(iters) plan depth via
    * per-round localCheckpoints.
    *
    * Determinism: weights and labels are exact longs end to end — the
    * vote sum, the (sw desc, l asc) argmax, and the label update are all
    * integer operations, so every round's label vector is bit-identical
    * across partition orders and engines; the DuckDB oracle unrolls all
    * rounds.
    */
  def labelPropagation(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3,
      broadcastCeiling: Long = BroadcastNodeCeiling): DataFrame =
    labelsAfter(spark, sfDir, iters, broadcastCeiling)
      .select(col("node"), col("l").as("community"))
      .orderBy("node")

  /** [[labelPropagation]] FORCING the past-ceiling join loop (ceiling 0)
    * — the code path a web-scale graph selects automatically,
    * bit-identical labels (strategy, not values), same oracle.
    */
  def labelPropagationJoinLoop(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3): DataFrame =
    labelPropagation(spark, sfDir, iters, broadcastCeiling = 0L)

  /** Community-size profile over the converged labels — the row a
    * curation planner actually consumes (per-community caps/mixture
    * weights need sizes, not the raw member map). One extra
    * |nodes|-bounded aggregation over [[labelPropagation]]'s output.
    */
  def labelCommunitySizes(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3): DataFrame =
    labelsAfter(spark, sfDir, iters, BroadcastNodeCeiling)
      .groupBy(col("l").as("community"))
      .agg(count(lit(1)).as("members"))
      .orderBy("community")

  /** The (node, l) label frame after `iters` synchronous rounds — the
    * shared loop behind [[labelPropagation]]/[[labelCommunitySizes]].
    */
  private def labelsAfter(
      spark: SparkSession,
      sfDir: String,
      iters: Int,
      broadcastCeiling: Long): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    // the per-round vote join shuffles (at most) the symmetrized edge
    // volume — 2|edges| is the honest width estimate, from footer
    // metadata like every other artifact-backed loop
    LoopWidth.pinned(spark, 2L * storedEdgeRows(spark, sfDir)) {
    val joinLoop = nodes.count() > broadcastCeiling
    val und0 = edges
      .select(col("src").as("u"), col("dst").as("v"), col("weight"))
      .unionByName(
        edges.select(col("dst").as("u"), col("src").as("v"), col("weight")))
      .groupBy("u", "v")
      .agg(sum("weight").as("w"))
    val und =
      if (joinLoop) pinnedPartitioned(und0, "v") else und0.localCheckpoint()
    var labels = nodes.withColumn("l", col("node")).localCheckpoint()
    for (_ <- 0 until iters) {
      val lblSide = labels.select(col("node").as("v"), col("l"))
      val pulled =
        if (joinLoop) und.join(lblSide.hint("shuffle_hash"), Seq("v"))
        else und.join(broadcast(lblSide), Seq("v"))
      val votes = pulled.groupBy(col("u"), col("l")).agg(sum("w").as("sw"))
      val win = Window.partitionBy("u").orderBy(col("sw").desc, col("l").asc)
      val top = votes
        .withColumn("rn", row_number().over(win))
        .where(col("rn") === 1)
        .select(col("u").as("node"), col("l").as("nl"))
      // label update: |nodes|-row sides both ways — broadcastable below
      // the ceiling, plain co-keyed join past it (the HITS presentation-
      // join convention)
      val topSide = if (joinLoop) top else broadcast(top)
      labels = labels
        .join(topSide, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("l")).as("l"))
        .localCheckpoint()
    }
    if (joinLoop) und.unpersist()
    labels
    }
  }

  /** MODULARITY profile of the label-propagation partition — the quality
    * metric that tells a curation planner whether the communities are
    * real structure or noise (Newman's Q: fraction of edge weight inside
    * communities minus the expectation under the degree-preserving null
    * model). Per community c over the symmetrized weighted graph:
    *   q_c = w_in(c)/m2 − (w_tot(c)/m2)²,   Q = Σ_c q_c
    * with m2 = Σ w (both directions — the usual 2m), w_in both-direction
    * intra-community weight, w_tot the community's degree mass.
    *
    * Scale shape: one symmetrized-edge pass joined twice against the
    * |nodes|-row label frame (broadcast below the usual ceiling, AQE's
    * call — one-shot, not a loop), then a |communities|-row aggregation.
    * Determinism: weights are exact longs, so w_in·m2 − w_tot² is an
    * exact integer per community and q_contrib is one division of exact
    * integer-valued doubles — bit-identical cross-engine. Headroom:
    * exact while m2 < ~3·10⁹ (w_in·m2 in a long); a web-scale run lifts
    * the fix to DECIMAL, the moment-sum convention.
    */
  def labelPropModularity(
      spark: SparkSession,
      sfDir: String,
      iters: Int = 3): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    val labels = labelsAfter(spark, sfDir, iters, BroadcastNodeCeiling)
    val sym = edges
      .select(col("src").as("u"), col("dst").as("v"), col("weight"))
      .unionByName(
        edges.select(col("dst").as("u"), col("src").as("v"), col("weight")))
    val lu = labels.select(col("node").as("u"), col("l").as("cu"))
    val lv = labels.select(col("node").as("v"), col("l").as("cv"))
    val tagged = sym.join(lu, "u").join(lv, "v").localCheckpoint()
    val m2 = tagged.agg(sum("weight")).collect()(0).getLong(0)
    tagged
      .groupBy(col("cu").as("community"))
      .agg(
        sum(when(col("cu") === col("cv"), col("weight")).otherwise(0L))
          .as("w_in"),
        sum("weight").as("w_tot"))
      .join(labels.groupBy(col("l").as("community"))
        .agg(count(lit(1)).as("members")), Seq("community"), "right")
      .select(col("community"), col("members"),
        coalesce(col("w_in"), lit(0L)).as("w_in"),
        coalesce(col("w_tot"), lit(0L)).as("w_tot"),
        ((coalesce(col("w_in"), lit(0L)) * lit(m2)
          - coalesce(col("w_tot"), lit(0L)) * coalesce(col("w_tot"), lit(0L)))
          .cast("double")
          / (lit(m2).cast("double") * lit(m2).cast("double"))).as("q_contrib"))
      .orderBy("community")
  }

  /** Per-node TRIANGLE counts over the undirected click graph — the
    * cohesion signal community/curation audits read next to degree (a
    * high-degree node with zero triangles is a hub/spam pattern; dense
    * triangle mass marks organic browsing neighborhoods). Counts each
    * triangle once per incident node; nodes in no triangle (including
    * isolated items) report 0.
    *
    * Algorithm: degree-ordered edge orientation (Schank–Wagner; the
    * MapReduce analysis is Suri & Vassilvitskii, "Counting Triangles and
    * the Curse of the Last Reducer", WWW 2011). Each undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher; wedges
    * are pairs of out-edges at a common source, and a wedge (a→b, a→c)
    * with (deg,id)(b) < (deg,id)(c) closes iff the oriented edge b→c
    * exists. Every triangle is generated EXACTLY once (its lowest-order
    * vertex is the wedge source), so no post-dedup is needed.
    *
    * Scale shape: orientation bounds every out-neighborhood by O(√m), so
    * wedge volume is Σ outdeg² ≤ O(m^1.5) — the curse-of-the-last-reducer
    * fix (a uniform-degree orientation-free wedge join would explode on
    * the max-degree hub). All three joins are equi-key shuffles on node
    * ids ((a) for the wedge join, (b,c) for the closing probe); only
    * (long, long, long) rows move — never weights, never text. The
    * degree frame is |nodes| rows; AQE picks broadcast for it below its
    * thresholds and a co-keyed shuffle join past them — no manual hint
    * needed because the join is one-shot, not a loop.
    *
    * Determinism: everything is exact integer arithmetic on exact keys —
    * bit-identical across partition orders and engines; the DuckDB
    * oracle replays orientation, wedges, and the closing probe verbatim.
    */
  def triangleCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    nodeTriangles(undirectedOf(edges), nodes)
      .select(col("node"), col("triangles"))
      .orderBy("node")
  }

  /** LOCAL CLUSTERING COEFFICIENT per node: lcc = 2·T / (d·(d−1)) for
    * degree ≥ 2, else 0 — the standard per-node cohesion ratio over the
    * same oriented-wedge triangle counts. Degrees and triangle counts
    * are exact longs; the single division runs on exactly-representable
    * integer-valued doubles (d·(d−1) < 2⁵³ at any real degree), so the
    * double result is IEEE-identical cross-engine.
    */
  def clusteringCoefficients(spark: SparkSession, sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    nodeTriangles(undirectedOf(edges), nodes)
      .select(col("node"), col("degree"), col("triangles"),
        when(col("degree") >= 2,
          (col("triangles") * 2).cast("double")
            / (col("degree").cast("double") * (col("degree") - 1).cast("double")))
          .otherwise(lit(0.0)).as("lcc"))
      .orderBy("node")
  }

  /** BOUNDED-HOP BFS DISTANCES from the pinned seed set (node % 10 = 0,
    * the PPR seed convention): every node's hop distance to the nearest
    * seed over the UNDIRECTED click graph, up to `maxHops` — the
    * reachability primitive under seed-proximity curation ("how many
    * clicks from a trusted domain is this item?"), and the exact-
    * distance complement to PPR's probability mass. The hop bound is
    * part of the CONTRACT (rows stop at maxHops), so the result is
    * well-defined with a fixed round count — no convergence test, no
    * data-dependent unroll hazard for the oracle.
    *
    * Scale shape: the frontier loop is the standard distributed BFS —
    * per round one frontier⋈edges equi-join plus a min-aggregation
    * bounded by |reached nodes|, checkpointed per round with LoopWidth
    * pinned to the symmetrized edge estimate; edges never carry more
    * than (long, long) rows. Integer hop counts, min-relaxation —
    * order-independent and engine-exact.
    */
  /** WIDEST-PATH (max-bottleneck) capacities from the pinned seed set
    * (node %% 10 == 0) over the DIRECTED stored transition graph, bounded
    * at `maxHops` relaxation rounds: cap(v) = max over <=maxHops-hop
    * paths from any seed of the MINIMUM edge weight along the path — the
    * "how much traffic can this route carry" rank of a click path, the
    * weighted sibling of [[bfsDistances]].
    *
    * Scale shape: per round one join of the edge artifact against the
    * node-bounded capacity frame and one node-keyed max — monotone state
    * (caps only rise), no frontier blow-up; the edge table itself never
    * shuffles (the capacity side is the small build side). Exactly
    * `maxHops` rounds, matching the oracle's unrolled MATERIALIZED CTE
    * chain round for round.
    *
    * Determinism: weights are exact counts; min/max relaxation is pure
    * integer arithmetic; seeds start at a 2^62 sentinel so min(INF, w)
    * is exact and unreached/seed rows filter out on the sentinel.
    */
  def widestPaths(
      spark: SparkSession,
      sfDir: String,
      maxHops: Int = 6): DataFrame = {
    val inf = 1L << 62
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      val e = edges.select(col("src").as("u"), col("dst").as("v"),
        col("weight"))
      var cap = nodes.filter(col("node") % 10 === 0)
        .select(col("node"), lit(inf).as("cap"))
        .localCheckpoint()
      for (_ <- 1 to maxHops) {
        val relax = e.join(cap.select(col("node").as("u"), col("cap")), "u")
          .select(col("v").as("node"),
            least(col("cap"), col("weight")).as("cap"))
        cap = cap.unionByName(relax)
          .groupBy("node").agg(max("cap").as("cap"))
          .localCheckpoint()
      }
      cap.filter(col("cap") < inf).orderBy("node")
    }
  }

  def bfsDistances(
      spark: SparkSession,
      sfDir: String,
      maxHops: Int = 6): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, 2L * storedEdgeRows(spark, sfDir)) {
      val sym = edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
        .distinct()
        .localCheckpoint()
      var dist = nodes.filter(col("node") % 10 === 0)
        .select(col("node"), lit(0).as("dist"))
        .localCheckpoint()
      for (h <- 1 to maxHops) {
        val frontier = dist.filter(col("dist") === h - 1)
          .select(col("node").as("u"))
        val reached = sym.join(frontier, "u")
          .select(col("v").as("node"), lit(h).as("dist"))
        dist = dist.unionByName(reached)
          .groupBy("node").agg(min("dist").as("dist"))
          .localCheckpoint()
      }
      dist.orderBy("node")
    }
  }

  /** K-CORE membership (k = 3): the maximal subgraph in which every node
    * keeps at least k neighbors — the classic link-spam/noise trim (a
    * page farm's long tentacles peel away; the dense organic core
    * survives), run by iterative peeling: drop all nodes below degree k,
    * recompute degrees, repeat to fixpoint. Emits the surviving nodes
    * with their WITHIN-CORE degree.
    *
    * Scale shape: the loop state is the (long, long) undirected edge
    * list, which only ever SHRINKS; each round is one degree
    * aggregation plus two semi-joins against the |nodes|-bounded keep
    * set, checkpointed per round (the star-contraction materialization
    * policy) with LoopWidth pinned to the edge estimate. Convergence is
    * edge-count stability — one count job per round on checkpointed
    * data; a 30-round cap fails loudly (peeling is monotone, so real
    * graphs converge in a handful of rounds — the spec pins the bound
    * the oracle's unroll relies on).
    *
    * Determinism: peeling is a pure set fixpoint — no tie-breaks, no
    * arithmetic beyond integer degree counts; the fixpoint is unique
    * regardless of round count, so the DuckDB oracle may safely
    * OVER-unroll (extra rounds are no-ops on a converged set).
    */
  def kCoreMembers(
      spark: SparkSession,
      sfDir: String,
      k: Int = 3): DataFrame = {
    val (edges, _) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      kCoreOver(undirectedOf(edges), k)
    }
  }

  /** Peeling core over an explicit distinct undirected (u, v) frame —
    * the synthetic-graph test seam. Records (rounds, final edge count)
    * in [[Cluster.lastRunStats]]-style telemetry via the return path
    * of [[lastKCoreRounds]].
    */
  private[graft] def kCoreOver(und0: DataFrame, k: Int): DataFrame = {
    var und = und0.localCheckpoint()
    var prev = und.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < 30) {
      val deg = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val next = und
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .localCheckpoint()
      val cnt = next.count()
      converged = cnt == prev
      prev = cnt
      und = next
      rounds += 1
    }
    require(converged, s"k-core peeling did not converge in 30 rounds")
    lastKCoreRounds = Some(rounds)
    und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
      .orderBy("node")
  }

  /** Rounds of the most recent [[kCoreOver]] call on this driver — the
    * telemetry seam the oracle-unroll-bound spec reads.
    */
  @volatile private[graft] var lastKCoreRounds: Option[Int] = None

  /** Distinct undirected (u < v) edge set of the directed weighted edge
    * artifact — weights collapse (triangle structure is unweighted) and
    * reciprocal pairs merge.
    */
  private def undirectedOf(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** (node, degree, triangles) for every node in the universe — the
    * shared frame behind [[triangleCounts]]/[[clusteringCoefficients]];
    * also the test seam for synthetic graphs ([[nodeTriangles]] with a
    * constructed edge frame).
    */
  private[graft] def nodeTriangles(
      und: DataFrame,
      nodes: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("d"))
    // orient low→high in (degree, id) order; carry the head's (deg, id)
    // so the wedge join can order out-neighbors without re-joining deg
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("db"))
      .localCheckpoint()
    // wedges at a: out-neighbor pairs ordered by (deg, id) — the closing
    // edge is then oriented b→c by construction
    val e1 = oriented.select(col("a"), col("b"), col("db"))
    val e2 = oriented.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val tris = e1.join(e2, Seq("a"))
      .where(col("db") < col("dc")
        || (col("db") === col("dc") && col("b") < col("c")))
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
      .select("a", "b", "c")
    val perNode = tris.select(col("a").as("n"))
      .unionByName(tris.select(col("b").as("n")))
      .unionByName(tris.select(col("c").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("t"))
    nodes
      .join(deg.withColumnRenamed("n", "node"), Seq("node"), "left")
      .join(perNode.withColumnRenamed("n", "node"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("d"), lit(0L)).as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"))
  }

  /** STRONGLY CONNECTED COMPONENTS of the dominant-transition backbone
    * ([[backboneOf]], each node's top-2 out-edges) — the directed
    * counterpart of the near-dup components: nodes mutually reachable
    * through dominant transitions form one SCC (the "browsing loop"
    * structure PageRank's stationary mass concentrates on; the
    * condensation DAG below is what makes a directed graph tractable
    * for topological batch scheduling).
    *
    * Algorithm: iterative FORWARD-BACKWARD label splitting (the
    * distributed FW-BW decomposition, Fleischer/Hendrickson/Pinar,
    * IRREGULAR 2000 — the same family GraphX's SCC uses). Each sweep,
    * within the current class partition (class key = the (f, b) label
    * pair, initially one class):
    *
    *   f(v) = min node id that reaches v within the class,
    *   b(v) = min node id v reaches within the class,
    *
    * both by min-propagation join loops run to their fixpoint. An SCC
    * never splits across classes (reachability into/out of an SCC is
    * uniform over its members, and a whole SCC inside a class keeps its
    * internal edges within the class), while any class holding ≥2 SCCs
    * strictly splits every sweep (the upstream SCC's (f, b) differs
    * from the downstream's in whichever order their minima fall) — so
    * the sweep loop converges to exactly one class per SCC, at which
    * point f = b = the SCC's min member id, the emitted `scc_id`.
    *
    * Scale shape: state frames are |nodes| rows of three longs — the
    * rank-vector shape, never edge-volume; the distinct edge pairs
    * checkpoint once and every propagation round is one edges⋈labels
    * join + a min aggregation (map-side combinable, exact on longs —
    * no float drift anywhere, which is why the exact-closure oracle
    * hash-matches). Convergence checks are 1-row/isEmpty collects, and
    * both loop depths are convergence-bounded with hard caps
    * (spec-asserted on a known nesting chain, the star-contraction
    * convention).
    */
  def sccComponents(spark: SparkSession, sfDir: String): DataFrame = {
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      // build/loop telemetry (the pr_split convention): materialize the
      // two graph inputs HERE — inside the pinned loop width, so the
      // checkpointed frames carry the loop's exchange width — and the
      // wall divides into "checkpointed graph builds" vs "the nested
      // FW-BW fixpoint", the split the bench payload reports for the
      // board's slowest graph row
      val tBuild = System.nanoTime()
      val (edges, nodes) = transitionGraphStored(spark, sfDir)
      // LAZY (r20): nn is materialized by sccOver's own nodes.count(),
      // bb by the first sweep's e2 job — two fewer standalone driver
      // roundtrips. Note the build/loop telemetry consequence: the
      // backbone window now executes inside the loop's first job, so
      // build_sec reads ≈ 0 and the loop wall absorbs the build.
      val bb = backboneOf(edges).select("src", "dst")
        .localCheckpoint(eager = false)
      val nn = nodes.select("node").localCheckpoint(eager = false)
      val buildSec = (System.nanoTime() - tBuild) / 1e9
      val tLoop = System.nanoTime()
      // sccOver's FW-BW loop is internally eager (every sweep ends in
      // actions), so by return time the loop work is done — only the
      // |nodes|-row presentation window/sort stays lazy, attributed to
      // neither half. No extra materialization for the telemetry.
      val out = sccOver(bb, nn, preMaterialized = true)
      lastBuildStats = Some((buildSec, (System.nanoTime() - tLoop) / 1e9))
      out
    }
  }

  /** CONDENSATION of the backbone: the DAG whose vertices are the SCCs
    * and whose edge (a, b, weight) sums the backbone transition weight
    * from SCC a into SCC b (a ≠ b) — where traffic funnels once loops
    * collapse. |SCCs|²-bounded output. This is the SERVE row of the
    * pair: it consumes the PERSISTED scc map (decompose once, consume
    * many — the stored-artifact convention; `graph_scc` is the row that
    * pays the FW-BW loop), joined onto the backbone edge list twice.
    */
  def sccCondensation(spark: SparkSession, sfDir: String): DataFrame = {
    val (edges, _) = transitionGraphStored(spark, sfDir)
    val scc = sccMapStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      backboneOf(edges)
        .join(scc.select(col("node").as("src"), col("scc_id").as("src_scc")),
          "src")
        .join(scc.select(col("node").as("dst"), col("scc_id").as("dst_scc")),
          "dst")
        .where(col("src_scc") =!= col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(sum("weight").as("weight"))
        .orderBy("src_scc", "dst_scc")
    }
  }

  /** NEIGHBORHOOD FUNCTION over the dominant-transition backbone:
    * N(v, t) = |{u : dist(v, u) ≤ t}| for t = 1..maxHops (self
    * included) — the primitive behind effective-diameter and
    * reach-centrality reporting (HyperBall/ANF compute exactly this
    * with HLL registers when the ball outgrows memory; on a top-k
    * backbone the ball is k^t-BOUNDED — ≤ 2³ out-neighbors here — so
    * the exact pair set is ≤ Σk^t·|nodes| rows and the sketch is
    * unnecessary at any corpus size: the sparsification IS the scale
    * contract, same as [[sccComponents]]).
    *
    * Shape: maxHops unrolled frontier joins (pairs ⋈ edges, distinct),
    * each materialized once; counts are one map-side-combinable
    * aggregation per hop; no driver loop, no convergence check.
    */
  def neighborhoodCounts(
      spark: SparkSession,
      sfDir: String,
      maxHops: Int = 3): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      neighborhoodOver(backboneOf(edges).select("src", "dst"),
        nodes.select("node"), maxHops)
    }
  }

  /** Hop-unrolled reach counts over explicit (src, dst) edges — the
    * synthetic-graph test seam. */
  private[graft] def neighborhoodOver(
      edges0: DataFrame,
      nodes0: DataFrame,
      maxHops: Int): DataFrame = {
    val bb = edges0.localCheckpoint()
    val nodes = nodes0.localCheckpoint()
    var pairs = nodes.select(col("node").as("u"), col("node").as("v"))
      .localCheckpoint()
    val counts = (1 to maxHops).map { h =>
      pairs = pairs
        .unionByName(pairs.join(bb, pairs("v") === bb("src"))
          .select(col("u"), col("dst").as("v")))
        .distinct()
        .localCheckpoint()
      pairs.groupBy(col("u").as("node"))
        .agg(count(lit(1)).as(s"r$h"))
    }
    counts.foldLeft(nodes)((acc, c) => acc.join(c, Seq("node"), "left"))
      .select(col("node") +:
        (1 to maxHops).map(h => coalesce(col(s"r$h"), lit(1L)).as(s"r$h")): _*)
      .orderBy("node")
  }

  /** PER-SCC PROFILE — the rollup a condensation consumer reads next:
    * member count, internal (loop) weight, and cross-SCC in/out weight
    * per component. One pass over the backbone (the union trick: each
    * edge emits a src-keyed and a dst-keyed contribution, one
    * map-side-combinable aggregation), sizes from the |nodes|-row
    * stored map; output is |SCCs|-bounded.
    */
  def sccProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val (edges, _) = transitionGraphStored(spark, sfDir)
    val scc = sccMapStored(spark, sfDir)
    LoopWidth.pinned(spark, storedEdgeRows(spark, sfDir)) {
      val bb = backboneOf(edges)
        .join(broadcast(scc.select(col("node").as("src"),
          col("scc_id").as("s1"))), "src")
        .join(broadcast(scc.select(col("node").as("dst"),
          col("scc_id").as("s2"))), "dst")
      val cross = col("s1") =!= col("s2")
      val flows = bb.select(col("s1").as("scc_id"),
          when(!cross, col("weight")).otherwise(lit(0L)).as("iw"),
          when(cross, col("weight")).otherwise(lit(0L)).as("ow"),
          lit(0L).as("inw"))
        .unionByName(bb.select(col("s2").as("scc_id"), lit(0L).as("iw"),
          lit(0L).as("ow"),
          when(cross, col("weight")).otherwise(lit(0L)).as("inw")))
        .groupBy("scc_id")
        .agg(sum("iw").as("internal_weight"), sum("inw").as("in_weight"),
          sum("ow").as("out_weight"))
      scc.groupBy("scc_id").agg(count(lit(1)).as("scc_size"))
        .join(flows, Seq("scc_id"), "left")
        .select(col("scc_id"), col("scc_size"),
          coalesce(col("internal_weight"), lit(0L)).as("internal_weight"),
          coalesce(col("in_weight"), lit(0L)).as("in_weight"),
          coalesce(col("out_weight"), lit(0L)).as("out_weight"))
        .orderBy("scc_id")
    }
  }

  private[graft] def sccArtifactPath(
      spark: SparkSession,
      sfDir: String): String =
    IO.contentKeyedArtifactPath(spark, s"$sfDir/events.parquet", "props",
      "sccmap", s"scc_v1|$sfDir|backbone2")

  /** The (node, scc_id) map as a persisted artifact — built by the
    * FW-BW loop once per corpus version, re-read for pennies by every
    * consumer (condensation, per-SCC rollups).
    */
  private[graft] def sccMapStored(
      spark: SparkSession,
      sfDir: String): DataFrame = {
    val path = sccArtifactPath(spark, sfDir)
    IO.servedArtifact(spark, s"$path/map", SccMapSchema) {
      sccComponents(spark, sfDir).select("node", "scc_id")
        .write.mode("overwrite").parquet(s"$path/map")
      ()
    }
  }

  /** The DOMINANT-TRANSITION BACKBONE: each node's `k` strongest
    * out-edges (weight desc, dst asc — deterministic under count ties).
    * The raw transition graph of a large event log is trivially one
    * giant SCC (every popular item eventually reaches every other);
    * browsing STRUCTURE lives in the dominant outflows, and the
    * backbone is where SCC/condensation analysis is informative. It is
    * also the scale contract: the rn≤k cut is the TopKPerKey two-phase
    * rewrite, so the backbone is ≤ k·|nodes| rows no matter the event
    * volume — every loop frame downstream is node-bounded.
    */
  private[graft] def backboneOf(edges: DataFrame, k: Int = 2): DataFrame = {
    val w = Window.partitionBy("src").orderBy(desc("weight"), asc("dst"))
    edges.select("src", "dst", "weight")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("src", "dst", "weight")
  }

  /** FW-BW splitting over explicit (src, dst) distinct directed edges —
    * the synthetic-graph test seam. Label frames are |nodes|-row and
    * broadcast onto the edge side below [[BroadcastNodeCeiling]] (the
    * PageRank rank-vector convention — edges never shuffle inside the
    * loop); past it the joins run unhinted on the co-partitioned frames.
    */
  private[graft] def sccOver(
      edges0: DataFrame,
      nodes0: DataFrame,
      maxSweeps: Int = 0,
      strict: Boolean = true,
      preMaterialized: Boolean = false): DataFrame = {
    // preMaterialized: the caller already checkpointed both frames (the
    // build/loop telemetry split) — re-checkpointing would copy blocks.
    // The local wraps are LAZY: the count below materializes nodes, the
    // first sweep's e2 job materializes edges — no standalone roundtrips
    val edges = if (preMaterialized) edges0
      else edges0.localCheckpoint(eager = false)
    val nodes = if (preMaterialized) nodes0
      else nodes0.localCheckpoint(eager = false)
    val nNodes = nodes.count()
    // Sweep/round budgets SCALE with the graph instead of being magic
    // constants (ADVICE r11): FW-BW sweep depth follows the SCC-DAG
    // structure and the inner fixpoint is O(log diameter) with two
    // pointer-jump levels, so a log2(n) term covers any real corpus
    // (log2(10^12) ≈ 40) while keeping small graphs tightly bounded.
    // Callers can still widen explicitly via maxSweeps.
    val log2n = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nNodes))
    val sweepCap = if (maxSweeps > 0) maxSweeps else 20 + log2n
    val bcast = nNodes <= BroadcastNodeCeiling
    def bc(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    // LAZY: the first sweep's e2 broadcasts materialize it — the init
    // frame is a trivial projection over the (checkpointed) nodes, so
    // the per-consumer recompute before the cache fills is free and the
    // standalone materialization roundtrip is not paid
    var lab = nodes.select(col("node"), lit(0L).as("f"), lit(0L).as("b"))
      .localCheckpoint(eager = false)
    var sweeps = 0
    var done = false
    var openCnt = 0L
    // action telemetry: every driver roundtrip the loop pays, in the
    // currency the local-mode floor is measured in (~200 ms/action) —
    // emitted via lastSccActions so the bench payload shows whether a
    // slow scc row is data or roundtrip-bound
    var actions = 1 // nodes count (the lazy wraps ride later jobs)
    // Below the ceiling every per-round plan is broadcast-joins-only —
    // no exchange for AQE to re-plan — yet each round still pays AQE's
    // adaptive wrapper (stage-by-stage re-optimization, one job per
    // materialized stage) ~13×/run on the driver. Turning it off for
    // the loop trades nothing (there is no shuffle to coalesce or skew
    // to split in these plans at ANY scale) for a per-round planning
    // constant; past the ceiling the joins shuffle and AQE stays on.
    val spark0 = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeBefore = spark0.conf.get(aqeKey)
    if (bcast) spark0.conf.set(aqeKey, "false")
    try {
    while (!done && sweeps < sweepCap) {
      // a node with f == b is RESOLVED: f is its SCC's min member
      // (f = b = x proves v ∈ SCC(x) with nothing smaller mutual, and
      // f, b are uniform across an SCC within its class, so whole SCCs
      // resolve atomically). Later sweeps run only over the open
      // remainder — frames shrink with the unresolved frontier, and an
      // open endpoint can never share its (f, b) class with a resolved
      // one (f ≠ b vs f = b), so the within-class join below drops
      // exactly the edges that no longer matter.
      val open = if (sweeps == 0) lab
        else lab.where(col("f") =!= col("b"))
      val e2 = edges
        .join(bc(open.select(col("node").as("src"),
          col("f").as("sf"), col("b").as("sb"))), "src")
        .join(bc(open.select(col("node").as("dst"),
          col("f").as("tf"), col("b").as("tb"))), "dst")
        .where(col("sf") === col("tf") && col("sb") === col("tb"))
        .select("src", "dst")
      // Below the broadcast ceiling e2's checkpoint is LAZY: the
      // fixpoint's round-1 certificate is the job that materializes it
      // (e2 is cached-edges ⋈ two broadcast label projections — cheap
      // map-side work, and the only consumer before the cache fills is
      // that one job). Past the ceiling the joins shuffle, so the eager
      // materialization stays — recomputing a shuffle per consumer
      // would cost more than the roundtrip it saves.
      val e2ck =
        if (bcast) checkpointLazyFreshStats(e2)
        else { actions += 1; checkpointFreshStats(e2) }
      val (refreshed, fbActs, fbOpen) =
        fbFixpoint(e2ck, open.select("node"), bc,
          maxRounds = 25 + log2n)
      actions += fbActs
      lab =
        if (sweeps == 0) refreshed
        else
          // LAZY: both inputs are cached (refreshed by its last
          // certificate, the old lab by its own sweep), so the next
          // consumer's recompute is a filter+union over cached blocks
          checkpointLazyFreshStats(
            lab.where(col("f") === col("b")).unionByName(refreshed))
      // every still-open row lives in the refreshed frame (resolved
      // rows have f = b by construction), so the fixpoint's fused
      // open-count IS lab's — the old standalone isEmpty/count reads
      // (2 actions per run) are gone
      openCnt = fbOpen
      done = openCnt == 0
      sweeps += 1
    }
    } finally {
      if (bcast) spark0.conf.set(aqeKey, aqeBefore)
    }
    // strict (the oracled exact operator): an unconverged run must be a
    // loud failure, never silently-wrong scc_ids flowing into rollups.
    // Non-strict (exploratory/huge-corpus callers): degrade instead of
    // crash — unresolved nodes keep their current (f, b) REFINEMENT
    // class as a provisional component id (classes only ever split
    // toward true SCCs, so provisional groups are unions of real SCCs,
    // an over-grouping never a mis-mixing across resolved components),
    // and the remainder count is exposed via [[lastSccUnresolved]].
    if (strict)
      require(done,
        s"SCC FW-BW splitting did not converge in $sweepCap sweeps " +
          s"(n=$nNodes); widen maxSweeps or run strict = false")
    else if (!done)
      System.err.println(s"[graft] sccOver: $sweepCap sweeps hit with " +
        "unresolved remainder; emitting provisional (f,b)-class ids")
    lastSccUnresolved = Some(if (done) 0L else openCnt)
    lastSccSweeps = Some(sweeps)
    lastSccActions = Some(actions)
    // provisional ids live in the negative range so they can never
    // collide with a resolved min-member id (node ids are non-negative),
    // and derive INJECTIVELY from the (f,b) class — its min member, the
    // same convention resolved ids use — so two distinct unresolved
    // classes can never merge (a 63-bit hash could, astronomically
    // rarely, and would silently violate the refinement property)
    val labeled =
      if (done) lab.select(col("node"), col("f").as("scc_id"))
      else {
        val prov = lab.where(col("f") =!= col("b"))
          .groupBy("f", "b").agg(min("node").as("prov"))
        lab.join(prov, Seq("f", "b"), "left")
          .select(col("node"),
            when(col("f") === col("b"), col("f"))
              .otherwise(lit(-1L) - col("prov")).as("scc_id"))
      }
    val w = Window.partitionBy("scc_id")
    labeled
      .withColumn("scc_size", count(lit(1)).over(w))
      .orderBy("node")
  }

  /** Joint forward/backward min-label fixpoint along `e`:
    * f(v) = min id with a directed path to v, b(v) = min id v has a
    * directed path to (both including v). The two labels are
    * independent given the edge set, so they advance in LOCKSTEP — one
    * action per round instead of two sequential fixpoints. Each round
    * relaxes one edge hop AND pointer-jumps (f ← f(f(v)), valid because
    * label values are themselves class members whose reach composes
    * transitively), so convergence is O(log diameter) rounds, not
    * O(diameter) — the difference between ~8 and ~40 driver round-trips
    * on a deep cycle, and the standard shortcutting trick from parallel
    * connectivity (Shiloach-Vishkin).
    */
  /** Materialize AND reset stats. `localCheckpoint` carries the child
    * plan's ESTIMATED sizeInBytes into the LogicalRDD leaf; a join loop
    * whose per-round plan joins the state frame k times then
    * checkpoints compounds the estimate to ~S^(k^round) — a BigInt
    * whose bit count grows exponentially with the round number. Past
    * ~15 rounds the optimizer's stats products are million-bit ToomCook
    * multiplies and PLANNING, not execution, dominates wall time
    * (measured: sweep-2 rounds 0.4 → 4 → 17 → 78 s on a 200-edge
    * graph). Rebuilding from the materialized RDD gives a leaf with the
    * session-default size estimate — constant across rounds. The
    * shallow-loop operators (PageRank ≤ 10 rounds, label-prop 3) stay
    * on plain localCheckpoint: their compounding is thousands of bits,
    * harmless — this matters once rounds × joins-per-round is deep.
    */
  private def checkpointFreshStats(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    // fresh leaf over the checkpointed InternalRows — no Row round-trip
    // (the r17 `createDataFrame(ck.rdd, schema)` idiom deserialized and
    // re-encoded every row once per loop round)
    org.apache.spark.sql.GraftSqlBridge.freshStatsFrame(ck)
  }

  /** [[checkpointFreshStats]] with a LAZY checkpoint: the caller's very
    * next action (the fixpoint's 1-row certificate) materializes and
    * persists the blocks inside ITS job, so a loop round pays ONE
    * driver roundtrip instead of two. Measured at sf0.1 (round 13):
    * graph_scc actions 43 → 26, wall 4.7 → 4.5 s — local-mode job
    * scheduling is cheap, so the win here is within noise; the fused
    * jobs matter on a real cluster where per-job latency is tens of
    * ms, and the honest action count is now in the bench payload
    * either way. Only safe where an action DOES follow immediately —
    * a lazily checkpointed frame handed to a multi-consumer plan would
    * re-compute its lineage once per consumer racing to persist it.
    */
  private def checkpointLazyFreshStats(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = false)
    org.apache.spark.sql.GraftSqlBridge.freshStatsFrame(ck)
  }

  /** One FW-BW relax+jump round as a PLAN transform — also the
    * plan-audit seam ([[sccStepSeam]]). The label frame is
    * node-bounded, so below the ceiling it broadcasts onto the edge
    * side and the round's only exchanges are the contribution union's
    * per-node min aggregation — edges never shuffle inside the loop
    * (fresh-stats leaves default to "huge", so without the explicit
    * hint every round would pay shuffle joins).
    */
  private[graft] def sccStep(
      e: DataFrame,
      bc: DataFrame => DataFrame)(mdf: DataFrame): DataFrame = {
    // both directions' edge relaxations in ONE exchange: forward
    // contributions arrive keyed by dst, backward by src — union the
    // two map-side-joined halves and take both mins per node in a
    // single aggregation
    val contrib = e
      .join(bc(mdf.select(col("node").as("src"), col("f"))), "src")
      .select(col("dst").as("node"), col("f").as("fc"),
        lit(null).cast("long").as("bc"))
      .unionByName(e
        .join(bc(mdf.select(col("node").as("dst"), col("b"))), "dst")
        .select(col("src").as("node"), lit(null).cast("long").as("fc"),
          col("b").as("bc")))
      .groupBy("node").agg(min("fc").as("fe"), min("bc").as("be"))
    // two chained jump levels: f(f(v)) then f(f(f(v))) — label values
    // compose transitively, so deeper jumps stay valid reachers and
    // cut the round count further for the cost of one more broadcast
    val fJump = mdf.select(col("node").as("fp"), col("f").as("fj"))
    val fJump2 = mdf.select(col("node").as("fp2"), col("f").as("fj2"))
    val bJump = mdf.select(col("node").as("bp"), col("b").as("bj"))
    val bJump2 = mdf.select(col("node").as("bp2"), col("b").as("bj2"))
    mdf
      .join(bc(contrib), Seq("node"), "left")
      .join(bc(fJump), col("f") === col("fp"))
      .join(bc(fJump2), col("fj") === col("fp2"))
      .join(bc(bJump), col("b") === col("bp"))
      .join(bc(bJump2), col("bj") === col("bp2"))
      .select(col("node"),
        least(col("f"), coalesce(col("fe"), col("f")), col("fj2")).as("f"),
        least(col("b"), coalesce(col("be"), col("b")), col("bj2")).as("b"))
  }

  /** The first sweep's first round step over the stored backbone with
    * identity labels, UN-materialized — the plan-audit seam: asserts
    * run against exactly the per-round plan the loop executes.
    */
  private[graft] def sccStepSeam(
      spark: SparkSession,
      sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    val bb = checkpointFreshStats(backboneOf(edges).select("src", "dst"))
    val m = checkpointFreshStats(nodes.select(col("node"),
      col("node").as("f"), col("node").as("b")))
    sccStep(bb, broadcast)(m)
  }

  /** Returns the converged label frame, the number of Spark ACTIONS it
    * ran (the driver-roundtrip currency the sweep telemetry reports),
    * and the final count of OPEN (f ≠ b) rows — ridden on the same
    * 1-row certificate aggregate so the caller's convergence check and
    * unresolved-remainder telemetry cost zero extra actions.
    */
  private def fbFixpoint(
      e: DataFrame,
      nodes: DataFrame,
      bc: DataFrame => DataFrame,
      maxRounds: Int = 25): (DataFrame, Int, Long) = {
    val step = sccStep(e, bc) _
    // convergence certificate: labels are per-element monotone
    // NON-INCREASING, so (Σf, Σb) as exact DECIMAL(38) sums — no long
    // overflow at billions of nodes × 2⁶³ ids — strictly decreases
    // until the fixpoint; an unchanged pair across a round proves no
    // element moved. One 1-row aggregate per round instead of a
    // change-detection join; the open-row count rides the same row, and
    // so does Σnode (see the round-1 fusion below).
    def certificate(mdf: DataFrame)
        : (java.math.BigDecimal, java.math.BigDecimal, Long,
           java.math.BigDecimal) = {
      val r = mdf.agg(
        sum(col("f").cast("decimal(38,0)")).as("sf"),
        sum(col("b").cast("decimal(38,0)")).as("sb"),
        sum(when(col("f") =!= col("b"), 1L).otherwise(0L)).as("open"),
        sum(col("node").cast("decimal(38,0)")).as("sn"))
        .collect()(0)
      (r.getDecimal(0), r.getDecimal(1),
        if (r.isNullAt(2)) 0L else r.getLong(2), r.getDecimal(3))
    }
    var actions = 0
    // LAZY checkpoints: the certificate that follows each is the action
    // that materializes it — one roundtrip per round, not two
    var m = checkpointLazyFreshStats(
      nodes.select(col("node"), col("node").as("f"), col("node").as("b")))
    // The INITIAL certificate is known analytically — m0 has f = b =
    // node, so (Σf, Σb) = (Σnode, Σnode) — and step preserves the node
    // set, so Σnode read off round 1's certificate equals m0's. The old
    // standalone init-certificate action (one extra driver roundtrip
    // per sweep) is gone; round 1 compares against the analytic pair.
    var cert: (java.math.BigDecimal, java.math.BigDecimal) = null
    var openCnt = 0L
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      m = checkpointLazyFreshStats(step(m))
      val next = certificate(m)
      actions += 1
      val prev = if (rounds == 0) (next._4, next._4) else cert
      changed = (next._1, next._2) != prev
      cert = (next._1, next._2)
      openCnt = next._3
      rounds += 1
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        println(s"[scc] fb round $rounds changed=$changed " +
          s"at ${System.nanoTime() / 1000000}ms")
    }
    require(!changed,
      s"SCC min propagation did not converge in $maxRounds rounds")
    (m, actions, openCnt)
  }

  /** Sweeps of the most recent [[sccOver]] — the convergence-bound
    * telemetry seam specs read. */
  @volatile private[graft] var lastSccSweeps: Option[Int] = None

  /** Unresolved-node count of the most recent [[sccOver]] — 0 on every
    * converged (strict-eligible) run; > 0 only when a non-strict run
    * hit its sweep budget and emitted provisional class ids. */
  @volatile private[graft] var lastSccUnresolved: Option[Long] = None

  /** Spark-action count of the most recent [[sccOver]] — the
    * driver-roundtrip currency of the loop floor (~200 ms/action in
    * local mode). Emitted next to scc_sweeps in the bench payload so a
    * slow scc row is attributable to data or to roundtrips by reading
    * the artifact alone. */
  @volatile private[graft] var lastSccActions: Option[Int] = None

  /** First round's pre-argmax vote aggregation in FORCED join-loop mode —
    * plan-audit seam (per-round checkpoints hide iteration plans from
    * the returned label frame).
    */
  private[graft] def labelPropJoinLoopRoundSeam(
      spark: SparkSession,
      sfDir: String): DataFrame = {
    val (edges, nodes) = transitionGraphStored(spark, sfDir)
    val und = pinnedPartitioned(
      edges.select(col("src").as("u"), col("dst").as("v"), col("weight"))
        .unionByName(
          edges.select(col("dst").as("u"), col("src").as("v"), col("weight")))
        .groupBy("u", "v").agg(sum("weight").as("w")), "v")
    val labels = nodes.withColumn("l", col("node")).localCheckpoint()
    und.join(labels.select(col("node").as("v"), col("l")).hint("shuffle_hash"),
        Seq("v"))
      .groupBy(col("u"), col("l")).agg(sum("w").as("sw"))
  }
}

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

  private def items(spark: SparkSession, sfDir: String): DataFrame =
    IO.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))

  /** The weighted transition edge list: (src, dst, weight) over
    * consecutive same-user events, self-loops dropped. This IS the graph
    * artifact — build once, iterate many.
    */
  def transitionEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
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
    val edges = transitionEdges(spark, sfDir)
      .select("src", "dst", "weight")
    val nodes = items(spark, sfDir)
      .select(col("item").as("node")).distinct()
      .localCheckpoint()
    val outw = edges.groupBy(col("src"))
      .agg(sum("weight").cast("double").as("outw"))
    // edge side enriched with its src's total out-weight once, before
    // the loop — w/outw is then a per-edge constant across iterations
    val enriched = edges
      .join(outw, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("outw")).as("share"))
      .localCheckpoint()
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("r", lit(1.0) / lit(n)).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = enriched
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("dst"),
          round((col("r") * col("share")).cast("float") * lit(1000000000.0), 0)
            .cast("long").as("cfix"))
        .groupBy("dst")
        .agg(sum("cfix").as("sfix"))
      // dangling mass: ranks of nodes with no out-edges, as exact fix-point
      val dangRow = ranks
        .join(outw.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
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
    ranks.select(col("node"), col("r").as("pr")).orderBy("node")
  }
}

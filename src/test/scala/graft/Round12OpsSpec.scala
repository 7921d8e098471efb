package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

/** Behavior specs for the round-12 hardening: SCC budget scaling and
  * degraded (non-strict) mode, and the sorted_contains element-type
  * guard.
  */
class Round12OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("sccOver non-strict: sweep-budget hit degrades, never crashes") {
    // a 6-cycle takes a few relax+jump rounds; maxSweeps = 1 with the
    // inner fixpoint intact converges, so starve the OUTER loop on a
    // graph with two chained cycles (needs >= 2 sweeps to split)
    val edges = Seq(
      1L -> 2L, 2L -> 3L, 3L -> 1L, // scc {1,2,3}
      3L -> 4L,                     // bridge
      4L -> 5L, 5L -> 6L, 6L -> 4L  // scc {4,5,6}
    ).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("node")
    // strict default converges and resolves exactly the two SCCs
    val full = LinkGraph.sccOver(edges, nodes).localCheckpoint()
    assert(LinkGraph.lastSccUnresolved.contains(0L))
    assert(full.select("scc_id").distinct().count() == 2)
    // strict with an impossible budget must be a LOUD failure
    intercept[IllegalArgumentException] {
      // maxSweeps = 1 cannot finish: sweep 1 resolves classes only
      // after the within-class restriction of sweep 2
      val tiny = LinkGraph.sccOver(edges, nodes, maxSweeps = 1)
      tiny.collect()
    }
    // non-strict with the same budget degrades: every node still gets
    // an id, provisional ids are negative (disjoint from resolved
    // min-member ids), and the telemetry reports the remainder
    val deg = LinkGraph.sccOver(edges, nodes, maxSweeps = 1,
      strict = false).localCheckpoint()
    assert(deg.count() == 6, "every node must be labeled even degraded")
    val unresolved = LinkGraph.lastSccUnresolved.get
    assert(unresolved > 0, "the starved run must report its remainder")
    assert(deg.filter(col("scc_id") < 0).count() == unresolved,
      "provisional ids must be negative and count the unresolved nodes")
    // provisional classes are REFINEMENTS: they may over-group real
    // SCCs but never split one — nodes of one true SCC that remain
    // unresolved share a class, so the provisional partition has at
    // most as many groups as true SCCs among the unresolved
    val trueIds = full.select(col("node"), col("scc_id").as("true_id"))
    val mixed = deg.filter(col("scc_id") < 0).join(trueIds, "node")
      .groupBy("true_id").agg(countDistinct("scc_id").as("k"))
      .filter(col("k") > 1)
    assert(mixed.isEmpty,
      "a true SCC must never be split across provisional classes")
  }

  test("sccOver: sweep budget scales with node count") {
    // the production entry still converges and reports clean telemetry
    val scc = LinkGraph.sccComponents(spark, Sf)
    assert(scc.count() > 0)
    assert(LinkGraph.lastSccUnresolved.contains(0L),
      "the oracled corpus run must fully resolve")
  }

  test("adaptive IVF geometry: the sizing rule is pinned") {
    import graft.operators.Similarity
    // nlist = max(16, ceil(sqrt(N))): floor of 16 below 256 vectors,
    // sqrt growth above — the FAISS sizing rule the oracles replay via
    // GREATEST(16, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))
    assert(Similarity.adaptiveNlist(0L) == 16)
    assert(Similarity.adaptiveNlist(256L) == 16)
    assert(Similarity.adaptiveNlist(500L) == 23)   // sf0.01 embeddings
    assert(Similarity.adaptiveNlist(2000L) == 45)  // sf0.1 embeddings
    assert(Similarity.adaptiveNlist(20000L) == 142) // the x10 probe cut
    assert(Similarity.adaptiveNlist(1000000L) == 1000)
    // nprobe = max(4, nlist/8): the probed fraction shrinks ~1/sqrt(N),
    // which is what turns the fixed-nlist N^2/16 candidate volume into
    // ~N^1.5 (round-12 x10 measurement: 22.4 s -> 10.6 s at HIGHER
    // recall vs the exact margin baseline)
    assert(Similarity.adaptiveNprobe(16) == 4)
    assert(Similarity.adaptiveNprobe(45) == 5)
    assert(Similarity.adaptiveNprobe(142) == 17)
    assert(Similarity.adaptiveNprobe(1000) == 125)
  }

  test("sorted_contains: rejects nullable-element arrays at analysis") {
    // the producers emit array_sort(collect_set(...)) over non-null
    // hashes => containsNull = false; a nullable-element array would
    // make the binary search undefined and must fail FAST
    val ok = Seq((Array(1L, 5L, 9L), 5L)).toDF("arr", "v")
      .select(expr("sorted_contains(arr, v)").as("hit"))
    assert(ok.head().getBoolean(0))
    val nullable = Seq((Seq(Option(1L), None), 1L)).toDF("arr", "v")
    val e = intercept[AnalysisException] {
      nullable.select(expr("sorted_contains(arr, v)")).collect()
    }
    assert(e.getMessage.contains("sorted_contains"),
      s"analysis error must name the function: ${e.getMessage}")
  }
}

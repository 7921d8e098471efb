package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Snapshot}

/** Behavior specs for snapshot maintenance (CDC diff, latest-wins upsert)
  * and the semantic-dedup / random-projection embedding operators.
  */
class SnapshotSpec extends SparkTestBase {

  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update and skips unchanged") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (5L, null.asInstanceOf[String], 50.0)).toDF("k", "s", "p")
    val next = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0),
      (5L, "e", 50.0)).toDF("k", "s", "p")
    val got = Snapshot.snapshotDiff(prev, next, "k", Seq("s", "p"))
      .select("k", "op").as[(Long, String)].collect().toMap
    // 1 vanished, 2 unchanged (absent), 3 price changed, 4 appeared,
    // 5 null -> value must read as update (null-safe compare)
    assert(got == Map(1L -> "delete", 3L -> "update", 4L -> "insert",
      5L -> "update"))
  }

  test("upsertLatest: highest version wins; updates beat base on a tie") {
    val base = Seq((1L, 10L, "base-old", 100L), (1L, 20L, "base-new", 101L),
      (2L, 10L, "base-only", 200L)).toDF("k", "ver", "payload", "tb")
    val updates = Seq((1L, 20L, "upd-tie", 102L), (3L, 5L, "upd-only", 300L))
      .toDF("k", "ver", "payload", "tb")
    val got = Snapshot.upsertLatest(base, updates, "k", "ver", "tb")
      .select("k", "payload").as[(Long, String)].collect().toMap
    // key 1: version tie at 20 -> the update row wins over base
    assert(got == Map(1L -> "upd-tie", 2L -> "base-only", 3L -> "upd-only"))
    assert(Snapshot.upsertLatest(base, updates, "k", "ver", "tb").count() == 3)
  }

  test("applyDiff(prev, diff(prev, next)) reconstructs next exactly") {
    // in-memory case incl. null transitions
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (5L, null.asInstanceOf[String], 50.0)).toDF("k", "s", "p")
    val next = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0),
      (5L, "e", 50.0)).toDF("k", "s", "p")
    val rebuilt = Snapshot.applyDiff(prev,
      Snapshot.snapshotDiff(prev, next, "k", Seq("s", "p")), "k", Seq("s", "p"))
    assert(rebuilt.unionByName(next).distinct().count() == next.count()
      && rebuilt.count() == next.count(),
      "apply ∘ diff must be the identity (multiset equality)")
    // and on the derived orders snapshots at test scale
    val op = Snapshot.ordersPrev(spark, Sf)
    val on = Snapshot.ordersNext(spark, Sf)
    val rebuiltOrders = Snapshot.applyDiff(op,
      Snapshot.snapshotDiff(op, on, "o_orderkey",
        Seq("o_orderstatus", "o_totalprice")),
      "o_orderkey", Seq("o_orderstatus", "o_totalprice"))
    assert(rebuiltOrders.exceptAll(on).isEmpty && on.exceptAll(rebuiltOrders).isEmpty)
  }

  test("orders CDC diff emits churn only, never unchanged keys") {
    val d = Snapshot.ordersSnapshotDiff(spark, Sf).cache()
    val ops = d.groupBy("op").count().as[(String, Long)].collect().toMap
    assert(ops.keySet == Set("insert", "delete", "update"))
    // inserts are exactly the %10==3 stripe; deletes exactly %10==7
    assert(d.filter(col("op") === "insert")
      .filter(col("o_orderkey") % 10 =!= 3).count() == 0)
    assert(d.filter(col("op") === "delete")
      .filter(col("o_orderkey") % 10 =!= 7).count() == 0)
    // updates: price stripe only, and the delta is exactly +1.0
    assert(d.filter(col("op") === "update")
      .filter(col("next_o_totalprice") - col("prev_o_totalprice") =!= 1.0)
      .count() == 0)
    d.unpersist()
  }

  test("semDedup: one decision per vector, cell minimum always kept") {
    val dec = Similarity.semDedupDecisions(spark, Sf).cache()
    val n = dec.count()
    assert(n == dec.select("vec_id").distinct().count())
    // the smallest vec_id of every cell has no smaller neighbor -> kept
    val cellMins = dec.groupBy("cid").agg(min("vec_id").as("vec_id"))
    assert(dec.join(cellMins, Seq("cid", "vec_id"))
      .filter(!col("keep")).count() == 0)
    // the threshold must actually bite on the test corpus
    assert(dec.filter(!col("keep")).count() > 0)
    dec.unpersist()
  }

  test("projection matrix rows are pairwise distinct and ±1/√k") {
    val m = Similarity.projectionMatrix(16, 64)
    assert(m.size == 16 && m.forall(_.size == 64))
    val scale = 1.0 / math.sqrt(16.0)
    assert(m.flatten.forall(w => w == scale || w == -scale))
    // a degenerate low-bit sign formula collapses rows to ±each other;
    // require genuine diversity
    assert(m.map(_.toVector).distinct.size == 16)
    assert(m.map(_.toVector.map(-_)).toSet.intersect(m.map(_.toVector).toSet).isEmpty)
  }

  test("random projection emits outDims floats per vector") {
    val p = Similarity.randomProjection(spark, Sf, outDims = 16)
    val rows = p.limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Float](1).size == 16))
  }
}

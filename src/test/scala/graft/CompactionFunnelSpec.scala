package graft

import org.apache.spark.sql.functions._

import graft.sources.IO

/** Specs for the small-files compaction sink and the event funnel. */
class CompactionFunnelSpec extends SparkTestBase {

  test("compaction merges small files without a shuffle and keeps content") {
    val src = IO.scratchDir("compact_src")
    val dst = IO.scratchDir("compact_dst")
    val df = spark.read.parquet(s"$Sf/part.parquet")
    df.repartition(16).write.mode("overwrite").parquet(src)
    def dataFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles.toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles(src).size == 16)

    val out = IO.compactParquet(spark, src, dst) // default 128 MB target
    assert(dataFiles(dst).size == 1,
      s"tiny table must compact to one file, saw ${dataFiles(dst).size}")
    // content-neutral: same multiset of rows
    assert(out.count() == df.count())
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)

    // the rewrite plan must be a narrow coalesce: no exchange of any kind
    val rewritePlan = spark.read.parquet(src).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(rewritePlan.contains("Coalesce") && !rewritePlan.contains("Exchange"),
      s"compaction must not shuffle:\n$rewritePlan")
  }

  test("compaction sizes output from the listing, splitting above targetBytes") {
    val src = IO.scratchDir("compact_src2")
    val dst = IO.scratchDir("compact_dst2")
    spark.read.parquet(s"$Sf/lineitem.parquet")
      .repartition(8).write.mode("overwrite").parquet(src)
    val totalBytes = new java.io.File(src).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length).sum
    // target = ~half the data -> exactly 2 output files
    IO.compactParquet(spark, src, dst, targetBytes = totalBytes / 2 + 1)
    val outFiles = new java.io.File(dst).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(outFiles.length == 2, s"expected 2 files, saw ${outFiles.length}")
  }

  test("funnel stages are monotone and match a driver-side replay") {
    val row = graft.streaming.EventStream.funnelSummary(spark, Sf).head()
    val (nv, nc, np) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nv >= nc && nc >= np && nv > 0, s"monotone funnel: $nv $nc $np")

    // driver-side replay at µs resolution
    val raw = spark.read.parquet(s"$Sf/events.parquet")
    val events = raw
      .select(col("user_id"), col("event_type"),
        graft.operators.EventTime.tsUs(raw).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    var (v, c, p) = (0L, 0L, 0L)
    byUser.foreach { case (_, es) =>
      val tView = es.filter(_._2 == "view").map(_._3).sorted.headOption
      val tClick = tView.flatMap(tv =>
        es.filter(e => e._2 == "click" && e._3 > tv).map(_._3).sorted.headOption)
      val tBuy = tClick.flatMap(tc =>
        es.filter(e => e._2 == "purchase" && e._3 > tc).map(_._3).sorted.headOption)
      if (tView.isDefined) v += 1
      if (tClick.isDefined) c += 1
      if (tBuy.isDefined) p += 1
    }
    assert((nv, nc, np) == ((v, c, p)), s"got ($nv,$nc,$np) want ($v,$c,$p)")
  }
}

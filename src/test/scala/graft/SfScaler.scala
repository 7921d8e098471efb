package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the sf0.1 testdata cut ×10 into an sf1 probe cut (scratch main,
  * test scope — never ships). Ten shifted copies per table:
  *
  *   - id-ish keys shift by copy·OFFSET, FK pairs share their offset so
  *     join fan-outs stay exactly sf0.1's per copy;
  *   - documents text gets a per-copy Caesar shift (translate over
  *     [a-z]), so cross-copy token sets are disjoint — duplicate /
  *     near-dup / contamination structure replicates PER COPY (mass
  *     ×10, linear) instead of exploding ×100 as identical copies
  *     would. n_chars is length-preserving under translate. Offsets are
  *     multiples of 10 so the %10 incremental carve replicates too;
  *   - events keep their item vocabulary (props untouched): the click
  *     graph gains ×10 edge weight, not ×10 nodes — the denser-graph
  *     regime; users/events shift so per-user session volume is
  *     unchanged.
  *
  * Usage: Test/runMain graft.SfScaler /root/testdata/sf0.1 /tmp/sf1 [copies]
  *
  * copies > 26 (e.g. the x100 sf10 cut) switch the per-copy text
  * transform from a Caesar shift to a SEEDED ALPHABET PERMUTATION
  * (26! >> copies): still length-preserving and injective per copy, so
  * within-copy duplicate/near-dup structure replicates exactly while
  * cross-copy token images stay (almost surely) disjoint.
  */
object SfScaler {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.build("sf-scaler")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def caesar(i: Int): String =
      if (i < 26) alpha.drop(i) + alpha.take(i)
      else new scala.util.Random(i.toLong).shuffle(alpha.toList).mkString

    def copyUnion(table: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies)
        .map(i => xform(base, i))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[sfscaler] $table x$copies")
    }

    copyUnion("documents") { (df, i) =>
      df.select(
        (col("doc_id") + lit(i * 100000L)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha, caesar(i))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copyUnion("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 100000L))
    }
    copyUnion("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }
    copyUnion("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L))
    }
    copyUnion("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
    }
    copyUnion("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L))
    }
    copyUnion("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * 10000000L))
    }
    copyUnion("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * 10000000L))
    }
    // pure dims: one copy
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[sfscaler] $t x1")
    }
    spark.stop()
  }
}

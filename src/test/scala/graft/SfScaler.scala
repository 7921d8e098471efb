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
  * Usage: Test/runMain graft.SfScaler /root/testdata/sf0.1 /tmp/sf1 [copies] [mode]
  *
  * copies > 26 (e.g. the x100 sf10 cut) switch the per-copy text
  * transform from a Caesar shift to a SEEDED ALPHABET DERANGEMENT
  * (rejection-sampled: no fixed points, not equal to any Caesar
  * rotation), so cross-copy letter images are disjoint by construction,
  * not almost-surely. Digits rotate by a per-copy non-zero shift for the
  * same reason. Punctuation-only tokens remain invariant across the
  * translate modes — cross-copy leakage through them is possible in
  * principle; the testdata generator emits none, and the `fixedmass`
  * mode below is immune entirely.
  *
  * mode `fixedmass` (the constant-OUTPUT probe): copy 0 stays verbatim;
  * every other copy suffixes EVERY whitespace token with its (shifted)
  * doc_id, making all transformed documents pairwise token-disjoint —
  * and disjoint from the originals. Exact/near-dup/winnow/contamination
  * TEXT-overlap mass is then exactly the source cut's (copy 0's own),
  * while corpus volume scales ×copies: the probe that separates "output
  * went up because dup mass is linear by construction" from "the
  * scan/banding side itself is super-linear". Token counts per doc are
  * preserved; n_chars is recomputed (the suffix is not
  * length-preserving); embedding-space overlap is NOT pinned by this
  * mode (embeddings replicate as usual).
  */
object SfScaler {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val fixedMass = args.lift(3).contains("fixedmass")
    val spark = GraftSession.build("sf-scaler")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    val rotations = (0 until 26).map(s => alpha.drop(s) + alpha.take(s)).toSet
    def caesar(i: Int): String =
      if (i < 26) alpha.drop(i) + alpha.take(i)
      else {
        // derange: reject permutations with any fixed point or equal to
        // a Caesar rotation, so cross-copy collisions are impossible
        // rather than merely improbable (attempt bumps the seed)
        Iterator.from(0)
          .map(a => new scala.util.Random(i.toLong * 1009L + a)
            .shuffle(alpha.toList).mkString)
          .find(p => !p.zip(alpha).exists { case (x, y) => x == y }
            && !rotations(p))
          .get
      }
    // non-zero digit rotation per copy: digit-bearing tokens must not
    // survive a copy transform verbatim either
    def digitShift(i: Int): String = {
      val s = 1 + ((i - 1) % 9)
      digits.drop(s) + digits.take(s)
    }

    def copyUnion(table: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies)
        .map(i => xform(base, i))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[sfscaler] $table x$copies" + (if (fixedMass) " (fixedmass)" else ""))
    }

    copyUnion("documents") { (df, i) =>
      val newId = (col("doc_id") + lit(i * 100000L)).as("doc_id")
      if (i == 0)
        df.select(newId, col("text"), col("lang"), col("source"), col("n_chars"))
      else if (fixedMass) {
        // suffix every token with the shifted doc id: token images of
        // distinct documents are DISJOINT, so copies contribute zero
        // exact/near-dup/contamination mass — output stays copy 0's
        val tagged = regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), (col("doc_id") + lit(i * 100000L)).cast("string")))
        df.select(newId, tagged.as("text"), col("lang"), col("source"),
          length(tagged).cast("long").as("n_chars"))
      } else
        df.select(newId,
          translate(col("text"), alpha + digits, caesar(i) + digitShift(i))
            .as("text"),
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

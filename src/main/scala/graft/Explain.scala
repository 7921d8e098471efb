package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture dev tool (optimization rounds): dump `explain("formatted")`
  * for named registry queries to files, so plan claims in OPTIMIZATION_rNN.md
  * are checkable without running Spark.
  *
  *   runMain graft.Explain <outDir> [query ...]
  *
  * With no query names, dumps every registered query. Reads the data
  * directory from SPARK_GRAFT_SF_DIR like Bench. Not part of the driver
  * contract — Bench/Verify are unchanged.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("plans/out"))
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-explain")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(mode)
        Files.writeString(outDir.resolve(s"$n.txt"), txt)
        println(s"[explain] wrote $n")
      } catch {
        case e: Throwable =>
          Files.writeString(outDir.resolve(s"$n.ERROR.txt"),
            s"${e.getClass.getName}: ${e.getMessage}")
          println(s"[explain] ERROR $n: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}

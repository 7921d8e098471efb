package graft

import org.apache.spark.sql.functions._

/** Scratch timing harness for the SCC FW-BW loop (not a test — a main
  * invoked manually while profiling; kept out of src/main so it never
  * ships).
  */
object SccTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("scc-timer")
    import graft.operators.LinkGraph
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val scc = time("scc_components") {
      val df = LinkGraph.sccComponents(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      df
    }
    println(s"sweeps: ${LinkGraph.lastSccSweeps}")
    time("scc_condensation") {
      LinkGraph.sccCondensation(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

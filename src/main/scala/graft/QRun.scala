package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query against a data dir.
  * Usage: runMain graft.QRun <query_name> <sfDir> [explain]
  * Prints QRUN_ROWS / QRUN_SECS (or QRUN_FAIL) markers for scripting. */
object QRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doExplain = args.contains("explain")
    val spark = GraftSession.get("graft-qrun")
    val t0 = System.nanoTime()
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (doExplain) df.explain("formatted")
      println(s"QRUN_ROWS=${df.count()}")
    } catch {
      case e: Throwable =>
        println(s"QRUN_FAIL=${e.toString.take(600)}")
    }
    println(s"QRUN_SECS=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}

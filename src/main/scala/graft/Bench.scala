package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and emits one JSON line of per-query seconds.
  * A short warmup (table scans + one tiny aggregate) pays the JVM/codegen
  * and parquet-footer costs once so per-query numbers measure the plans,
  * not first-touch effects. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: touch every table, run one shuffle+codegen pipeline
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.tableNormalized(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val failedPart =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$failedPart}""")
    spark.stop()
  }
}

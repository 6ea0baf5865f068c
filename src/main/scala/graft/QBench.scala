package graft

/** Dev utility: warmed per-query timing for a list of queries.
  * Usage: runMain graft.QBench <sfDir> <query...>  (each query runs
  * twice; the second, warmed time is the one to compare — cold runs on a
  * shared host carry JIT + page-cache + contention noise). */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-qbench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.tableNormalized(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    args.tail.foreach { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        s
      }
      println(f"QBENCH $name cold=${times.head}%.2f warm=${times.last}%.2f")
    }
    spark.stop()
  }
}

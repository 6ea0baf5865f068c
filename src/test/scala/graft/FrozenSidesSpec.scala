package graft

import graft.streaming.FrozenSides

/** FrozenSides identity + lifecycle contracts (VERDICT r11 #5, ADVICE
  * r11 low): a plain-parquet model refit landing inside the same mtime
  * granularity tick must still invalidate, and a displaced generation's
  * DataFrames must survive one further invalidation before unpersist
  * (a concurrent stream sharing the path key may be mid-batch on them). */
class FrozenSidesSpec extends SparkSpec {

  private def writeModel(dir: String, rows: Seq[(Int, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("i", "w").coalesce(1).write.mode("overwrite").parquet(dir)
  }

  test("a refit with the directory mtime pinned to the old tick still invalidates") {
    FrozenSides.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_frz").toString + "/model"
    writeModel(dir, Seq((0, 1.0), (1, 2.0)))
    val p = java.nio.file.Paths.get(dir)
    val t0 = java.nio.file.Files.getLastModifiedTime(p)
    val first = FrozenSides.parquetTable(spark, dir).collect().map(_.getDouble(1)).sorted
    assert(first.toSeq == Seq(1.0, 2.0))
    // rewrite with different content, then pin the DIR mtime back — the
    // 1-second-granularity-filesystem scenario where a bare-mtime
    // identity absorbs the refit invisibly
    writeModel(dir, Seq((0, 9.0), (1, 8.0), (2, 7.0)))
    java.nio.file.Files.setLastModifiedTime(p, t0)
    val second = FrozenSides.parquetTable(spark, dir).collect().map(_.getDouble(1)).sorted
    assert(second.toSeq == Seq(7.0, 8.0, 9.0),
      s"pinned-mtime refit was absorbed: served ${second.toSeq}")
  }

  test("a displaced generation stays readable; fresh generations never alias to it") {
    FrozenSides.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_frz2").toString + "/model"
    writeModel(dir, Seq((0, 1.0)))
    val gen1 = FrozenSides.parquetTable(spark, dir)
    assert(gen1.collect().head.getDouble(1) == 1.0)
    writeModel(dir, Seq((0, 2.0)))
    val gen2 = FrozenSides.parquetTable(spark, dir)
    // the fresh generation must serve the NEW content — a persist-based
    // cache aliases the identical read plan to the old generation's
    // blocks (Spark's CacheManager matches on plan identity), which is
    // exactly the stale-serve the localCheckpoint design prevents
    assert(gen2.collect().head.getDouble(1) == 2.0,
      "fresh generation aliased to the displaced one")
    // and a concurrent batch still holding gen1 keeps reading the OLD
    // snapshot (never yanked mid-read, never recomputed against files
    // the producer may have deleted)
    assert(gen1.collect().head.getDouble(1) == 1.0,
      "displaced generation must stay readable for in-flight batches")
    FrozenSides.clear()
  }
}

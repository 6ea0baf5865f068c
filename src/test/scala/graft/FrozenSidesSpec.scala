package graft

import graft.streaming.FrozenSides
import org.apache.spark.storage.StorageLevel

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

  test("displaced generation stays persisted for one further invalidation, then unpersists") {
    FrozenSides.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_frz2").toString + "/model"
    writeModel(dir, Seq((0, 1.0)))
    val gen1 = FrozenSides.parquetTable(spark, dir)
    assert(gen1.storageLevel != StorageLevel.NONE, "fresh generation must be persisted")
    writeModel(dir, Seq((0, 2.0)))
    val gen2 = FrozenSides.parquetTable(spark, dir)
    assert(gen2.collect().head.getDouble(1) == 2.0)
    // gen1 was displaced but a concurrent batch may still be on it:
    // it must NOT be unpersisted yet
    assert(gen1.storageLevel != StorageLevel.NONE,
      "immediately-displaced generation must stay persisted one more round")
    writeModel(dir, Seq((0, 3.0)))
    val gen3 = FrozenSides.parquetTable(spark, dir)
    assert(gen3.collect().head.getDouble(1) == 3.0)
    assert(gen1.storageLevel == StorageLevel.NONE,
      "generation displaced two invalidations ago must be unpersisted")
    FrozenSides.clear()
  }
}

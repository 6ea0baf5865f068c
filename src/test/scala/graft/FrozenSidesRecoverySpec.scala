package graft

import graft.streaming.FrozenSides

/** Lost-checkpoint-block recovery (ADVICE r12): FrozenSides generations
  * are executor-local checkpoint blocks with no lineage. An executor
  * loss makes a cached generation unrecoverable, and since the artifact
  * identity is unchanged the poisoned entry would be served to — and
  * fail — every later micro-batch until restart. [[FrozenSides.recovering]]
  * catches the lost-block failure, evicts the artifact's entries and
  * retries once against a fresh read. Block loss is simulated by
  * unpersisting the checkpoint RDD out from under the cached entry —
  * the same state an executor death leaves behind in cluster mode. */
class FrozenSidesRecoverySpec extends SparkSpec {

  test("a lost checkpoint block evicts the cached generation and the retry re-reads") {
    FrozenSides.clear()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_frozen_rec").toString + "/model"
    (0 until 10).map(i => (i.toLong, i * 2.0)).toDF("bucket", "w")
      .write.parquet(dir)

    val df = FrozenSides.parquetTable(spark, dir)
    assert(df.count() == 10)

    // poison: drop the checkpoint blocks out from under the cached entry
    val rdd = df.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.getOrElse(fail("cached generation must be a localCheckpoint LogicalRDD"))
    rdd.unpersist(blocking = true)

    // an unwrapped batch fails with the lost-block signature — and keeps
    // failing, because the artifact identity is unchanged
    val e = intercept[Exception] { FrozenSides.parquetTable(spark, dir).count() }
    assert(FrozenSides.isLostBlock(e), s"expected a lost-block failure, got: $e")
    val e2 = intercept[Exception] { FrozenSides.parquetTable(spark, dir).count() }
    assert(FrozenSides.isLostBlock(e2), "the poisoned entry is served again (the wedge)")

    // recovering: evict + one retry → the batch itself succeeds
    val n = FrozenSides.recovering(dir) {
      FrozenSides.parquetTable(spark, dir).count()
    }
    assert(n == 10)
    // and the cache now holds a healthy generation
    assert(FrozenSides.parquetTable(spark, dir).count() == 10)
  }

  test("non-block failures pass through recovering untouched") {
    val e = intercept[IllegalArgumentException] {
      FrozenSides.recovering("/no/such/path") {
        throw new IllegalArgumentException("boom")
      }
    }
    assert(e.getMessage == "boom")
  }
}

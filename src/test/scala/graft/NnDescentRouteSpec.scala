package graft

import graft.ops.PipelineOps4
import org.apache.spark.sql.functions._

/** r15 size-routed NN-Descent: the driver replay must be BIT-identical to
  * the distributed loop — same congruential init, same ρ-sampled reverse
  * neighborhoods (xxhash64 order), same fused cosine fold, same nan-safe
  * (cv DESC, dst ASC) ranking — across the corners where replays diverge
  * when they are wrong: cosine ties (duplicate vectors), NaN cosines
  * (zero vectors), ragged dimensions, non-dense ids (the prefix-sum rid
  * path), and a hub plant (the ρ-sample actually sampling). */
class NnDescentRouteSpec extends SparkSpec {

  private def both(vecs: org.apache.spark.sql.DataFrame, k: Int = 5) = {
    val drv = PipelineOps4.nnDescentGraph(vecs, k, rounds = 2)
      .collect().map(_.toString).toSeq
    val dist = PipelineOps4.nnDescentGraph(vecs, k, rounds = 2,
        driverMaxDoubles = 0L) // force the distributed loop
      .collect().map(_.toString).toSeq
    (drv, dist)
  }

  test("real corpus: driver replay == distributed loop, row for row") {
    val vecs = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (drv, dist) = both(vecs, k = 14)
    assert(drv.nonEmpty)
    assert(drv === dist)
  }

  test("ties, NaN, ragged dims, non-dense ids: routes stay identical") {
    import spark.implicits._
    // ids 10..29 (non-dense → the prefix-sum rid path); vec 17 and 23
    // duplicate vec 11 (cosine ties → the dst tie-break must match);
    // vec 19 is all-zero (NaN cosines — ranked FIRST under Spark's
    // nan-safe DESC, a divergence magnet); vec 21 is shorter (ragged —
    // the fold runs over min length)
    val base = (10L until 30L).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 3.7 + j).abs + 0.1)
      (i, v)
    }.toMap
    val planted = base ++ Map(
      17L -> base(11L), 23L -> base(11L),
      19L -> Array.fill(8)(0.0),
      21L -> base(21L).take(3))
    val vecs = planted.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "v").select(col("vec_id"), col("v").cast("array<double>"))
    val (drv, dist) = both(vecs)
    assert(drv.nonEmpty)
    assert(drv === dist)
  }

  test("hub plant: one vector aliased into many ids — ρ-sample replays identically") {
    import spark.implicits._
    val hub = Array.tabulate(6)(j => 1.0 + j * 0.01)
    val rows = (0L until 24L).map { i =>
      val v = if (i % 3 == 0) hub.clone()
              else Array.tabulate(6)(j => math.cos(i * 1.3 + j) + 2.0)
      (i, v.toSeq)
    }
    val vecs = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>"))
    val (drv, dist) = both(vecs)
    assert(drv === dist)
  }
}

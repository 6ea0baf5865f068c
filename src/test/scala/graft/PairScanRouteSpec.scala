package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** r15 driver routes for the fused all-pairs scans: the local replay of
  * the thresholded pair scan ([[Similarity.cosineNearDupPairs]]) and the
  * all-pairs top-k ([[Similarity.exactKnnEdgesRouted]]) must be
  * row-identical to the distributed forms they replace — including
  * 6-dp HALF_UP rounding at the threshold boundary and nan-safe
  * (cos DESC, nbr ASC) ranking ties. */
class PairScanRouteSpec extends SparkSpec {

  private def corpus = graft.sources.Tables.embeddings(spark, TinyDir)

  test("pair scan: driver replay == distributed fused scan, row for row") {
    val (drv, sDrv) = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.38)
    val (dist, sDist) = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.38,
      driverMaxOps = 0L) // force the distributed route
    assert(sDrv.degenerate && sDist.degenerate, "bench embeddings must route degenerate")
    val a = drv.orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    val b = dist.orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("knn scan: driver replay == distributed all-pairs window, row for row") {
    val (drv, _) = Similarity.exactKnnEdgesRouted(corpus, "vec_id", "embedding", 5)
    val (dist, _) = Similarity.exactKnnEdgesRouted(corpus, "vec_id", "embedding", 5,
      driverMaxOps = 0L)
    val a = drv.orderBy("node", "rnk").collect().map(_.toString).toSeq
    val b = dist.orderBy("node", "rnk").collect().map(_.toString).toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("duplicate vectors (rank ties) and a zero vector: routes stay identical") {
    import spark.implicits._
    // ids 5 and 11 duplicate id 3 (exact cosine ties → nbr tie-break);
    // id 7 is all-zero (nrm = 0 — the filter drops it on BOTH routes)
    val base = (0L until 16L).map { i =>
      (i, Array.tabulate(6)(j => math.sin(i * 2.1 + j) + 1.5).toSeq)
    }.toMap
    val planted = base ++ Map(
      5L -> base(3L), 11L -> base(3L), 7L -> Seq.fill(6)(0.0))
    val df = planted.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val (p1, _) = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.5)
    val (p2, _) = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.5,
      driverMaxOps = 0L)
    assert(p1.orderBy("id_a", "id_b").collect().map(_.toString).toSeq
      === p2.orderBy("id_a", "id_b").collect().map(_.toString).toSeq)
    val (k1, _) = Similarity.exactKnnEdgesRouted(df, "vec_id", "embedding", 4)
    val (k2, _) = Similarity.exactKnnEdgesRouted(df, "vec_id", "embedding", 4,
      driverMaxOps = 0L)
    assert(k1.orderBy("node", "rnk").collect().map(_.toString).toSeq
      === k2.orderBy("node", "rnk").collect().map(_.toString).toSeq)
  }
}

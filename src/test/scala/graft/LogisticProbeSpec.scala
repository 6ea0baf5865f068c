package graft

import graft.ops.PipelineOps3
import org.apache.spark.sql.functions._

/** q_logistic_probe: the distributed IRLS fit must agree with a plain
  * driver-side Newton fit on the same data (same λ, same iteration
  * count), recover a linearly separable synthetic, and be invariant to
  * partitioning up to float-sum wobble. */
class LogisticProbeSpec extends SparkSpec {

  /** Reference fit: textbook Newton/IRLS on driver arrays — no Spark in
    * the loop, independent code path. */
  private def driverFit(xs: Array[Array[Double]], ys: Array[Double],
                        lambda: Double, iters: Int): Array[Double] = {
    val dim = xs.head.length
    val d1 = dim + 1
    var beta = new Array[Double](d1)
    for (_ <- 0 until iters) {
      val a = Array.ofDim[Double](d1, d1)
      val g = new Array[Double](d1)
      for (r <- xs.indices) {
        val xt = xs(r) :+ 1.0
        val eta = (0 until d1).map(i => beta(i) * xt(i)).sum
        val p = 1.0 / (1.0 + math.exp(-eta))
        val w = math.max(p * (1 - p), 1e-6)
        for (i <- 0 until d1) {
          g(i) += xt(i) * (ys(r) - p)
          for (j <- 0 until d1) a(i)(j) += w * xt(i) * xt(j)
        }
      }
      for (i <- 0 until dim) a(i)(i) += lambda
      val delta = graft.functions.GramianAgg.solve(a, g)
      beta = Array.tabulate(d1)(i => beta(i) + delta(i))
    }
    beta
  }

  private def probeMap(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("distributed IRLS matches the driver-side Newton fit") {
    import spark.implicits._
    // deterministic pseudo-random 4-d data with a known-ish separator
    val rows = (0 until 200).map { i =>
      val x = Array.tabulate(4)(j => math.sin(i * 13.7 + j * 5.1))
      val margin = 1.5 * x(0) - 2.0 * x(1) + 0.5 * x(2) + 0.3
      val y = if (margin > 0) 1.0 else 0.0
      (x, y)
    }
    val df = rows.toDF("x", "y").repartition(7)
    val got = probeMap(PipelineOps3.logisticProbe(df, lambda = 1e-3, iters = 3))
    val ref = driverFit(rows.map(_._1).toArray, rows.map(_._2).toArray, 1e-3, 3)
    for (j <- 0 until 4)
      assert(math.abs(got(f"w_$j%03d") - ref(j)) < 1e-4,
        s"w_$j: ${got(f"w_$j%03d")} vs ${ref(j)}")
    assert(math.abs(got("intercept") - ref(4)) < 1e-4)
    // a separable problem fits to near-perfect training accuracy
    assert(got("accuracy") >= 0.97, s"accuracy ${got("accuracy")}")
    assert(got("log_loss") < 0.3, s"log_loss ${got("log_loss")}")
    // recovered direction matches the planted separator's signs
    assert(got("w_000") > 0 && got("w_001") < 0)
  }

  test("fit is partition-invariant (within float-sum wobble)") {
    import spark.implicits._
    val rows = (0 until 150).map { i =>
      (Array.tabulate(3)(j => math.cos(i * 7.3 + j * 2.9)),
        (i % 3 == 0).compareTo(false).toDouble)
    }
    val a = probeMap(PipelineOps3.logisticProbe(
      rows.toDF("x", "y").repartition(2), 1e-3, 3))
    val b = probeMap(PipelineOps3.logisticProbe(
      rows.toDF("x", "y").repartition(13), 1e-3, 3))
    a.keySet.foreach(k =>
      assert(math.abs(a(k) - b(k)) < 1e-5, s"$k: ${a(k)} vs ${b(k)}"))
  }

  test("q_logistic_probe runs over the corpus embeddings with sane output") {
    val out = probeMap(SparkEntry.queries("q_logistic_probe")(spark, TinyDir))
    assert(out.contains("intercept") && out.contains("log_loss"))
    assert(out("accuracy") >= 0.0 && out("accuracy") <= 1.0)
    assert(out("log_loss") >= 0.0)
    assert(out.count(_._1.startsWith("w_")) == 64)
  }
}

package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** fitKmeansCodebook's two routes must emit the BIT-IDENTICAL codebook:
  * the driver Lloyd replay (default — every spec-sized sample takes it)
  * and the distributed decimal-mean loop (forced with driverMaxValues =
  * 0). The planted corpus stresses the replay's corners: an argmax tie
  * between two identical vectors (lowest cid must win in both routes),
  * an empty cell (k exceeds the natural cluster count → previous
  * centroid kept), and negative components (the HALF_UP scaled-18 mean
  * must round negative sums half AWAY from zero, like Spark's decimal
  * divide). */
class KmeansRouteSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
  }

  private val corpus = Seq(
    1L -> Seq(1.0, 0.0, 0.1, -0.2),
    2L -> Seq(0.9, 0.1, 0.0, -0.1),
    3L -> Seq(0.0, 1.0, -0.3, 0.2),
    4L -> Seq(0.1, 0.9, -0.1, 0.3),
    5L -> Seq(-0.7, -0.7, 0.5, 0.111111111111111119),
    6L -> Seq(-0.6, -0.8, 0.4, 0.1),
    7L -> Seq(1.0, 0.0, 0.1, -0.2), // exact duplicate of id 1: argmax tie
    8L -> Seq(0.333333333333333315, 0.666666666666666741, 0.1, 0.0))

  test("driver Lloyd replay == distributed decimal-mean rounds") {
    for (k <- Seq(2, 3, 5, 8)) {
      val driver = Similarity.fitKmeansCodebook(vecsDf(corpus), k, iters = 4)
      val dist = Similarity.fitKmeansCodebook(vecsDf(corpus), k, iters = 4,
        driverMaxValues = 0L)
      assert(driver.length == dist.length, s"k=$k codebook size")
      driver.zip(dist).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.util.Arrays.equals(a, b),
          s"k=$k centroid $i differs: ${a.toSeq} vs ${b.toSeq}")
      }
    }
  }

  test("k above the sample size: both routes fit min(k, |sample|) centroids") {
    val driver = Similarity.fitKmeansCodebook(vecsDf(corpus.take(3)), 8, iters = 2)
    val dist = Similarity.fitKmeansCodebook(vecsDf(corpus.take(3)), 8, iters = 2,
      driverMaxValues = 0L)
    assert(driver.length == dist.length)
    driver.zip(dist).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }
}

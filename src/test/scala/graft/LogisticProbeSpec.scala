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

  private def mcMap(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Double] =
    df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("multiclass one-vs-rest matches K independent driver-side Newton fits") {
    import spark.implicits._
    // 3 well-separated 4-d clusters, deterministic jitter
    val centers = Array(
      Array(3.0, 0.0, -1.0, 0.5),
      Array(-2.0, 2.5, 0.5, -0.5),
      Array(0.0, -3.0, 2.0, 1.0))
    val rows = (0 until 240).map { i =>
      val c = i % 3
      val x = Array.tabulate(4)(j => centers(c)(j) + 0.4 * math.sin(i * 11.3 + j * 3.7))
      (x, c.toLong)
    }
    val df = rows.toDF("x", "y").repartition(7)
    val got = mcMap(PipelineOps3.multiclassProbe(df, lambda = 1e-3, iters = 3))
    // each class's one-vs-rest fit must equal the binary driver fit
    for (c <- 0L until 3L) {
      val ys = rows.map(r => if (r._2 == c) 1.0 else 0.0).toArray
      val ref = driverFit(rows.map(_._1).toArray, ys, 1e-3, 3)
      for (j <- 0 until 4)
        assert(math.abs(got((c, f"w_$j%03d")) - ref(j)) < 1e-4,
          s"class $c w_$j: ${got((c, f"w_$j%03d"))} vs ${ref(j)}")
      assert(math.abs(got((c, "intercept")) - ref(4)) < 1e-4, s"class $c intercept")
    }
    // separable 3-class synthetic: argmax recovers the labels
    assert(got((-1L, "accuracy")) >= 0.99, s"accuracy ${got((-1L, "accuracy"))}")
    assert(got((-1L, "log_loss")) < 0.3)
  }

  test("a -1 label fails loud (the summary-row sentinel must never collide)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), -1L), (Array(0.0, 1.0), 1L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      PipelineOps3.multiclassProbe(df, lambda = 1e-3, iters = 1).collect()
    }
    assert(e.getMessage.contains("reserved"), s"got: ${e.getMessage}")
  }

  test("K=16 classes stay one pass per round — past the declarative codegen cliff") {
    import spark.implicits._
    // 16 classes x 8 dims: the declarative K-sibling-gramian form falls
    // off whole-stage codegen around K=10 (Janino method limit) and runs
    // ~10x slower interpreted; the hand-looped aggregate must stay both
    // correct and fast here. Separable-by-construction: class c's cluster
    // center is 4*e_{c%8} +/- offset jitter.
    val rows = (0 until 640).map { i =>
      val c = i % 16
      val x = Array.tabulate(8)(j =>
        (if (j == c % 8) 4.0 else 0.0) + (if (c >= 8) 1.5 else -1.5) *
          (if (j == (c + 3) % 8) 1.0 else 0.0) + 0.3 * math.sin(i * 5.7 + j * 2.1))
      (x, c.toLong)
    }
    val df = rows.toDF("x", "y").repartition(9)
    val t0 = System.nanoTime()
    val got = mcMap(PipelineOps3.multiclassProbe(df, lambda = 1e-3, iters = 3))
    val secs = (System.nanoTime() - t0) / 1e9
    for (c <- 0L until 16L) {
      val ys = rows.map(r => if (r._2 == c) 1.0 else 0.0).toArray
      val ref = driverFit(rows.map(_._1).toArray, ys, 1e-3, 3)
      for (j <- 0 until 8)
        assert(math.abs(got((c, f"w_$j%03d")) - ref(j)) < 1e-4,
          s"class $c w_$j: ${got((c, f"w_$j%03d"))} vs ${ref(j)}")
      assert(math.abs(got((c, "intercept")) - ref(8)) < 1e-4, s"class $c intercept")
    }
    assert(got((-1L, "accuracy")) >= 0.95, s"accuracy ${got((-1L, "accuracy"))}")
    // generous wall bound: an interpreted-fallback regression lands
    // minutes, a compiled pass lands seconds
    assert(secs < 60.0, f"K=16 fit took $secs%.1f s — codegen-cliff regression?")
  }

  test("multiclass fit is partition-invariant (within float-sum wobble)") {
    import spark.implicits._
    val rows = (0 until 180).map { i =>
      (Array.tabulate(3)(j => math.cos(i * 7.3 + j * 2.9)), (i % 4).toLong)
    }
    val a = mcMap(PipelineOps3.multiclassProbe(
      rows.toDF("x", "y").repartition(2), 1e-3, 3))
    val b = mcMap(PipelineOps3.multiclassProbe(
      rows.toDF("x", "y").repartition(13), 1e-3, 3))
    a.keySet.foreach(k =>
      assert(math.abs(a(k) - b(k)) < 1e-5, s"$k: ${a(k)} vs ${b(k)}"))
  }

  test("q_multiclass_probe runs over the corpus embeddings with sane output") {
    val out = mcMap(SparkEntry.queries("q_multiclass_probe")(spark, TinyDir))
    val classes = out.keySet.map(_._1).filter(_ >= 0)
    assert(classes.nonEmpty)
    // K (D+1) coefficient rows per class + the two summary rows
    classes.foreach { c =>
      assert(out.contains((c, "intercept")), s"class $c missing intercept")
      assert(out.count { case ((cc, t), _) => cc == c && t.startsWith("w_") } == 64)
    }
    assert(out((-1L, "accuracy")) >= 0.0 && out((-1L, "accuracy")) <= 1.0)
    assert(out((-1L, "log_loss")) >= 0.0)
  }

  test("q_logistic_probe runs over the corpus embeddings with sane output") {
    val out = probeMap(SparkEntry.queries("q_logistic_probe")(spark, TinyDir))
    assert(out.contains("intercept") && out.contains("log_loss"))
    assert(out("accuracy") >= 0.0 && out("accuracy") <= 1.0)
    assert(out("log_loss") >= 0.0)
    assert(out.count(_._1.startsWith("w_")) == 64)
  }

  // ---- r10 hardening (VERDICT r9 #7): the ridge must actually carry a
  // collinear corpus, and the driver solves must refuse an
  // ill-conditioned system instead of returning garbage coefficients.

  /** 3-class separable 6-d synthetic where dims 4 and 5 EXACTLY
    * duplicate dims 0 and 1 — the collinearity a learned-embedding
    * corpus exhibits when a projection head ties dimensions. */
  private def collinearRows: Seq[(Array[Double], Long)] = {
    val centers = Array(
      Array(3.0, 0.0, -1.0, 0.5),
      Array(-2.0, 2.5, 0.5, -0.5),
      Array(0.0, -3.0, 2.0, 1.0))
    (0 until 240).map { i =>
      val c = i % 3
      val base = Array.tabulate(4)(j => centers(c)(j) + 0.4 * math.sin(i * 11.3 + j * 3.7))
      (base ++ Array(base(0), base(1)), c.toLong)
    }
  }

  test("collinear dims under ridge: fit succeeds, classes recovered, coefficients bounded") {
    import spark.implicits._
    val df = collinearRows.toDF("x", "y").repartition(5)
    val got = mcMap(PipelineOps3.multiclassProbe(df, lambda = 1e-3, iters = 3))
    assert(got((-1L, "accuracy")) >= 0.99,
      s"collinear-but-separable synthetic must still be recovered: ${got((-1L, "accuracy"))}")
    // under exact collinearity the unregularized system is singular; the
    // ridge picks the bounded solution — no coefficient may blow up
    val ws = got.collect { case ((c, t), v) if c >= 0 && t.startsWith("w_") => v }
    assert(ws.forall(w => math.abs(w) < 1e3),
      s"ridge must keep collinear-dim coefficients bounded, max=${ws.map(math.abs).max}")
  }

  test("collinear dims without enough ridge: the condition guard fails loud") {
    import spark.implicits._
    // NEAR-exact duplicate (1e-9 jitter) so elimination leaves a tiny
    // but nonzero pivot: exactly the case the absolute singular check
    // misses and the pivot-ratio guard exists for
    val rows = collinearRows.map { case (x, y) =>
      (x.updated(4, x(0) + 1e-9 * math.sin(y.toDouble)), y)
    }
    val df = rows.toDF("x", "y")
    val e = intercept[Exception] {
      PipelineOps3.multiclassProbe(df, lambda = 0.0, iters = 1).collect()
    }
    val msg = e.getMessage
    assert(msg.contains("ill-conditioned") || msg.contains("singular"),
      s"expected the solve guard, got: $msg")
  }

  test("solve: pivot-ratio guard rejects near-singular, passes well-conditioned") {
    import graft.functions.GramianAgg
    // near-singular 2x2: pivots ~2 and ~5e-16 -> ratio ~4e15 >= 1e12
    val e = intercept[IllegalArgumentException] {
      GramianAgg.solve(Array(Array(1.0, 1.0), Array(1.0, 1.0 + 1e-15)), Array(1.0, 2.0))
    }
    assert(e.getMessage.contains("ill-conditioned") || e.getMessage.contains("singular"))
    assert(e.getMessage.contains("lambda") || e.getMessage.contains("singular"),
      "the failure must name the remedy")
    // a merely badly-scaled but WELL-conditioned system still solves:
    // diag(1e15, 1e-3) has raw pivot ratio 1e18 (a naive guard would
    // reject it with the wrong remedy) but scaled ratio 1 — scaling is
    // not collinearity, and the guard must tell them apart
    val x = GramianAgg.solve(Array(Array(1e15, 0.0), Array(0.0, 1e-3)), Array(2e15, 3e-3))
    assert(math.abs(x(0) - 2.0) < 1e-9 && math.abs(x(1) - 3.0) < 1e-9)
  }
}

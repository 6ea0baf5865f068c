package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom aggregate (SURVEY.md §2.5 agg_gramian): second-moment sweep for
  * PCA/whitening in ONE pass.
  *
  * The buffer holds [count, Σx (D), upper-triangular ΣxxT (D(D+1)/2)] —
  * (1 + D + D(D+1)/2) doubles (D=64 → ~17 KB), mergeable by elementwise
  * add, so map-side partials apply and the full covariance of a 100 TB
  * embedding column costs exactly one scan and a model-sized shuffle.
  * The declarative alternative (posexplode to (i, j, x_i·x_j) pairs)
  * shuffles D²/2 rows per input row — 2048× this buffer, per row.
  *
  * Float caveat: double sums are partition-order-dependent at the 1e-12
  * relative level (addition is non-associative). The downstream
  * eigenvector is spectral-gap-stable to that wobble; specs assert with
  * tolerances, not bit equality (unlike the integer/decimal aggregates).
  */
case class GramianAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val gramLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + gramLen

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gramian_agg expects array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gramian_agg(dim=$dim) got a vector of ${arr.numElements()}")
      buffer(0) += 1.0
      var i = 0
      var g = 1 + dim
      while (i < dim) {
        val xi = arr.getDouble(i)
        buffer(1 + i) += xi
        var j = i
        while (j < dim) {
          buffer(g) += xi * arr.getDouble(j)
          g += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramianAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "gramian_agg"
}

object GramianAgg {
  /** gramian_agg(vec, dim) as a Column aggregate: returns
    * [n, Σx…, upper-tri ΣxxT…] as array<double>. */
  def apply(vec: Column, dim: Int): Column =
    GraftShims.column(GramianAgg(GraftShims.toCatalyst(vec), dim).toAggregateExpression())

  /** Driver-side finish: moments → (mean, covariance) as dense arrays. */
  def covariance(moments: Array[Double], dim: Int): (Array[Double], Array[Array[Double]]) = {
    val n = moments(0)
    require(n > 0, "gramian covariance of an empty input")
    val mean = Array.tabulate(dim)(i => moments(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var g = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = moments(g) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        g += 1
        j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Deterministic Gaussian elimination with partial pivoting for a small
    * dense system Ax = b (model-sized: D ≤ a few hundred, driver-side —
    * the same posture as [[powerIteration]] and the k-means fits).
    * Mutates copies; ties in pivot choice break to the lowest row index,
    * so the result is bit-reproducible for identical inputs.
    *
    * CONDITION GUARD (r10): beyond the absolute near-zero pivot check,
    * the elimination tracks the max/min pivot-magnitude ratio — a cheap,
    * deterministic condition estimate that catches the failure the probe
    * family actually hits (collinear embedding dims under too little
    * ridge: the solve "succeeds" and returns coefficients in the 1e9
    * range that round-trip to garbage probabilities). Ill-conditioned
    * systems fail LOUD with the remedy in the message instead of
    * returning silently meaningless coefficients. */
  def solve(a0: Array[Array[Double]], b0: Array[Double],
            maxPivotRatio: Double = 1e12): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    // row scales for the condition estimate: the ratio of RAW pivots
    // confuses scaling with conditioning (a diag(1e6, 1e-6) system is
    // perfectly solvable), so each pivot is measured relative to its
    // row's original magnitude — implicit row equilibration, the
    // standard practical estimate. Scales permute WITH the rows.
    val scale = a0.map(row => math.max(row.iterator.map(math.abs).max, 1e-300))
    var maxPiv = 0.0
    var minPiv = Double.PositiveInfinity
    var col = 0
    while (col < d) {
      var p = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      require(math.abs(a(p)(col)) > 1e-12, s"singular system at column $col")
      val piv = math.abs(a(p)(col)) / scale(p)
      if (piv > maxPiv) maxPiv = piv
      if (piv < minPiv) minPiv = piv
      require(maxPiv / minPiv < maxPivotRatio,
        f"ill-conditioned system at column $col (scaled pivot ratio ${maxPiv / minPiv}%.3g " +
          f">= $maxPivotRatio%.1g): near-collinear inputs - raise the ridge lambda")
      if (p != col) { val t = scale(p); scale(p) = scale(col); scale(col) = t }
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
        val tb = b(p); b(p) = b(col); b(col) = tb }
      var i = col + 1
      while (i < d) {
        val f = a(i)(col) / a(col)(col)
        if (f != 0.0) {
          var j = col
          while (j < d) { a(i)(j) -= f * a(col)(j); j += 1 }
          b(i) -= f * b(col)
        }
        i += 1
      }
      col += 1
    }
    val x = new Array[Double](d)
    var i = d - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < d) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Cholesky factorization of a symmetric positive-definite matrix
    * (lower triangular L with A = L·Lᵀ), with a ridge λ·I added for
    * numerical safety. Deterministic: fixed element order, no pivoting
    * needed for SPD inputs. Driver-side, model-sized (D×D). */
  def cholesky(a: Array[Array[Double]], ridge: Double): Array[Array[Double]] = {
    val d = a.length
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j) + (if (i == j) ridge else 0.0)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          require(s > 0, s"cholesky: matrix not positive definite at $i (got $s)")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** Inverse of a lower-triangular matrix by forward substitution on the
    * identity columns — with [[cholesky]], `triInverse(chol(Σ))` gives
    * the whitening matrix A = L⁻¹ with ‖A(x−μ)‖² = Mahalanobis². */
  def triInverse(l: Array[Array[Double]]): Array[Array[Double]] = {
    val d = l.length
    val inv = Array.ofDim[Double](d, d)
    var c = 0
    while (c < d) {
      var i = c
      while (i < d) {
        var s = if (i == c) 1.0 else 0.0
        var k = c
        while (k < i) { s -= l(i)(k) * inv(k)(c); k += 1 }
        inv(i)(c) = s / l(i)(i)
        i += 1
      }
      c += 1
    }
    inv
  }

  /** Deterministic power iteration: dominant eigenpair of a symmetric
    * matrix. Fixed uniform init, fixed iteration count, sign pinned so
    * the largest-|loading| coordinate is positive. */
  def powerIteration(m: Array[Array[Double]], iters: Int = 100): (Double, Array[Double]) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val mv = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        s
      })
      val nrm = math.sqrt(mv.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = mv.map(_ / nrm)
      lambda = nrm
    }
    val pivot = v.indices.maxBy(i => math.abs(v(i)))
    if (v(pivot) < 0) v = v.map(-_)
    (lambda, v)
  }
}

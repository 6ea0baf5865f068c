package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Custom aggregate (SURVEY.md §2.5 agg_gramian's multiclass sibling):
  * ALL K one-vs-rest IRLS Newton systems in ONE corpus pass.
  *
  * The declarative formulation (K per-class augmented-vector
  * [[GramianAgg]]s side by side) is semantically identical but its input
  * projection carries K copies of the fold/transform lambda pipeline —
  * past Janino's method limit at K ≈ 10, so the whole stage fell back to
  * interpreted HOF evaluation (~40× slower: the PLANS.md q_ann_pq lesson
  * again, this time in an aggregate). Here the per-row work is a
  * hand-written loop over the model object (`betas` rides on the
  * aggregate instance, never through codegen): for each class compute
  * η_c = β_c·x̃, p_c, w_c, then accumulate the weighted normal equations
  *   A_c += w_c · x̃x̃ᵀ (upper triangular),  g_c += x̃ · (y_c − p_c).
  * Buffer = K · (d1(d1+1)/2 + d1) doubles (K=10, D=64 → ~180 KB) —
  * mergeable by elementwise add, so map-side partials apply and a round
  * over 100 TB of vectors is one scan + a model-sized shuffle,
  * independent of K. */
case class MulticlassIrlsAgg(
    childX: Expression,
    childY: Expression,
    betas: Seq[Seq[Double]],
    dim: Int,
    classes: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val k = classes.length
  private val d1 = dim + 1
  private val tri = d1 * (d1 + 1) / 2
  private val per = tri + d1
  private val bufLen = k * per
  @transient private lazy val b: Array[Array[Double]] = betas.map(_.toArray).toArray
  @transient private lazy val cls: Array[Long] = classes.toArray

  override def children: Seq[Expression] = childX :: childY :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (childX.dataType, childY.dataType) match {
      case (ArrayType(DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (tx, ty) => TypeCheckResult.TypeCheckFailure(
        s"multiclass_irls_agg expects (array<double>, bigint), got (${tx.sql}, ${ty.sql})")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val vx = childX.eval(input)
    val vy = childY.eval(input)
    if (vx != null && vy != null) {
      val arr = vx.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"multiclass_irls_agg(dim=$dim) got a vector of ${arr.numElements()}")
      val y = vy.asInstanceOf[Long]
      val xt = new Array[Double](d1)
      var i = 0
      while (i < dim) { xt(i) = arr.getDouble(i); i += 1 }
      xt(dim) = 1.0
      var c = 0
      while (c < k) {
        val bc = b(c)
        var eta = bc(dim)
        i = 0
        while (i < dim) { eta += bc(i) * xt(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-eta))
        val w = math.max(p * (1.0 - p), 1e-6)
        val r = (if (y == cls(c)) 1.0 else 0.0) - p
        val base = c * per
        var g = base
        i = 0
        while (i < d1) {
          val wxi = w * xt(i)
          var j = i
          while (j < d1) { buffer(g) += wxi * xt(j); g += 1; j += 1 }
          buffer(base + tri + i) += xt(i) * r
          i += 1
        }
        c += 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MulticlassIrlsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MulticlassIrlsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MulticlassIrlsAgg =
    copy(childX = newChildren(0), childY = newChildren(1))

  override def prettyName: String = "multiclass_irls_agg"
}

/** Fit-metrics sibling of [[MulticlassIrlsAgg]]: one pass computing
  * [n, argmax-correct count, Σ mean-per-class log-loss] for a fitted
  * coefficient matrix — same hand-written-loop posture (the declarative
  * K-eta argmax hits the same codegen cliff). Argmax ties break to the
  * LOWEST class index. */
case class MulticlassMetricsAgg(
    childX: Expression,
    childY: Expression,
    betas: Seq[Seq[Double]],
    dim: Int,
    classes: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val k = classes.length
  @transient private lazy val b: Array[Array[Double]] = betas.map(_.toArray).toArray
  @transient private lazy val cls: Array[Long] = classes.toArray

  override def children: Seq[Expression] = childX :: childY :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (childX.dataType, childY.dataType) match {
      case (ArrayType(DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (tx, ty) => TypeCheckResult.TypeCheckFailure(
        s"multiclass_metrics_agg expects (array<double>, bigint), got (${tx.sql}, ${ty.sql})")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](3)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val vx = childX.eval(input)
    val vy = childY.eval(input)
    if (vx != null && vy != null) {
      val arr = vx.asInstanceOf[ArrayData]
      // same guard as the IRLS sibling: UnsafeArrayData.getDouble is an
      // unchecked Platform read — a short vector would silently corrupt
      // the metrics with adjacent buffer memory instead of failing
      require(arr.numElements() == dim,
        s"multiclass_metrics_agg(dim=$dim) got a vector of ${arr.numElements()}")
      val y = vy.asInstanceOf[Long]
      var best = 0
      var bestEta = Double.NegativeInfinity
      var loss = 0.0
      var c = 0
      while (c < k) {
        val bc = b(c)
        var eta = bc(dim)
        var i = 0
        while (i < dim) { eta += bc(i) * arr.getDouble(i); i += 1 }
        if (eta > bestEta) { bestEta = eta; best = c }
        val p0 = 1.0 / (1.0 + math.exp(-eta))
        val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
        loss -= (if (y == cls(c)) math.log(p) else math.log(1.0 - p))
        c += 1
      }
      buffer(0) += 1.0
      if (cls(best) == y) buffer(1) += 1.0
      buffer(2) += loss / k
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    b1(0) += b2(0); b1(1) += b2(1); b1(2) += b2(2); b1
  }

  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(3 * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(3)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MulticlassMetricsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MulticlassMetricsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MulticlassMetricsAgg =
    copy(childX = newChildren(0), childY = newChildren(1))

  override def prettyName: String = "multiclass_metrics_agg"
}

object MulticlassIrlsAgg {
  /** multiclass_irls_agg(x, y) for the given round's coefficient matrix:
    * returns the K flattened [A upper-tri, g] systems as array<double>. */
  def apply(x: Column, y: Column, betas: Array[Array[Double]], dim: Int,
            classes: Array[Long]): Column =
    GraftShims.column(MulticlassIrlsAgg(
      GraftShims.toCatalyst(x), GraftShims.toCatalyst(y),
      betas.map(_.toSeq).toSeq, dim, classes.toSeq).toAggregateExpression())

  /** multiclass_metrics_agg(x, y): [n, argmax-correct, Σ mean log-loss]. */
  def metrics(x: Column, y: Column, betas: Array[Array[Double]], dim: Int,
              classes: Array[Long]): Column =
    GraftShims.column(MulticlassMetricsAgg(
      GraftShims.toCatalyst(x), GraftShims.toCatalyst(y),
      betas.map(_.toSeq).toSeq, dim, classes.toSeq).toAggregateExpression())

  /** Driver-side Newton step from one class's [A upper-tri, g] slice. */
  def newtonStep(flat: Array[Double], offset: Int, dim: Int,
                 lambda: Double): Array[Double] = {
    val d1 = dim + 1
    val tri = d1 * (d1 + 1) / 2
    val a = Array.ofDim[Double](d1, d1)
    var g = offset
    var i = 0
    while (i < d1) {
      var j = i
      while (j < d1) {
        a(i)(j) = flat(g); a(j)(i) = flat(g); g += 1; j += 1
      }
      i += 1
    }
    i = 0
    while (i < dim) { a(i)(i) += lambda; i += 1 }
    val grad = Array.tabulate(d1)(i => flat(offset + tri + i))
    GramianAgg.solve(a, grad)
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Custom aggregate (SURVEY.md §2.5 agg_vecsum): element-wise vector sum
  * in ONE mergeable buffer — the grouped-centroid primitive.
  *
  * The buffer holds [n, Σ round(xᵢ·10⁶)…] as LONGS: integer sums are
  * associative-exact, so the result is bit-identical under any partition
  * order or shuffle width (same posture as pagerankInt's integer-scaled
  * ranks), and a DuckDB oracle can reproduce it with
  * SUM(CAST(round(x*1000000) AS BIGINT)) per position. The declarative
  * alternative (posexplode + groupBy(label, pos)) shuffles D rows per
  * input row and still isn't cross-engine exact; this buffer is D+1 longs
  * (D=64 → 520 bytes) riding normal partial aggregation — a 100 TB
  * embedding column's per-group centroids cost one scan and a
  * model-sized shuffle. Scaling caveat: inputs must be ≲ 9·10¹²·n⁻¹ per
  * element to stay inside long range — embeddings are O(1), fine.
  */
case class VecSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val bufLen = 1 + dim

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vecsum_agg expects array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vecsum_agg(dim=$dim) got a vector of ${arr.numElements()}")
      buffer(0) += 1L
      var i = 0
      while (i < dim) {
        buffer(1 + i) += math.round(arr.getDouble(i) * 1e6)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "vecsum_agg"
}

object VecSumAgg {
  /** vecsum_agg(vec, dim) as a Column aggregate: returns
    * [n, Σ round(x·10⁶)…] as array<long> (exact under any merge order). */
  def apply(vec: Column, dim: Int): Column =
    GraftShims.column(VecSumAgg(GraftShims.toCatalyst(vec), dim).toAggregateExpression())
}

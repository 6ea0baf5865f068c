package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom aggregate (SURVEY.md §2.5 agg_simhash): 64-bit SimHash computed
  * in ONE aggregation pass.
  *
  * The declarative formulation needs a pre-count per (doc, token) plus 64
  * conditional SUM columns — two shuffles and a 64-wide aggregate. This
  * TypedImperativeAggregate folds each token hash's ±1 bit votes straight
  * into a 64-long buffer: update is O(64) per row, merge is elementwise
  * add (associative — map-side partial aggregation applies), eval packs
  * the sign bits. Same result, one shuffle, single narrow buffer.
  *
  * Vote semantics match the classic per-occurrence ±1 scheme: summing one
  * vote per occurrence equals count-weighted votes.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_agg expects a long hash, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buffer(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  /** simhash_agg(hash64) as a Column aggregate. */
  def apply(hash: Column): Column =
    GraftShims.column(SimHashAgg(GraftShims.toCatalyst(hash)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom aggregate (SURVEY.md §2.5): exact top-k values per group as ONE
  * mergeable aggregation — `top_k_agg(col, k)` inside any groupBy.
  *
  * The stock idioms either shuffle every row to rank it (window
  * row_number) or collect the whole group (`slice(sort_array(
  * collect_list(x)))` — unbounded buffer). This TypedImperativeAggregate
  * keeps a bounded k-element min-heap per group: update is O(log k),
  * merge folds two heaps (associative — map-side partial aggregation
  * applies), so the exchange carries at most k longs per (group,
  * partition). The aggregate-function complement of the TopKPerKey
  * whole-operator plan: use the plan when you need the full rows, the
  * aggregate when you need just the top values inline with other aggs.
  *
  * Result: the k largest values, sorted descending (exact, duplicates
  * kept). Deterministic for any input partitioning.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Long]] {

  require(k > 0, "top_k_agg: k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"top_k_agg expects a long column, got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[Long] =
    new java.util.PriorityQueue[Long](k + 1) // natural order: head = smallest retained

  private def offer(heap: java.util.PriorityQueue[Long], v: Long): Unit = {
    if (heap.size() < k) { heap.add(v); () }
    else if (v > heap.peek()) { heap.poll(); heap.add(v); () }
  }

  override def update(heap: java.util.PriorityQueue[Long], input: InternalRow): java.util.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(h1: java.util.PriorityQueue[Long], h2: java.util.PriorityQueue[Long]): java.util.PriorityQueue[Long] = {
    val it = h2.iterator()
    while (it.hasNext) offer(h1, it.next())
    h1
  }

  override def eval(heap: java.util.PriorityQueue[Long]): Any = {
    val arr = new Array[Long](heap.size())
    var i = heap.size() - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // drain ascending → fill backwards
    new GenericArrayData(arr)
  }

  override def serialize(heap: java.util.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + heap.size() * 8)
    bb.putInt(heap.size())
    val it = heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(bb.getLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "top_k_agg"
}

object TopKAgg {
  /** top_k_agg(col, k): the k largest values, sorted descending. */
  def apply(col: Column, k: Int): Column =
    GraftShims.column(TopKAgg(GraftShims.toCatalyst(col), k).toAggregateExpression())
}

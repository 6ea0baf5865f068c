package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Custom aggregate (SURVEY.md §2.5 agg_bloom): build a Bloom filter over
  * a long key column in ONE distributed aggregation pass.
  *
  * `DataFrameStatFunctions.bloomFilter` collects the filter to the driver
  * as an action; this aggregate instead makes the filter a first-class
  * VALUE inside any groupBy — one fixed-size mergeable buffer per group,
  * map-side partials, the standard sketch contract (same shape as the
  * reference's per-table MySQL indexes, built per file/bucket instead).
  * Feeds [[graft.sources.FileIndex]]'s per-file skipping sidecars.
  *
  * Buffer = org.apache.spark.util.sketch.BloomFilter (public Spark API);
  * merge is bitwise OR (associative/commutative), eval emits the
  * serialized filter bytes.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "bloom_agg: expectedItems must be positive")
  require(fpp > 0 && fpp < 1, "bloom_agg: fpp must be in (0, 1)")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_agg expects a long key, got ${t.sql}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  /** bloom_agg(key, expectedItems, fpp) as a Column aggregate → binary. */
  def agg(key: Column, expectedItems: Long = 100000L, fpp: Double = 0.01): Column =
    GraftShims.column(BloomAgg(GraftShims.toCatalyst(key), expectedItems, fpp)
      .toAggregateExpression())
}

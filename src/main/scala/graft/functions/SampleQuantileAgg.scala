package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Bounded bottom-k sample keyed by a per-row stable hash: holds the k
  * (hash, value) pairs with the smallest UNSIGNED hashes. Duplicate
  * hashes keep the smaller value, so the state is a pure function of the
  * input set — order- and partitioning-independent. */
final class SampleQBuffer(val k: Int) {
  val map = new java.util.TreeMap[java.lang.Long, java.lang.Double](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def insert(h: Long, v: Double): Unit = {
    if (map.size() >= k && !map.containsKey(h) &&
        java.lang.Long.compareUnsigned(h, map.lastKey()) >= 0) return
    val prev = map.get(h)
    if (prev == null || v < prev) map.put(h, v)
    if (map.size() > k) map.pollLastEntry()
  }

  def mergeFrom(other: SampleQBuffer): Unit = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(e.getKey, e.getValue) }
  }
}

/** Custom aggregate (SURVEY.md §2.5 agg_sample_quantile): a mergeable,
  * DETERMINISTIC quantile sketch — a uniform bottom-k sample keyed by a
  * caller-supplied stable row hash.
  *
  * `sample_quantile_agg(xxhash64(rowkey...), value, k)` retains the k
  * rows whose hashes are smallest; because hash order is uniform and
  * independent of the value, the retained values are a uniform random
  * sample of fixed seed, and any quantile read off the sample has the
  * standard sampling error (~1/sqrt(k) in rank). Two properties Spark's
  * built-in approx_percentile lacks:
  *
  *  - **Bit-deterministic under re-partitioning**: the buffer is a pure
  *    function of the input set (bottom-k by a stable hash), so the same
  *    data yields the same bytes under any partitioning/merge order —
  *    the repo's exact-equality determinism probes apply to an
  *    APPROXIMATE operator.
  *  - **Mergeable as a value**: sketches persist to a sidecar and fold
  *    into tomorrow's batch (same incremental posture as agg_bloom /
  *    sink_incr_agg) — at 100 TB the daily quantile refresh touches only
  *    the delta's sketches, not the history.
  *
  * Reference shape: the percentile/rank normalizations the reference
  * applies per dataset (R/gtex_process.R rank → level buckets) need
  * distribution summaries per (source, group); this makes those
  * summaries cheap and incremental at scale.
  */
case class SampleQuantileAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleQBuffer] {

  require(k > 1, "sample_quantile_agg: k must be > 1")

  override def children: Seq[Expression] = hash :: value :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"sample_quantile_agg expects (long hash, double value), got (${h.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): SampleQBuffer = new SampleQBuffer(k)

  override def update(buffer: SampleQBuffer, input: InternalRow): SampleQBuffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      buffer.insert(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(b1: SampleQBuffer, b2: SampleQBuffer): SampleQBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buffer: SampleQBuffer): Any = serialize(buffer)

  override def serialize(buffer: SampleQBuffer): Array[Byte] = {
    val n = buffer.map.size()
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(buffer.k).putInt(n)
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SampleQBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k0 = bb.getInt
    val n = bb.getInt
    val b = new SampleQBuffer(k0)
    var i = 0
    while (i < n) { b.insert(bb.getLong, bb.getDouble); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleQuantileAgg =
    copy(hash = newChildren(0), value = newChildren(1))

  override def prettyName: String = "sample_quantile_agg"
}

object SampleQuantileAgg {
  /** sample_quantile_agg(rowHash, value, k) as a Column aggregate →
    * binary sketch. `rowHash` must be a stable per-row hash (e.g.
    * `xxhash64(pk1, pk2)`) — NOT derived from the value. */
  def agg(rowHash: Column, value: Column, k: Int = 4096): Column =
    GraftShims.column(SampleQuantileAgg(
      GraftShims.toCatalyst(rowHash), GraftShims.toCatalyst(value), k)
      .toAggregateExpression())

  /** Sampled values (ascending). */
  def values(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // k
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { bb.getLong; out(i) = bb.getDouble; i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Quantile estimate with the exact-percentile interpolation recipe
    * (rank = p·(n−1), linear between neighbors) applied to the sample. */
  def quantile(bytes: Array[Byte], p: Double): Double = {
    val vs = values(bytes)
    if (vs.isEmpty) return Double.NaN
    val rank = p * (vs.length - 1)
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) vs(lo) else vs(lo) + (rank - lo) * (vs(hi) - vs(lo))
  }

  /** Merge two sketches (sidecar fold-in path). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bba = ByteBuffer.wrap(a)
    val ka = bba.getInt
    val na = bba.getInt
    val bbb = ByteBuffer.wrap(b)
    val kb = bbb.getInt
    val nb = bbb.getInt
    val buf = new SampleQBuffer(math.min(ka, kb))
    var i = 0
    while (i < na) { buf.insert(bba.getLong, bba.getDouble); i += 1 }
    i = 0
    while (i < nb) { buf.insert(bbb.getLong, bbb.getDouble); i += 1 }
    val n = buf.map.size()
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(buf.k).putInt(n)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putDouble(e.getValue)
    }
    bb.array()
  }
}

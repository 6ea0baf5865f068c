package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bounded k-minimum-values buffer: the k smallest hash values seen, in
  * UNSIGNED long order (hashes are uniform over the full 64-bit space).
  * Insertion is set-semantic, so the state is a pure function of the
  * input SET — order- and partitioning-independent by construction. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def insert(h: Long): Unit = {
    // Skip early when full and h is above the current kth value.
    if (set.size() >= k &&
        java.lang.Long.compareUnsigned(h, set.last()) >= 0) return
    set.add(h)
    if (set.size() > k) set.pollLast()
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  def toSorted: Array[Long] = {
    val out = new Array[Long](set.size())
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** Custom aggregate (SURVEY.md §2.5 agg_kmv): mergeable k-minimum-values
  * ("theta"-style) distinct sketch as a first-class aggregate value.
  *
  * `kmv_agg(xxhash64(x), k)` keeps the k smallest hashes per group —
  * a fixed-size, deterministic, order-independent summary of the DISTINCT
  * set. Unlike HLL (which Spark has built in), bottom-k sketches compose
  * under SET ALGEBRA: union = merge-and-trim, and the intersection /
  * Jaccard of two sets is estimated from the overlap within the union's
  * bottom-k (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07). That is what the cross-source
  * overlap QC in the reference needs (which sources share tokens /
  * identifiers — e.g. the cross-xref audits around loaders/TCRD.py) at
  * 100 TB: one pass builds per-source sketches of a few KB; every
  * pairwise overlap after that is sketch-vs-sketch, never data-vs-data.
  *
  * Determinism: the buffer is a pure function of the input set, so the
  * emitted bytes are identical under any partitioning or merge order —
  * safe for the repo's exact-hash determinism probes.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 1, "kmv_agg: k must be > 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg expects a long hash (wrap the key in xxhash64), got ${t.sql}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buffer: KmvBuffer): Any = serialize(buffer)

  override def serialize(buffer: KmvBuffer): Array[Byte] =
    KmvAgg.toBytes(buffer.k, buffer.toSorted)

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val (k0, vs) = KmvAgg.fromBytes(bytes)
    val b = new KmvBuffer(k0)
    vs.foreach(b.insert)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_agg"
}

object KmvAgg {
  private val Two64 = math.pow(2.0, 64)

  /** kmv_agg(hash, k) as a Column aggregate → binary sketch. `hash` must
    * already be a uniform 64-bit hash (use `xxhash64(key)`). */
  def agg(hash: Column, k: Int = 1024): Column =
    GraftShims.column(KmvAgg(GraftShims.toCatalyst(hash), k).toAggregateExpression())

  /** Layout: k (int32) | n (int32) | n longs ascending-unsigned. */
  def toBytes(k: Int, sorted: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * sorted.length)
    bb.putInt(k).putInt(sorted.length)
    sorted.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    (k, out)
  }

  /** Unsigned long → normalized position in (0, 1]. */
  private def pos(u: Long): Double =
    ((u ^ Long.MinValue).toDouble - Long.MinValue.toDouble) / Two64

  /** Distinct-count estimate: exact when the sketch never saturated
    * (n < k), else the classic (k-1)/pos(kth-min) KMV estimator. */
  def estimateDistinct(bytes: Array[Byte]): Double = {
    val (k, vs) = fromBytes(bytes)
    if (vs.length < k) vs.length.toDouble
    else (k - 1).toDouble / pos(vs(k - 1))
  }

  /** Union sketch: merged bottom-k (k = min of the operand ks). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, va) = fromBytes(a)
    val (kb, vb) = fromBytes(b)
    val buf = new KmvBuffer(math.min(ka, kb))
    va.foreach(buf.insert)
    vb.foreach(buf.insert)
    toBytes(buf.k, buf.toSorted)
  }

  /** (unionEst, intersectEst, jaccardEst) from two sketches: within the
    * union's bottom-k, the fraction of values present in BOTH operands is
    * an unbiased Jaccard estimate; intersection = jaccard × union. */
  def setOps(a: Array[Byte], b: Array[Byte]): (Double, Double, Double) = {
    val u = union(a, b)
    val (_, uv) = fromBytes(u)
    if (uv.isEmpty) return (0.0, 0.0, 0.0)
    val sa = fromBytes(a)._2.toSet
    val sb = fromBytes(b)._2.toSet
    val both = uv.count(v => sa.contains(v) && sb.contains(v))
    val j = both.toDouble / uv.length
    val uEst = estimateDistinct(u)
    (uEst, j * uEst, j)
  }
}

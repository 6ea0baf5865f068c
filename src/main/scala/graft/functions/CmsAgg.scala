package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-min sketch buffer: depth × width long counters. Row i hashes the
  * key with an independent seed; a point query reads the MINIMUM across
  * rows, so estimates only ever OVER-count (est ≥ true, and
  * est ≤ true + εN with prob 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ —
  * Cormode & Muthukrishnan 2005). Addition is commutative/associative, so
  * the state is order- and partitioning-independent by construction. */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  def insert(h: Long, n: Long): Unit = {
    var i = 0
    while (i < depth) {
      counts(i * width + CmsBuffer.slot(h, i, width)) += n
      i += 1
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }

  def estimate(h: Long): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + CmsBuffer.slot(h, i, width))
      if (c < m) m = c
      i += 1
    }
    m
  }
}

object CmsBuffer {
  /** Row-seeded slot: splitmix64 finalizer over (hash ^ seed_i) — full
    * avalanche, so the d rows behave as independent hash functions. */
  def slot(h: Long, row: Int, width: Int): Int = {
    var z = h ^ (0x9e3779b97f4a7c15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (((z % width) + width) % width).toInt
  }
}

/** Custom aggregate (SURVEY.md §2.5 agg_cms): mergeable count-min sketch
  * as a first-class aggregate value.
  *
  * `cms_agg(xxhash64(key), width, depth)` summarizes the FREQUENCY table
  * of a group in fixed memory (depth×width longs — 32 KB at 4×1024),
  * where the exact per-key groupBy would be corpus-cardinality. The
  * complement of the repo's other sketches: KMV answers "how many
  * DISTINCT", TopK keeps exact candidates for the few heaviest, CMS
  * answers "how often does key x occur" for EVERY x in one mergeable
  * pass — the shape a 100 TB per-source token-frequency QC or a
  * streaming heavy-hitter gate needs (partial sketches merge map-side,
  * across partitions, days, or streams).
  *
  * Determinism: counters are longs under addition, so the emitted bytes
  * are identical under any partitioning or merge order — safe for the
  * repo's exact-hash determinism probes.
  */
case class CmsAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(width > 1 && depth >= 1 && depth <= 16,
    "cms_agg: need width > 1 and 1 <= depth <= 16")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_agg expects a long hash (wrap the key in xxhash64), got ${t.sql}")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long], 1L)
    buffer
  }

  override def merge(b1: CmsBuffer, b2: CmsBuffer): CmsBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buffer: CmsBuffer): Any = serialize(buffer)

  override def serialize(buffer: CmsBuffer): Array[Byte] =
    CmsAgg.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_agg"
}

object CmsAgg {
  /** cms_agg(hash, width, depth) as a Column aggregate → binary sketch.
    * `hash` must already be a uniform 64-bit hash (use `xxhash64(key)`). */
  def agg(hash: Column, width: Int = 1024, depth: Int = 4): Column =
    GraftShims.column(CmsAgg(GraftShims.toCatalyst(hash), width, depth)
      .toAggregateExpression())

  /** Layout: depth (int32) | width (int32) | depth*width longs row-major. */
  def toBytes(b: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.counts.length)
    bb.putInt(b.depth).putInt(b.width)
    b.counts.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    val b = new CmsBuffer(d, w)
    var i = 0
    while (i < b.counts.length) { b.counts(i) = bb.getLong; i += 1 }
    b
  }

  /** Point-frequency estimate for a key hash from sketch bytes. */
  def estimate(bytes: Array[Byte], h: Long): Long =
    fromBytes(bytes).estimate(h)

  /** Equi-join cardinality estimate from two sketches over the join key
    * (Cormode & Muthukrishnan 2005, §4.2): |A ⋈ B| = Σ_k fA(k)·fB(k) is
    * estimated by the MINIMUM over rows of the row-wise counter inner
    * product. Each row's product covers every true (k,k) pairing plus
    * non-negative collision noise, so the estimate NEVER under-counts;
    * expected overcount ≈ |A|·|B|/width per row — size width to the
    * product of the table cardinalities, not to either input. */
  def joinSizeEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = fromBytes(a)
    val bb = fromBytes(b)
    require(ba.depth == bb.depth && ba.width == bb.width,
      "cms join estimate: dimension mismatch")
    // saturating accumulation: at planner scale a single hot-key product
    // can exceed Long range (3e9 × 3e9); a wrapped-negative row sum would
    // win the min and report a tiny/negative "never under-counts" value
    var best = Long.MaxValue
    var i = 0
    while (i < ba.depth) {
      var s = 0L
      var j = 0
      while (j < ba.width && s != Long.MaxValue) {
        val x = ba.counts(i * ba.width + j)
        val y = bb.counts(i * ba.width + j)
        val p = if (x != 0 && y > Long.MaxValue / x) Long.MaxValue else x * y
        s = if (s > Long.MaxValue - p) Long.MaxValue else s + p
        j += 1
      }
      if (s < best) best = s
      i += 1
    }
    best
  }

  /** Merge two sketch byte arrays (same dims required). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ba = fromBytes(a)
    val bb = fromBytes(b)
    require(ba.depth == bb.depth && ba.width == bb.width,
      "cms merge: dimension mismatch")
    ba.mergeFrom(bb)
    toBytes(ba)
  }
}

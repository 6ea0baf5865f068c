package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen n-gram hasher: all word-n-gram xxhash64 values of a
  * string in ONE pass over its bytes, zero per-gram allocation.
  *
  * Bit-identical to the declarative pipeline
  * `transform(shingles(split(text, " ")), s => xxhash64(s))` (pinned by
  * NgramHashesSpec): because `split(text, " ")` cuts at EVERY single
  * space, consecutive tokens re-joined with single spaces reconstruct
  * exactly the original byte substring between the token boundaries —
  * so each gram hash is xxhash64 (seed 42, Spark's constant) over a
  * byte RANGE of the input, no substring ever materializes. Fewer than
  * n tokens falls back to hashing the whole string, matching
  * `Dedup.wordShingleHashes`' fallback.
  *
  * Why it exists: the transform/lambda form is CodegenFallback in Spark
  * (interpreted per row), and gram hashing is the first step of EVERY
  * dedup/contamination/novelty scan — the hottest projection in the
  * corpus path. This expression stays inside whole-stage codegen. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "ngram size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_hashes expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NgramHashes.hashes(input.asInstanceOf[UTF8String], n))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.NgramHashes.hashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

object NgramHashes {
  private final val Seed = 42L // Spark's xxhash64 seed

  /** All word-n-gram xxhash64 values (with duplicates, in order). */
  def hashes(str: UTF8String, n: Int): Array[Long] = {
    val base = str.getBaseObject
    val off = str.getBaseOffset
    val len = str.numBytes
    // token boundaries: a token starts at 0 and after every 0x20 byte
    // (safe in UTF-8: no multi-byte sequence contains 0x20)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val ntok = spaces + 1
    if (ntok < n) {
      return Array(XXH64.hashUnsafeBytes(base, off, len, Seed))
    }
    val starts = new Array[Int](ntok) // byte index where token k starts
    val ends = new Array[Int](ntok)   // byte index one past token k's end
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        ends(tok) = i
        tok += 1
        starts(tok) = i + 1
      }
      i += 1
    }
    ends(tok) = len
    val out = new Array[Long](ntok - n + 1)
    var k = 0
    while (k <= ntok - n) {
      val s = starts(k)
      val e = ends(k + n - 1)
      out(k) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      k += 1
    }
    out
  }

  def apply(c: Column, n: Int): Column =
    GraftShims.column(NgramHashes(GraftShims.toCatalyst(c), n))
}

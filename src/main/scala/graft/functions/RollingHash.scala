package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over all n-byte windows of a string
  * (Rabin-Karp): h(i+1) = (h(i) - b(i)*B^(n-1))*B + b(i+n), arithmetic in
  * Long (mod 2^64) — O(len) for all windows, fully deterministic, codegen'd.
  *
  * This is the document-fingerprinting primitive: winnowing (keep the
  * window-min hash) on top of it gives MOSS-style fingerprints whose
  * shared values are near-dup candidate keys (graft.ops.TextAnalysis).
  */
case class RollingHash(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "window must be positive")

  final val Base = 1000003L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(RollingHash.hashes(bytes, n, Base))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.RollingHash.hashes($c.getBytes(), $n, ${Base}L))")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** All n-byte window hashes; empty if the input is shorter than n. */
  def hashes(bytes: Array[Byte], n: Int, base: Long): Array[Long] = {
    val len = bytes.length
    if (len < n) return Array.empty[Long]
    var pow = 1L
    var i = 1
    while (i < n) { pow *= base; i += 1 }
    val out = new Array[Long](len - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * base + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = 0
    while (i < len - n) {
      h = (h - (bytes(i) & 0xffL) * pow) * base + (bytes(i + n) & 0xffL)
      out(i + 1) = h
      i += 1
    }
    out
  }

  def apply(c: Column, n: Int): Column = GraftShims.column(RollingHash(GraftShims.toCatalyst(c), n))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding-similarity operators
  * (SURVEY.md §2.5 expr_cosine).
  *
  * Why a custom Expression instead of zip_with+aggregate builtins: Spark's
  * higher-order functions evaluate their lambda interpreted, one boxed
  * element at a time — on an O(pairs) similarity join that dominated the
  * benchmark (26s for 2M pairs at sf0.1). These expressions participate in
  * whole-stage codegen: a tight primitive double loop, no allocation.
  *
  * Determinism contract (SURVEY.md §5): accumulation is a left fold in
  * index order, and cosine is dot/(sqrt(na)*sqrt(nb)) — the exact shape the
  * DuckDB oracle computes — so results are bit-identical across engines.
  *
  * Arrays are expected non-null-elemented and equal-length (extra elements
  * on the longer side are ignored).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
  }
}

/** dot_product(a, b) = sum_i a(i)*b(i), left fold in index order. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_bands(v) = all `bands` LSH band signatures of vector `v` in
  * ONE pass — sign-of-dot against `bands`·`bits` hyperplanes, bit i of
  * band b set iff v·plane(b·bits+i) > 0 (bit-identical to assembling the
  * same planes with per-plane dot_product + shiftleft, which is what it
  * replaces: at bands·bits = 403 the per-plane form is 403 expression
  * trees each embedding a 64-double literal — a plan-size/codegen cliff
  * that cost the recall-targeted production twins ~5s/query at sf0.1
  * BEFORE any data moved). Planes ride as one reference object (a flat
  * double[]), the generated code is two tight primitive loops, and
  * generated-code size is constant in bands·bits. */
case class HyperplaneBands(child: Expression, planes: Array[Double],
                           bands: Int, bits: Int, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.length == bands * bits * dim,
    s"hyperplane_bands: ${planes.length} plane coords != $bands*$bits*$dim")
  override def prettyName: String = "hyperplane_bands"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val sigs = new Array[Long](bands)
    var p = 0
    while (p < bands * bits) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < n) { dot += v.getDouble(i) * planes(base + i); i += 1 }
      if (dot > 0) sigs(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val sigs = ctx.freshName("sigs")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |long[] $sigs = new long[$bands];
         |for (int $p = 0; $p < ${bands * bits}; $p++) {
         |  double $dot = 0.0;
         |  int $base = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $pl[$base + $i];
         |  }
         |  if ($dot > 0) $sigs[$p / $bits] |= 1L << ($p % $bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the vector expressions. */
object VectorFunctions {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def e(col: Column): Expression = GraftShims.expression(col)

  def dotProduct(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def cosineSim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def hyperplaneBands(v: Column, planes: Array[Array[Double]],
                      bands: Int, bits: Int, dim: Int): Column =
    c(HyperplaneBands(e(v), planes.flatten, bands, bits, dim))
}

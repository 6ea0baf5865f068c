package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the product-quantization ANN path
  * (SURVEY.md §2.4 q_ann_pq).
  *
  * Why not declarative argmin/element_at trees: the m=16 × k=16 encode and
  * the per-probe ADC lookups unroll into ONE projection of thousands of
  * expression nodes after CollapseProject — Janino's 64 KB method limit
  * trips and the whole stage silently falls back to interpreted eval
  * (observed on q_ann_pq at r6). A deeply nested expression tree cannot be
  * split by codegen; a tight generated loop over the broadcast codebook
  * tables can. Both expressions keep the exact float semantics of the
  * declarative forms they replace: left-fold accumulation in index order,
  * strict `>` argmax (ties to the LOWEST centroid id), score =
  * dot(v,c) − ‖c‖²/2, ADC cosine = Σ dotT / (‖q‖·√Σ nrm2T).
  */
abstract class PqExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == expectedElem => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<${expectedElem.simpleString}>, got ${t.sql}")
  }
  protected def expectedElem: DataType
}

/** pq_encode(v) = the m sub-space centroid codes of a vector, as ONE
  * generated triple loop over the driver-fit codebooks (reference objects,
  * not inlined literals). Output array<int> of length m. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
  extends PqExpression {
  override def prettyName: String = "pq_encode"
  override protected def expectedElem: DataType = DoubleType
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** ‖c‖²/2 per (book, centroid), same fold order as the declarative form. */
  private lazy val halfNrm2: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum / 2))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = books.length
    val codes = new Array[Int](m)
    var off = 0
    var j = 0
    while (j < m) {
      val bk = books(j)
      val sub = bk(0).length
      var best = Double.NegativeInfinity
      var bi = 0
      var c = 0
      while (c < bk.length) {
        val cc = bk(c)
        var s = 0.0
        var i = 0
        while (i < sub) { s += v.getDouble(off + i) * cc(i); i += 1 }
        s -= halfNrm2(j)(c)
        if (s > best) { best = s; bi = c }
        c += 1
      }
      codes(j) = bi
      off += sub
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val halfRef = ctx.addReferenceObj("pqHalf", halfNrm2, "double[][]")
      val m = books.length
      val codes = ctx.freshName("codes")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val bk = ctx.freshName("bk")
      val cc = ctx.freshName("cc")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val s = ctx.freshName("s")
      s"""
         |int[] $codes = new int[$m];
         |int $off = 0;
         |for (int $j = 0; $j < $m; $j++) {
         |  double[][] $bk = $booksRef[$j];
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bi = 0;
         |  for (int $c = 0; $c < $bk.length; $c++) {
         |    double[] $cc = $bk[$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $cc.length; $i++) {
         |      $s += $v.getDouble($off + $i) * $cc[$i];
         |    }
         |    $s -= $halfRef[$j][$c];
         |    if ($s > $best) { $best = $s; $bi = $c; }
         |  }
         |  $codes[$j] = $bi;
         |  $off += $bk[0].length;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc(codes) = asymmetric-distance cosine of one probe against a coded
  * vector: Σⱼ dotT[j][codeⱼ] / (qNorm · √Σⱼ nrm2T[j][codeⱼ]). The probe's
  * lookup tables ride as reference objects; per row this is m int reads and
  * 2m table adds — no vector math on the corpus-wide pass. */
case class PqAdc(
    child: Expression,
    dotT: Array[Array[Double]],
    nrm2T: Array[Array[Double]],
    qNorm: Double)
  extends PqExpression {
  override def prettyName: String = "pq_adc"
  override protected def expectedElem: DataType = IntegerType
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < dotT.length) {
      val c = codes.getInt(j)
      num += dotT(j)(c)
      den += nrm2T(j)(c)
      j += 1
    }
    num / (qNorm * math.sqrt(den))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val dotRef = ctx.addReferenceObj("adcDot", dotT, "double[][]")
      val nrmRef = ctx.addReferenceObj("adcNrm2", nrm2T, "double[][]")
      val m = dotT.length
      val num = ctx.freshName("num")
      val den = ctx.freshName("den")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |double $num = 0.0;
         |double $den = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $codes.getInt($j);
         |  $num += $dotRef[$j][$c];
         |  $den += $nrmRef[$j][$c];
         |}
         |${ev.value} = $num / ($qNorm * java.lang.Math.sqrt($den));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the PQ expressions. */
object PqFunctions {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def e(col: Column): Expression = GraftShims.expression(col)

  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    c(PqEncode(e(v), books))
  def pqAdc(codes: Column, dotT: Array[Array[Double]], nrm2T: Array[Array[Double]], qNorm: Double): Column =
    c(PqAdc(e(codes), dotT, nrm2T, qNorm))
}

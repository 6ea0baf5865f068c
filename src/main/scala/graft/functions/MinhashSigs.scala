package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen MinHash signature: all k seeded minimums over a gram-
  * hash array in ONE pass — bit-identical to the declarative form
  * `array((0 until k).map(i => array_min(transform(grams, h => hash(h,
  * lit(i))))))` it replaces (pinned by MinhashSigsSpec), because Spark's
  * `hash(longCol, intLit)` is murmur3 folded left from seed 42:
  * hashInt(i, hashLong(h, 42)).
  *
  * Why it exists (the HyperplaneBands lesson, Jaccard leg): recall-
  * targeted banding pushes k = bands·rows from 64 to 100+, and the
  * declarative form is k expression trees EACH walking the gram array
  * through lambda-function machinery AND recomputing the shared inner
  * hashLong(h, 42) per seed — k× the plan size and ~2× the murmur work.
  * Here the inner hash is computed once per gram, the k-seed fold is two
  * tight primitive loops in ONE expression, and generated-code size is
  * constant in k. */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "minhash signature size must be positive")

  // element type matches hash()'s IntegerType; an EMPTY gram array gives
  // k nulls exactly like array_min over an empty transform result
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<long>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSigs.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinhashSigs {

  /** k seeded murmur minimums of a gram-hash array. Value-identical to
    * the transform/array_min pipeline: per gram the shared inner step is
    * hashLong(gram, 42) (a null gram contributes the untouched seed 42,
    * matching Murmur3Hash's null-skip), then per seed i the outer step
    * hashInt(i, inner); signed-int minimum per seed. */
  def compute(grams: ArrayData, k: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // k nulls
    val mins = new Array[Int](k)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var g = 0
    while (g < n) {
      val inner =
        if (grams.isNullAt(g)) 42
        else org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(grams.getLong(g), 42)
      var i = 0
      while (i < k) {
        val v = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, inner)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column, k: Int): Column =
    GraftShims.column(MinhashSigs(GraftShims.toCatalyst(c), k))
}

package graft

import graft.functions.NgramHashes
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** expr_ngram_hashes: the native codegen gram hasher must be
  * BIT-IDENTICAL to the declarative transform+xxhash64 pipeline it
  * replaces — on the corpus, on adversarial strings (multi-space, empty,
  * short, unicode), and on random token sequences — and must stay
  * inside whole-stage codegen with no fallback. */
class NgramHashesSpec extends SparkSpec {

  /** The declarative reference: shingle strings then xxhash64. */
  private def declarative(textCol: String, n: Int) = {
    val toks = col("__toks")
    val sh = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64(concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array(xxhash64(col(textCol))))
    sh
  }

  private def bothAgree(df: org.apache.spark.sql.DataFrame, textCol: String, n: Int): Boolean = {
    val out = df
      .withColumn("__toks", split(col(textCol), " "))
      .select(declarative(textCol, n).as("want"),
        NgramHashes(col(textCol), n).as("got"))
      .collect()
    out.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("native gram hashes equal the declarative pipeline on the corpus") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    assert(bothAgree(docs, "text", 3))
    assert(bothAgree(docs, "text", 5))
  }

  test("adversarial strings: multi-space, empty, short, trailing space, unicode") {
    import spark.implicits._
    val docs = Seq(
      "", " ", "  ", "one", "one two", "a  b c", "a b c ",
      " leading", "tab\tinside token", "héllo wörld ünïcode grams",
      "a b c d e", "x  y  z").toDF("text")
    assert(bothAgree(docs, "text", 3))
    assert(bothAgree(docs, "text", 1))
    assert(bothAgree(docs, "text", 2))
  }

  test("random token sequences agree for n in 1..4 (property)") {
    import spark.implicits._
    val genText = for {
      nt <- Gen.choose(0, 12)
      toks <- Gen.listOfN(nt, Gen.oneOf("a", "bb", "ccc", "", "ü", "d e".take(1)))
    } yield toks.mkString(" ")
    val prop: Prop = forAll(Gen.listOfN(8, genText), Gen.choose(1, 4)) { (texts, n) =>
      bothAgree(texts.toDF("text"), "text", n)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("the native expression stays inside whole-stage codegen (no fallback)") {
    val df = graft.sources.Tables.documents(spark, TinyDir)
      .select(explode(NgramHashes(col("text"), 3)).as("sh"))
      .groupBy("sh").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val fallbacks = df.queryExecution.optimizedPlan
      .flatMap(_.expressions)
      .flatMap(_.collect { case e: CodegenFallback => e })
    assert(fallbacks.isEmpty, s"fallbacks: $fallbacks")
  }
}

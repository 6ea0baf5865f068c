package graft

import org.apache.spark.sql.functions._

/** The native minhash-signature expression must be BIT-IDENTICAL to the
  * declarative `array_min(transform(grams, h -> hash(h, i)))` pipeline it
  * replaces — the same pin NgramHashesSpec holds for the gram hasher: a
  * native-expression rewrite may never move a single signature value, or
  * every banded candidate set silently shifts. */
class MinhashSigsSpec extends SparkSpec {

  test("native signatures == declarative transform/array_min fold, on the corpus") {
    val k = 20
    val docs = sources.Tables.documents(spark, TinyDir)
    val grams = docs.select(col("doc_id").as("id"),
      functions.NgramHashes(col("text"), 3).as("sh"))
    val native = grams.select(col("id"), functions.MinhashSigs(col("sh"), k).as("sig"))
    val declarative = grams.select(col("id"),
      array((0 until k).map(i =>
        array_min(transform(col("sh"), h => hash(h, lit(i))))): _*).as("sig"))
    val mismatch = native.as("a").join(declarative.as("b"), "id")
      .filter(col("a.sig") =!= col("b.sig"))
      .count()
    assert(mismatch == 0, s"$mismatch docs with differing signatures")
  }

  test("empty gram array gives k nulls (array_min-over-empty semantics); null input stays null") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Long]), (2L, Seq(7L, -3L)))
      .toDF("id", "sh")
      .select(col("id"), functions.MinhashSigs(col("sh"), 4).as("sig"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Any](1) == Seq(null, null, null, null))
    val expect = (0 until 4).map { i =>
      Seq(7L, -3L).map { h =>
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i,
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(h, 42))
      }.min
    }
    assert(rows(1).getSeq[Int](1) == expect)
  }
}

package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class SimHashAggSpec extends SparkSpec {

  /** Declarative reference: per-(doc,token) counts + 64 conditional sums. */
  private def referenceSimhash(dir: String) = {
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i")
    }
    tok.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => shiftleft(when(col(s"b$i") > 0, 1L).otherwise(0L), i))
          .reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  test("one-pass SimHashAgg equals the 64-column declarative formulation") {
    val ref = referenceSimhash(TinyDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.simhashes(
      spark.read.parquet(s"$TinyDir/documents.parquet"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("simhash agg survives partial/merge paths (repartitioned input)") {
    val base = spark.read.parquet(s"$TinyDir/documents.parquet")
    val a = Dedup.simhashes(base.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhashes(base.coalesce(1), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}

package graft

import graft.operators.Events
import graft.ops.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextAndEventsSpec extends SparkSpec {

  test("langid picks the language with most markers") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "xyzzy qwerty plugh")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("unused")
    val t = lower(col("text"))
    val scored = docs.select(col("doc_id"),
      TextAnalysis.enScore(t).as("en"), TextAnalysis.deScore(t).as("de"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(scored(1L)._1 > scored(1L)._2)
    assert(scored(2L)._2 > scored(2L)._1)
    assert(scored(3L) == ((0, 0)))
  }

  test("quality score stays in [0,1] on real docs") {
    val q = TextAnalysis.qQualityScore.fn(spark, TinyDir).collect()
    q.foreach { r =>
      val v = r.getAs[Double]("quality")
      assert(v >= 0.0 && v <= 1.0, s"quality out of range: $v")
    }
  }

  test("token counts: bpe-ish >= whitespace tokens") {
    val t = TextAnalysis.qTokenCount.fn(spark, TinyDir)
    assert(t.filter(col("bpe_tokens") < col("ws_tokens")).isEmpty)
  }

  test("sessionization conserves events and respects the gap") {
    val s = Events.qSessionize.fn(spark, TinyDir)
    val total = s.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, TinyDir).count())
    // session ids are 1..k contiguous per user
    val perUser = s.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"), count(lit(1)).as("c"))
    assert(perUser.filter(col("mn") =!= 1 || col("mx") =!= col("c")).isEmpty)
  }

  test("tumbling window counts conserve events") {
    val w = Events.qTumblingWindow.fn(spark, TinyDir)
    val total = w.agg(sum("cnt")).head().getLong(0)
    assert(total == Tables.events(spark, TinyDir).count())
  }
}

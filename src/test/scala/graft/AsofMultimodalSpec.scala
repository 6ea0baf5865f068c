package graft

import graft.operators.AsofJoin
import graft.ops.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

class AsofMultimodalSpec extends SparkSpec {

  test("leftAsof picks latest prior-or-equal right row, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("k", "lt", "lid")
    val right = Seq((1L, 40L, 7L), (1L, 100L, 8L), (2L, 20L, 9L))
      .toDF("k", "rt", "rid")
    val got = AsofJoin.leftAsof(left, right, "k", "lt", "rt", Seq("rid"))
      .collect().map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong))).toMap
    assert(got(10L) == Some(8L)) // equal time is inclusive
    assert(got(11L) == Some(7L))
    assert(got(12L) == None)     // right row is later than left
  }

  test("asof query: every purchase appears exactly once, gap nonnegative or -1") {
    val a = AsofJoin.qAsofJoin.fn(spark, TinyDir)
    val purchases = graft.sources.Tables.events(spark, TinyDir)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() == purchases)
    assert(a.filter(col("gap_us") < -1).isEmpty)
    assert(a.filter(col("last_click_id") === -1 && col("gap_us") =!= -1).isEmpty)
  }

  test("multimodal features: stub decode is deterministic and total") {
    val f = Multimodal.qMultimodalFeatures.fn(spark, TinyDir)
    val docs = spark.read.parquet(s"$TinyDir/documents.parquet").count()
    assert(f.count() == docs)
    assert(f.filter(col("width") < 1 || col("width") > 64).isEmpty)
    assert(f.filter(length(col("fingerprint")) =!= 32).isEmpty)
  }

  test("frame sampling slices deterministic strided chunks") {
    import spark.implicits._
    val payload = ("x" * 300).getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", frameSize = 64, stride = 2)
      .collect()
    // 300/64 = 4 frames, stride 2 -> indices 0, 2
    assert(frames.map(_.getLong(1)).sorted.sameElements(Array(0L, 2L)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 64))
    val again = Multimodal.sampleFrames(df, "doc_id", "payload", 64, 2).collect()
    assert(frames.map(_.getString(3)).toSet == again.map(_.getString(3)).toSet)
  }

  test("resize stub subsamples to target length deterministically") {
    val in = Array.tabulate(100)(_.toByte)
    val out = Multimodal.resizeStub(in, 10)
    assert(out.length == 10 && out.sameElements(Multimodal.resizeStub(in, 10)))
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 10).length == 2)
  }

  test("lsh ann candidates are a subset of brute-force scored pairs") {
    val brute = Similarity.qAnnTopk.fn(spark, TinyDir)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.qAnnLsh.fn(spark, TinyDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // any lsh candidate that brute force also ranked must agree on cos
    lsh.foreach { case (k, c) =>
      brute.get(k).foreach(bc => assert(bc == c, s"cos mismatch for $k"))
    }
    assert(lsh.map(_._1._1).distinct.forall(_ < 10))
  }
}

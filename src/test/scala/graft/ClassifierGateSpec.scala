package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream_quality_gate: the frozen-model ingest twin of
  * q_quality_classifier (compositionality + model artifact shape). */
class ClassifierGateSpec extends SparkSpec {

  private def doc(id: Long, text: String, lang: String) =
    (id, text, lang, s"src${id % 4}", text.length.toLong)

  test("streamed union == one-shot scoring; verdicts follow the frozen model") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_cgate").toString

    // reference corpus: en speaks alpha-vocabulary, others zeta-vocabulary
    val ref = ((0 until 12).map(i => doc(i, "alpha beta gamma alpha beta", "en")) ++
      (0 until 12).map(i => doc(100 + i, "zeta eta theta zeta eta", if (i % 2 == 0) "de" else "fr")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.ops.PipelineOps4.qualityModel(ref)
      .write.mode("overwrite").parquet(s"$root/model.parquet")

    // tomorrow's crawl: new docs in the same two vocabularies
    val arriving = Seq(
      (200L, "alpha beta gamma beta", "en"),
      (201L, "alpha alpha beta gamma", "de"), // en-vocab page mislabeled de
      (202L, "zeta eta theta eta", "en"), // zeta-vocab page labeled en
      (203L, "zeta zeta eta theta", "fr"),
      (204L, "alpha beta alpha beta", "en"))
    val (b1, b2) = arriving.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String, String)]
    val out = s"$root/out"
    val q = graft.streaming.StreamingOps.classifierGateSink(
        mem.toDF().toDF("doc_id", "text", "lang"),
        s"$root/model.parquet", out)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select("doc_id", "score", "pred", "label").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))).toSet
    val oneShot = graft.ops.PipelineOps4.qualityScoreWith(
        spark.read.parquet(s"$root/model.parquet"),
        arriving.toDF("doc_id", "text", "lang")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))).toSet
    assert(streamed == oneShot,
      s"missing=${(oneShot -- streamed).take(3)} extra=${(streamed -- oneShot).take(3)}")
    assert(streamed.size == 5)

    // the model judges the TEXT, not the claimed lang: the mislabeled
    // en-vocab page passes, the zeta-vocab page labeled 'en' fails
    val pred = streamed.map(t => t._1 -> t._3).toMap
    assert(pred(200L) == 1 && pred(201L) == 1 && pred(204L) == 1)
    assert(pred(202L) == 0 && pred(203L) == 0)

    // and the regioned layout is the overwrite-idempotent convention
    val regions = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part=batch_")).map(_.getName).sorted
    assert(regions.length == 2, regions.mkString(","))
  }

  test("a model refit between micro-batches is picked up by the next batch (mtime invalidation)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_cgate2").toString
    // model A: en == alpha vocabulary; model B: the labels FLIP (en docs
    // speak zeta), so the same page gets opposite verdicts under A and B
    val refA = ((0 until 12).map(i => doc(i, "alpha beta gamma alpha", "en")) ++
      (0 until 12).map(i => doc(100 + i, "zeta eta theta zeta", "de")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val refB = ((0 until 12).map(i => doc(i, "zeta eta theta zeta", "en")) ++
      (0 until 12).map(i => doc(100 + i, "alpha beta gamma alpha", "de")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.ops.PipelineOps4.qualityModel(refA)
      .write.mode("overwrite").parquet(s"$root/model.parquet")
    val page = Seq((300L, "alpha beta alpha gamma", "en"))
    val mem = MemoryStream[(Long, String, String)]
    val out = s"$root/out"
    val q = graft.streaming.StreamingOps.classifierGateSink(
        mem.toDF().toDF("doc_id", "text", "lang"),
        s"$root/model.parquet", out)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(page.toIndexedSeq: _*); q.processAllAvailable()
      // refit lands between batches: whole-directory overwrite bumps mtime
      graft.ops.PipelineOps4.qualityModel(refB)
        .write.mode("overwrite").parquet(s"$root/model.parquet")
      mem.addData(page.map { case (id, t, l) => (id + 1, t, l) }.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val preds = spark.read.parquet(out).select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(preds(300L) == 1, "batch 1 scored under model A: alpha page passes")
    assert(preds(301L) == 0, "batch 2 must see the refit model B: alpha page fails")
  }

  test("one-shot gate on the corpus model matches q_quality_classifier's own scores") {
    // train-on-corpus + score-corpus through the model artifact must equal
    // the one-call classifier (same features, same IRLS, same eta shape)
    val docs = sources.Tables.documents(spark, TinyDir)
    val viaModel = graft.ops.PipelineOps4.qualityScoreWith(
        graft.ops.PipelineOps4.qualityModel(docs), docs).collect().toSeq
    val direct = SparkEntry.queries("q_quality_classifier")(spark, TinyDir)
      .collect().toSeq
    assert(viaModel == direct)
  }
}

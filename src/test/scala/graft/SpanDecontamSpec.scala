package graft

/** q_span_decontam semantics (exact values oracle-pinned; this pins the
  * CROSS-SET discrimination on a planted corpus): only spans shared with
  * a benchmark doc leak — train↔train repeats do not, which is exactly
  * what separates this from q_dedup_substr. */
class SpanDecontamSpec extends SparkSpec {

  // 60 distinctive bytes; boundary chars differ on every side in every
  // doc so the true maximal shared substring is EXACTLY the run (the
  // r10 DedupSubstrSpec lesson: shared surrounding spaces extend it)
  private val Run = "XQWJZKVYPBDGHMNRSTLC" * 3
  private val TrainRun = "KKLLMMNNOOPPQQRRSSTT" * 3

  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_spandecon").toString
    import spark.implicits._
    Seq(
      (1L, s"aaa1-$Run-zzz1 and some benchmark question text follows here", "en", "bench", 100L),
      (100L, s"bbb2_${Run}_yyy2 a crawled page quoting the benchmark item verbatim", "en", "web", 100L),
      (101L, s"ccc3=$TrainRun=xxx3 two train pages sharing their own boilerplate", "en", "web", 100L),
      (102L, s"ddd4+$TrainRun+www4 the other train page with the same boilerplate", "en", "web", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("only benchmark-shared spans leak; train-train repeats do not") {
    val out = SparkEntry.queries("q_span_decontam")(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(100L, 101L, 102L), s"rows: ${out.keySet}")
    assert(out(100L) == ((1L, 60L)), s"100: ${out(100L)} (expected one 60-byte leaked span)")
    // the 60-byte train-train boilerplate is q_dedup_substr's business,
    // not decontamination's
    assert(out(101L) == ((0L, 0L)), s"101: ${out(101L)}")
    assert(out(102L) == ((0L, 0L)), s"102: ${out(102L)}")
  }

  test("strip: the leaked span is excised byte-exactly; clean docs pass through") {
    val texts = graft.sources.Tables.documents(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q_decontam_strip")(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the run sits at bytes [5, 65): cleaned = prefix + suffix around it
    val t100 = texts(100L)
    assert(out(100L) == ((1L, t100.substring(0, 5) + t100.substring(65))), s"100: ${out(100L)}")
    assert(out(101L) == ((0L, texts(101L))), s"101: ${out(101L)}")
    assert(out(102L) == ((0L, texts(102L))), s"102: ${out(102L)}")
  }

  test("span index + streaming screen: frozen suite, streamed union == one-shot") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft_spanidx").toString + "/idx"
    graft.sources.SpanIndex.build(
      Seq((1L, s"aaa1-$Run-zzz1 and some benchmark question text follows here"))
        .toDF("doc_id", "text"), idx)
    val arriving = Seq(
      (100L, s"bbb2_${Run}_yyy2 a crawled page quoting the benchmark item verbatim"),
      (101L, s"ccc3=$TrainRun=xxx3 a page with no benchmark overlap whatsoever"),
      (102L, s"ddd4+$Run+www4 another page quoting the same benchmark item"))
    val out = java.nio.file.Files.createTempDirectory("spanidx_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("spanidx_ck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.spanScreenSink(
        mem.toDF().toDF("doc_id", "text"), idx, out)
      .option("checkpointLocation", ckpt).start()
    val (b1, b2) = arriving.partition(_._1 % 2 == 0)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_leaked_spans", "leaked_bytes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == Map(100L -> ((1L, 60L)), 101L -> ((0L, 0L)), 102L -> ((1L, 60L))),
      s"streamed: $streamed")
    val oneShot = graft.sources.SpanIndex.screen(spark, idx,
        arriving.toDF("doc_id", "text"))
      .select("doc_id", "n_leaked_spans", "leaked_bytes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == oneShot, s"one-shot disagrees: $oneShot")
  }

  test("streaming strip sink: leaked spans excised at ingest, streamed == one-shot, multi-byte safe") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft_stripidx").toString + "/idx"
    graft.sources.SpanIndex.build(
      Seq((1L, s"aaa1-$Run-zzz1 and some benchmark question text follows here"))
        .toDF("doc_id", "text"), idx)
    val arriving = Seq(
      (100L, s"bbb2_${Run}_yyy2 a crawled page quoting the benchmark item verbatim"),
      (101L, s"ccc3=$TrainRun=xxx3 a page with no benchmark overlap whatsoever"),
      // the quote sits between multi-byte characters: the snap must cut
      // whole characters, never leave split-character residue
      (102L, s"日本語のテキスト${Run}続きの文章です — the rest of the page"))
    val out = java.nio.file.Files.createTempDirectory("strip_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("strip_ck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.decontamStripSink(
        mem.toDF().toDF("doc_id", "text"), idx, out)
      .option("checkpointLocation", ckpt).start()
    val (b1, b2) = arriving.partition(_._1 % 2 == 0)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_cut", "clean_text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(streamed(100L)._1 == 1L && !streamed(100L)._2.contains(Run))
    assert(streamed(101L) == ((0L, arriving(1)._2)), "clean doc must pass through untouched")
    assert(streamed(102L)._1 == 1L && !streamed(102L)._2.contains(Run))
    assert(streamed(102L)._2.contains("日本語のテキスト") || streamed(102L)._2.contains("続きの文章"),
      s"multi-byte neighbours must survive whole: ${streamed(102L)._2}")
    // compositional: streamed union == one-shot extents + strip
    val oneShot = {
      val docs = arriving.toDF("doc_id", "text")
      graft.ops.TextAnalysis.stripSpans(docs,
          graft.sources.SpanIndex.extents(spark, idx, docs))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    }
    assert(streamed == oneShot, s"one-shot disagrees")
  }

  test("real corpus: every training doc reports; fractions in [0, 1]") {
    val rows = SparkEntry.queries("q_span_decontam")(spark, TinyDir).collect()
    val train = graft.sources.Tables.documents(spark, TinyDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 25).count()
    assert(rows.length == train)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert((r.getLong(1) == 0) == (r.getLong(2) == 0))
    }
  }
}

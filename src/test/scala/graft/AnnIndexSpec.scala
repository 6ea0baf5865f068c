package graft

import graft.sources.{AnnIndex, Tables => T}
import org.apache.spark.sql.functions._

/** sink_ann_index: build/query roundtrip, equality with the in-memory
  * IVF plan, and the on-disk partition pruning that makes it a serving
  * structure rather than a cached query. */
class AnnIndexSpec extends SparkSpec {

  private def corpus = T.embeddings(spark, TinyDir)
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

  private def probes = corpus.filter(col("id") < 10)
    .select(col("id").as("query_id"), col("v").as("qv"))

  test("build lays out cell directories plus a codebook sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 8)
    val cellDirs = new java.io.File(s"$dir/index").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "no cell=* partition directories")
    val cb = spark.read.parquet(s"$dir/codebook")
    assert(cb.count() <= 8 && cb.count() > 0)
    // every corpus row landed in exactly one cell
    assert(spark.read.parquet(s"$dir/index").count() == corpus.count())
  }

  test("query equals the equivalent in-memory coarse-then-exact plan") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 8)
    val got = AnnIndex.query(spark, dir, probes, nProbe = 4, topK = 5)
      .collect().map(_.toString).toSeq
    // recompute in memory from the SAME persisted assignment (the fit is
    // deterministic, but reading the sidecar pins independence from refit)
    val cents = spark.read.parquet(s"$dir/codebook")
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ccos").desc, col("cid"))
    val probeCells = probes.crossJoin(broadcast(cents))
      .withColumn("ccos", graft.functions.VectorFunctions.cosineSim(col("qv"), col("cv")))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= 4)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    assert(got.nonEmpty)
    // same candidates, same rank rule — but over the FULL (unpruned)
    // index read, so pruning in AnnIndex.query provably loses nothing
    val expRows = spark.read.parquet(s"$dir/index")
      .join(broadcast(probeCells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(graft.functions.VectorFunctions.cosineSim(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rnk", expr("cast(rank() over (partition by query_id order by cos desc, neighbor_id) as long)"))
      .filter(col("rnk") <= 5)
      .orderBy("query_id", "rnk", "neighbor_id")
      .collect().map(_.toString).toSeq
    assert(got == expRows, s"got=${got.size} exp=${expRows.size}")
  }

  test("streaming append lands vectors in the batch-identical cells") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("annidx_ck").toString
    AnnIndex.build(corpus, dir, k = 8)
    val before = AnnIndex.readIndex(spark, dir).count()
    val newVecs = corpus.orderBy("id").limit(3).collect()
      .map(r => (r.getLong(0) + 1000000L, r.getSeq[Double](1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = graft.sources.AnnIndex.appendStream(
      mem.toDF().toDF("id", "v"), dir, ckpt)
    try {
      mem.addData(newVecs.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val after = AnnIndex.readIndex(spark, dir)
    assert(after.count() == before + 3)
    // streamed rows carry the same cell the batch assignment gives them
    val codebook = spark.read.parquet(s"$dir/codebook")
      .select("cid", "cv").orderBy("cid").collect().map(_.getSeq[Double](1).toArray)
    val expected = newVecs.map { case (id, v) => id ->
      spark.createDataset(Seq(v)).toDF("v")
        .select(graft.ops.Similarity.nearestCell(col("v"), codebook).as("c"))
        .head().getLong(0)
    }.toMap
    val got = after.filter(col("id") >= 1000000L)
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(got == expected, s"streamed cells $got != batch cells $expected")
    // compaction folds the stream region into the base and preserves rows
    AnnIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/index_stream").exists(), "stream region not dropped")
    val compacted = AnnIndex.readIndex(spark, dir)
    assert(compacted.count() == before + 3)
    assert(compacted.filter(col("id") >= 1000000L)
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap == expected,
      "compaction moved rows across cells")
    // the index still serves: pruned query over the compacted layout
    assert(AnnIndex.query(spark, dir, probes, nProbe = 4, topK = 5).count() > 0)
  }

  test("persisted PQ codes match re-encoding with the persisted books") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 8)
    val books = AnnIndex.readPqBooks(spark, dir)
    assert(books.length == 16 && books.forall(_.nonEmpty))
    val stored = spark.read.parquet(s"$dir/index")
      .select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val recomputed = corpus
      .select(col("id"), graft.functions.PqFunctions.pqEncode(col("v"), books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored == recomputed, "stored codes diverge from re-encode")
  }

  test("queryAdc: ADC pass reads codes only; re-rank cosines are exact") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 8)
    val df = AnnIndex.queryAdc(spark, dir, probes, nProbe = 4, topK = 5)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-wide ADC stage scans (id, codes) — never the vector column
    assert(plan.contains("ReadSchema: struct<id:bigint,codes:array<int>>"), plan.take(3000))
    val byId = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { r =>
      val expect = BigDecimal(cos(byId(r.getLong(0)), byId(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"row $r exact-cosine mismatch vs $expect")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5)
    }
  }

  test("query prunes unprobed cell directories at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 8)
    val df = AnnIndex.query(spark, dir, probes.limit(1), nProbe = 2, topK = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    assert(plan.contains("cell") && plan.contains(" IN "), plan.take(2000))
  }

  /** A drifted append wave: 3000 vectors in a tight cluster FAR from the
    * corpus — under the frozen codebook they all assign to one old cell
    * (correct, but every probe near them scans that whole cell). */
  private def driftWave = {
    import spark.implicits._
    // jitter wide enough that round-6 cosines stay DISTINCT — a wave of
    // near-identical vectors would make top-k a tie lottery, which is a
    // data pathology, not the drift this test plants
    (10000L until 13000L).map { i =>
      (i, Seq.tabulate(64)(j => 10.0 + math.sin(i * 7.3 + j * 1.7)))
    }.toDF("id", "v")
  }

  test("health metric flags probe-volume drift; swap-protected refit restores it") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(corpus, dir, k = 16)
    val fresh = AnnIndex.healthMetric(spark, dir, nProbe = 2, topK = 5).head
    assert(fresh.getDouble(1) > 0.3 && fresh.getDouble(1) <= 1.0,
      s"fresh recall out of band: $fresh")
    assert(fresh.getDouble(3) < 2.5,
      s"fresh index should probe near the balanced ideal, got $fresh")
    // drift: the wave piles into one frozen cell
    AnnIndex.build(corpus, dir, k = 16) // rebuild clean, then append via union write
    val books = AnnIndex.readPqBooks(spark, dir)
    val codebook = spark.read.parquet(s"$dir/codebook")
      .select("cid", "cv").orderBy("cid").collect().map(_.getSeq[Double](1).toArray)
    driftWave
      .select(col("id"), col("v"),
        graft.functions.PqFunctions.pqEncode(col("v"), books).as("codes"),
        graft.ops.Similarity.nearestCell(col("v"), codebook).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/index")
    val drifted = AnnIndex.healthMetric(spark, dir, nProbe = 2, topK = 5).head
    assert(drifted.getDouble(3) > 3.0,
      s"planted one-cell drift must inflate the pruned read, got $drifted")
    // the policy fires, refits geometry on the current rows, and the
    // balanced pruning comes back
    // minRecall = 0.2: this test plants the INFLATION axis; recall at
    // nProbe=2 of 16 cells legitimately floats with the data's geometry
    assert(AnnIndex.refitIfStale(spark, dir, minRecall = 0.2, nProbe = 2, topK = 5),
      "refitIfStale must fire above the inflation threshold")
    val after = AnnIndex.healthMetric(spark, dir, nProbe = 2, topK = 5).head
    assert(after.getDouble(3) < 2.5,
      s"refit must restore balanced probing, got $after")
    assert(!AnnIndex.refitIfStale(spark, dir, minRecall = 0.2, nProbe = 2, topK = 5),
      "a fresh refit must not re-trigger")
  }

  test("refit crash matrix: readers resolve the live root at every crash point") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString + "/idx"
    AnnIndex.build(corpus, dir, k = 8)
    val before = AnnIndex.query(spark, dir, probes, nProbe = 8, topK = 3)
      .collect().map(_.toString).sorted.toSeq
    for (crashAt <- 1 to 3) {
      intercept[graft.sources.AtomicSwap.CrashPoint] {
        AnnIndex.refit(spark, dir, k = 8, crashAfter = crashAt)
      }
      // whichever side of the swap the crash landed on, a reader sees ONE
      // complete snapshot: same corpus rows, a working query
      assert(AnnIndex.readIndex(spark, dir).count() === corpus.count(),
        s"crash at $crashAt: torn index")
      assert(AnnIndex.query(spark, dir, probes, nProbe = 8, topK = 3).count()
        === before.length, s"crash at $crashAt: query broken")
      // the re-run converges
      AnnIndex.refit(spark, dir, k = 8)
      assert(AnnIndex.readIndex(spark, dir).count() === corpus.count())
    }
    // nProbe = K: the pruned query is exhaustive, so results survive the
    // geometry refresh bit-for-bit
    val afterAll = AnnIndex.query(spark, dir, probes, nProbe = 8, topK = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(afterAll === before, "exhaustive-probe results must survive refits")
  }
}

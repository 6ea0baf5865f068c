package graft

import graft.operators.{Analytics, GraphOps2}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Targeted specs for the round-2 operators (the oracle gate covers their
  * end-to-end results; these pin the algorithmic building blocks). */
class Round2OpsSpec extends SparkSpec {

  test("bucketedRangeJoin equals the naive range join on non-uniform bands") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, TinyDir)
    // deliberately non-uniform: middle band spans several 50k buckets
    val bands = Seq((0L, 0.0, 30000.0), (1L, 30000.0, 150000.0), (2L, 150000.0, 600000.0))
      .toDF("band", "lo", "hi")
    val fast = Analytics.bucketedRangeJoin(orders, col("o_totalprice"), bands, 50000L)
      .select("o_orderkey", "band")
    val naive = orders.crossJoin(bands)
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select("o_orderkey", "band")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === orders.count()) // bands partition the domain
  }

  test("pagerankInt: star center outranks leaves, exact integer ranks") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = GraphOps2.pagerankInt(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) === 150000000000L + 85L * 2000000000000L / 100L) // two full contribs
    assert(pr(2L) === 150000000000L + 85L * 500000000000L / 100L) // half of center's rank
    assert(pr(2L) === pr(3L))
    assert(pr(1L) > pr(2L))
  }

  test("connectedComponents labels min id per component") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = GraphOps2.connectedComponents(edges, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("IVF ANN recalls most of the brute-force top-5") {
    val brute = ops.Similarity.qAnnTopk.fn(spark, SmallDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ops.Similarity.qAnnIvf.fn(spark, SmallDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(s"IVF recall@5 vs brute force: $recall")
    assert(recall >= 0.6, s"IVF recall@5 too low: $recall")
  }

  test("fitted IVF quantizer holds recall on a SKEWED corpus (clustered + outlier mass)") {
    import spark.implicits._
    // 3 tight clusters of very different sizes + a diffuse tail: the
    // first-K-vectors "quantizer" this fit replaced collapses here (all
    // early ids sit in cluster 0), a fitted codebook must not
    val dim = 8
    def mk(id: Long, center: Int, jit: Double): (Long, Seq[Double]) = {
      val base = Array.fill(dim)(0.05)
      base(center) = 1.0
      (id, base.zipWithIndex.map { case (x, i) =>
        x + jit * (((id * 31 + i * 17) % 13).toDouble / 13.0 - 0.5) }.toSeq)
    }
    val rows =
      (0L until 400L).map(i => mk(i, 0, 0.15)) ++          // dominant cluster
      (400L until 480L).map(i => mk(i, 3, 0.15)) ++        // mid cluster
      (480L until 500L).map(i => mk(i, 6, 0.15)) ++        // small cluster
      (500L until 520L).map(i => mk(i, (i % 8).toInt, 0.9)) // diffuse tail
    val corpus = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>"))
    val codebook = ops.Similarity.fitKmeansCodebook(corpus, k = 8, iters = 4)
    assert(codebook.length == 8)
    // assign the full corpus to fitted cells: the dominant cluster must
    // split across multiple cells OR at minimum every real cluster center
    // must map to a distinct cell (no all-in-one-cell collapse)
    val assigned = corpus
      .select(col("id"), ops.Similarity.nearestCell(col("v"), codebook).as("cid"))
    val cellOf = assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusterCells = Seq(0L to 399L, 400L to 479L, 480L to 499L)
      .map(_.map(cellOf).groupBy(identity).maxBy(_._2.size)._1)
    assert(clusterCells.distinct.size == 3,
      s"distinct clusters collapsed into cells $clusterCells")
    // and no single cell holds everything (skew guard for the shuffle)
    val biggest = cellOf.values.groupBy(identity).values.map(_.size).max
    assert(biggest < rows.size * 0.9, s"one cell holds $biggest of ${rows.size}")
  }

  test("kmeansSample bounds the fit's working set regardless of corpus size") {
    import spark.implicits._
    val corpus = spark.range(0, 20000)
      .select(col("id"), array(rand(1), rand(2)).cast("array<double>").as("v"))
      .localCheckpoint(true)
    // sample size tracks maxSample (≈ n/m with m = n/maxSample), never the
    // corpus: at 100 TB this is what keeps the quantizer fit model-sized
    for (cap <- Seq(100L, 1000L)) {
      val got = ops.Similarity.kmeansSample(corpus, cap).count()
      assert(got <= cap * 3 && got >= cap / 3,
        s"cap $cap: sample size $got not within [cap/3, 3*cap]")
    }
    // small corpus (n <= cap) passes through whole
    assert(ops.Similarity.kmeansSample(corpus, 100000L).count() == 20000L)
    // deterministic and partition-invariant: same ids selected however the
    // input is partitioned (the residue filter is a pure projection)
    val a = ops.Similarity.kmeansSample(corpus, 500L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = ops.Similarity.kmeansSample(corpus.repartition(13), 500L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "hash-sample changed under repartitioning")
  }

  test("readJsonLines: explicit schema, malformed lines survive as nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("part0.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "alpha"}
        |{"id": 2, "name": "beta"}
        |not json at all
        |{"id": 4}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = graft.sources.Tables.readJsonLines(spark, f.toString, schema)
    val rows = df.collect()
    assert(rows.length === 4)
    assert(rows.count(r => !r.isNullAt(0)) === 3) // the corrupt line is all-null
    assert(df.filter(col("id") === 4).head().isNullAt(1))
  }

  test("streaming sliding window matches batch semantics (4 windows/event)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, Double, java.sql.Timestamp)]
    val df = mem.toDF().toDF("event_id", "event_type", "value", "ts")
    val q = StreamingOps.slidingCounts(df)
      .writeStream.format("memory").queryName("slide").outputMode("append").start()
    try {
      mem.addData((1L, "click", 2.0, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      mem.addData((2L, "click", 1.0, ts("2024-01-05 00:00:00"))) // advance watermark
      q.processAllAvailable()
      mem.addData((3L, "click", 1.0, ts("2024-01-09 00:00:00")))
      q.processAllAvailable()
      val got = spark.sql("SELECT window_start_us, cnt FROM slide WHERE cnt > 0").collect()
        .map(r => (r.getLong(0), r.getLong(1))).filter(_._1 <= ts("2024-01-01 10:00:00").getTime * 1000)
      // event at 10:00 on Jan 1 belongs to starts 18:00/Dec31 .. 06:00/Jan1 (4 windows)
      assert(got.count(_._2 == 1L) === 4, s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("intersect_count_sorted matches size(array_intersect) incl. codegen path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", graft.functions.SetFunctions.intersectCountSorted(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
    // empty-array edge
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(graft.functions.SetFunctions.intersectCountSorted(col("a"), col("b")))
    assert(e.head().getLong(0) === 0L)
  }

  test("approx quantile sketch stays within 5% of the exact median") {
    // the query ships the oracled exact half + the rank certificate; the
    // certificate must hold on every group
    val rows = operators.Scoring.qApproxQuantile.fn(spark, SmallDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rank_err_ok"),
        s"rank certificate failed for ${r.getString(0)}")
      assert(r.getAs[Long]("cnt") > 0L)
    }
    // the numeric 5% bound on the sketch value itself, recomputed
    // independently of the query
    val agg = graft.sources.Tables.orders(spark, SmallDir)
      .groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"),
        percentile(col("o_totalprice"), lit(0.5)).as("exact"))
      .collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      val approx = r.getDouble(1); val exact = r.getDouble(2)
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact for ${r.getString(0)}")
    }
  }

  test("entropy of a uniform-token doc is log2(n_distinct)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_entropy_probe")
    // reuse the production expression shape via a direct computation
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val n = tf.groupBy("doc_id").agg(sum("c").as("n"))
    val ent = tf.join(n, "doc_id")
      .withColumn("term", (col("c") / col("n")) * log2(col("n") / col("c")))
      .groupBy("doc_id").agg(round(sum("term"), 6).as("entropy"))
      .head().getDouble(1)
    assert(ent === 2.0)
  }
}

package graft

import graft.functions.VecSumAgg
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** agg_vecsum exactness and the embedding QC queries' invariants. */
class EmbedQCSpec extends SparkSpec {

  private def embeds = T.embeddings(spark, TinyDir)
    .select(col("label"), col("embedding").cast("array<double>").as("v"))

  test("vecsum_agg equals the declarative posexplode form, any partitioning") {
    def viaAgg(parts: Int): Map[Int, Seq[Long]] =
      embeds.repartition(parts)
        .groupBy("label").agg(VecSumAgg(col("v"), 64).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val declarative = embeds
      .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(expr("cast(round(x * 1000000) as bigint)")).as("sx"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        val n = rows.head.getLong(3)
        lbl -> (n +: rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
      }
    val a3 = viaAgg(3)
    assert(a3 == viaAgg(13), "vecsum_agg depends on partitioning")
    assert(a3 == declarative, "vecsum_agg diverges from the declarative sums")
  }

  test("q_label_centroid: bounded scores, exhaustive labels, self-consistency") {
    val rows = SparkEntry.queries("q_label_centroid")(spark, TinyDir).collect()
    val nLabels = embeds.select("label").distinct().count()
    assert(rows.length == nLabels)
    assert(rows.map(_.getLong(1)).sum == embeds.count())
    rows.foreach { r =>
      val coh = r.getDouble(2); val sep = r.getDouble(4)
      assert(coh > -1.000001 && coh < 1.000001, s"cohesion $coh out of range")
      assert(sep > -1.000001 && sep < 1.000001, s"separation $sep out of range")
      assert(r.getInt(0) != r.getInt(3), "nearest label must be another label")
    }
  }

  test("streaming centroids are bit-identical to the batch recomputation") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = embeds.limit(40).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val (b1, b2) = rows.splitAt(17)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, Seq[Double])]
    val q = graft.streaming.StreamingOps.centroidStream(mem.toDF().toDF("label", "v"))
      .writeStream.format("memory").queryName("cent_stream").outputMode("complete").start()
    try {
      mem.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM cent_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSet
    val batch = graft.streaming.StreamingOps.centroidStream(
        spark.createDataset(rows.toIndexedSeq).toDF("label", "v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSet
    assert(streamed == batch, "streamed centroids diverge from batch")
  }

  test("q_ann_eval: recall equals the set intersection of its two source queries") {
    val rows = SparkEntry.queries("q_ann_eval")(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    def sets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, TinyDir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = sets("q_ann_topk")
    val lsh = sets("q_ann_lsh")
    assert(rows.map(_.getLong(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val q = r.getLong(0)
      val found = (exact(q) & lsh.getOrElse(q, Set.empty)).size.toLong
      val expected = found.toDouble / exact(q).size
      assert(r.getLong(1) == exact(q).size)
      assert(r.getLong(2) == found)
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"probe $q recall ${r.getDouble(3)} != $expected")
    }
    info(f"q_ann_eval mean recall@5 = ${rows.map(_.getDouble(3)).sum / rows.length}%.3f" +
      " (random tiny-SF vectors: low recall is the honest answer)")
  }

  test("q_embed_outliers: ordinary-norm off-ellipsoid vector ranks first") {
    import spark.implicits._
    // Correlated cloud: v = (t, t+noise, t, t+noise) — coords strongly
    // coupled. The outlier (1, -1, 1, -1) has the SAME norm scale as the
    // cloud (a norm gate passes it) but breaks the correlation structure.
    val cloud = (1 to 400).map { i =>
      val t = math.sin(i * 0.37) // deterministic spread in [-1, 1]
      val e = math.cos(i * 0.91) * 0.05
      (i.toLong, 0, Array(t.toFloat, (t + e).toFloat, t.toFloat, (t - e).toFloat))
    }
    val planted = (999L, 1, Array(1.0f, -1.0f, 1.0f, -1.0f))
    val dir = java.nio.file.Files.createTempDirectory("graft_maha").toString
    (cloud :+ planted).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = graft.ops.EmbedQC.qEmbedOutliers.fn(spark, dir).collect()
    assert(top.head.getLong(0) == 999L,
      s"planted outlier must rank first, got ${top.take(3).toSeq}")
    // and its distance dwarfs the cloud's
    assert(top.head.getDouble(2) > 10 * top(1).getDouble(2),
      s"separation too weak: ${top.take(2).toSeq}")
  }

  test("q_embed_outliers runs on the corpus: 20 rows, non-negative distances") {
    val rows = graft.ops.EmbedQC.qEmbedOutliers.fn(spark, TinyDir).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getDouble(2) >= 0.0))
    // sorted descending
    val ds = rows.map(_.getDouble(2)).toSeq
    assert(ds == ds.sorted.reverse)
  }

  test("q_embed_sanity: clean synthetic corpus audits clean") {
    val rows = SparkEntry.queries("q_embed_sanity")(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, "n_wrong_dim")
      assert(r.getLong(3) == 0L, "n_nonfinite")
      assert(r.getLong(4) == 0L, "n_zero")
      assert(r.getDouble(5) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(7),
        "norm envelope min <= avg <= max")
    }
  }
}

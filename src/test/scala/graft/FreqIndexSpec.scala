package graft

import graft.sources.FreqIndex
import org.apache.spark.sql.functions._

/** sink_freq_index: per-partition CMS sidecar — probes never scan data,
  * estimates cover exact counts, the global answer is the byte-merge of
  * partition sketches, and appends leave existing sidecar rows
  * byte-identical (the no-replay maintenance contract). */
class FreqIndexSpec extends SparkSpec {

  private def tokens = graft.sources.Tables.documents(spark, TinyDir)
    .select(col("source"), explode(split(col("text"), " ")).as("token"))

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_freq").toString + "/t"

  test("probe estimates cover exact per-partition and global counts") {
    val dir = freshDir()
    FreqIndex.writeWithFreqIndex(tokens, dir, "source", "token")
    val probeKeys = Seq("the", "data", "of")
    val est = FreqIndex.probe(spark, dir, probeKeys).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = tokens.filter(col("token").isin(probeKeys: _*))
      .groupBy("source", "token").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    val n = tokens.count()
    val epsN = math.ceil(math.E / 1024 * n).toLong + 1
    for (((k, p), e) <- est if p != "*") {
      val x = exact.getOrElse((k, p), 0L)
      assert(e >= x, s"($k,$p) under-counted: $e < $x")
      assert(e <= x + epsN, s"($k,$p) overcount ${e - x} > εN")
    }
    // global row covers the summed exact count
    for (k <- probeKeys) {
      val x = exact.collect { case ((`k`, _), v) => v }.sum
      assert(est((k, "*")) >= x && est((k, "*")) <= x + epsN,
        s"global $k: est=${est((k, "*"))} exact=$x")
    }
  }

  test("probe reads only the sidecar, never the data files") {
    val dir = freshDir()
    FreqIndex.writeWithFreqIndex(tokens, dir, "source", "token")
    // the probe is driver-side over collected sidecar rows; prove the
    // sidecar read itself is the only file access under the table path
    val sideFiles = spark.read.parquet(s"$dir/_freq_index").inputFiles
    assert(sideFiles.nonEmpty && sideFiles.forall(_.contains("_freq_index")))
    val est = FreqIndex.probe(spark, dir, Seq("the"))
    assert(est.collect().nonEmpty)
  }

  test("append adds one sidecar row, leaves old rows byte-identical, extends probes") {
    import spark.implicits._
    val dir = freshDir()
    val base = Seq(("srcA", "x"), ("srcA", "x"), ("srcB", "y"))
      .toDF("source", "token")
    FreqIndex.writeWithFreqIndex(base, dir, "source", "token", width = 64)
    val before = spark.read.parquet(s"$dir/_freq_index")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val batch = Seq(("srcC", "x"), ("srcC", "z")).toDF("source", "token")
    // dims come from the existing sidecar, NOT from append-time args —
    // a width-64 table stays width-64 whatever the caller would pass
    FreqIndex.appendPartition(batch, dir, "source", "token")
    val after = spark.read.parquet(s"$dir/_freq_index")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(after.keySet == before.keySet + "srcC")
    before.foreach { case (p, bytes) =>
      assert(after(p) == bytes, s"existing sidecar row $p was rewritten")
    }
    val est = FreqIndex.probe(spark, dir, Seq("x")).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(est("srcC") >= 1L && est("*") >= 3L, est.toString)
    // the appended DATA is also visible
    assert(spark.read.parquet(dir).count() == 5L)
    // and the appended sketch inherited the WRITER's width-64 dims
    val dims = graft.functions.CmsAgg.fromBytes(
      spark.read.parquet(s"$dir/_freq_index").filter(col("part") === "srcC")
        .select("cms").head().getAs[Array[Byte]](0))
    assert(dims.width == 64 && dims.depth == 4, s"${dims.depth}x${dims.width}")
  }

  test("rebuild crash points never expose a torn data/sidecar pair") {
    import spark.implicits._
    val dir = freshDir()
    val v1 = Seq(("srcA", "x"), ("srcA", "x")).toDF("source", "token")
    FreqIndex.writeWithFreqIndex(v1, dir, "source", "token", width = 64)
    val v2 = Seq(("srcA", "x"), ("srcA", "x"), ("srcA", "x"), ("srcB", "x"))
      .toDF("source", "token")
    for (crashAt <- 1 to 3) {
      val d2 = freshDir()
      FreqIndex.writeWithFreqIndex(v1, d2, "source", "token", width = 64)
      intercept[graft.sources.AtomicSwap.CrashPoint] {
        FreqIndex.writeWithFreqIndex(v2, d2, "source", "token", width = 64,
          crashAfter = crashAt)
      }
      // whatever snapshot is live, its sidecar must cover ITS OWN data:
      // est("x") >= exact count of x in the live data dir
      val root = FreqIndex.liveRoot(spark, d2)
      val exact = spark.read.parquet(root).filter(col("token") === "x").count()
      val est = FreqIndex.probe(spark, d2, Seq("x")).collect()
        .collectFirst { case r if r.getString(1) == "*" => r.getLong(2) }.get
      assert(est >= exact,
        s"crash@$crashAt: torn pair — sidecar est $est < live data exact $exact")
      assert(exact == 2L || exact == 4L, s"crash@$crashAt: torn data dir ($exact rows)")
    }
  }

  test("append refuses while a crashed rebuild's swap is pending (backup is live)") {
    import spark.implicits._
    val dir = freshDir()
    val v1 = Seq(("srcA", "x")).toDF("source", "token")
    FreqIndex.writeWithFreqIndex(v1, dir, "source", "token", width = 64)
    // crash the rebuild at step 2: cur renamed away, _prev is the only copy
    intercept[graft.sources.AtomicSwap.CrashPoint] {
      FreqIndex.writeWithFreqIndex(v1, dir, "source", "token", width = 64,
        crashAfter = 2)
    }
    assert(FreqIndex.liveRoot(spark, dir).endsWith("_prev"), "scenario setup")
    // appending now would write into the backup the rebuild's re-run deletes
    val ex = intercept[IllegalArgumentException] {
      FreqIndex.appendPartition(
        Seq(("srcB", "y")).toDF("source", "token"), dir, "source", "token")
    }
    assert(ex.getMessage.contains("append refused"), ex.getMessage)
  }

  test("append crash between sidecar and data only ever OVER-counts") {
    import spark.implicits._
    val dir = freshDir()
    FreqIndex.writeWithFreqIndex(
      Seq(("srcA", "x")).toDF("source", "token"), dir, "source", "token", width = 64)
    intercept[graft.sources.AtomicSwap.CrashPoint] {
      FreqIndex.appendPartition(
        Seq(("srcB", "x"), ("srcB", "x")).toDF("source", "token"),
        dir, "source", "token", crashBeforeData = true)
    }
    val exact = spark.read.parquet(FreqIndex.liveRoot(spark, dir))
      .filter(col("token") === "x").count()
    val est = FreqIndex.probe(spark, dir, Seq("x")).collect()
      .collectFirst { case r if r.getString(1) == "*" => r.getLong(2) }.get
    assert(exact == 1L, "data must NOT contain the crashed batch")
    assert(est >= exact, s"under-count after crash: $est < $exact")
    assert(est >= 3L, "sidecar should already count the staged batch (over-count side)")
  }

  test("numeric key columns probe correctly via string-normalized hashing") {
    import spark.implicits._
    val dir = freshDir()
    val data = Seq((1L, 42L), (1L, 42L), (1L, 7L), (2L, 42L))
      .toDF("day", "order_key")
    FreqIndex.writeWithFreqIndex(data, dir, "day", "order_key", width = 64)
    val est = FreqIndex.probe(spark, dir, Seq("42", "7")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est(("42", "1")) >= 2L && est(("42", "2")) >= 1L && est(("42", "*")) >= 3L,
      s"numeric key under-counted: $est")
    assert(est(("7", "1")) >= 1L, est.toString)
  }
}

package graft

import graft.sources.{Tables => T, ZoneIndex}
import org.apache.spark.sql.functions._

/** sink_zone_index: range lookups match full scans, prune files on the
  * clustered column, and never lose rows on secondary columns. */
class ZoneIndexSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_zone").toFile.getAbsolutePath
    val o = T.orders(spark, TinyDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ZoneIndex.writeWithZoneIndex(o, s"$d/o", "o_orderkey",
      nFiles = 8, extraCols = Seq("o_totalprice"))
    d
  }

  private def nFilesTotal: Long = spark.read.parquet(s"$dir/o")
    .select(input_file_name()).distinct().count()

  test("zone range lookup on the clustered column matches full scan and prunes") {
    val full = spark.read.parquet(s"$dir/o")
    val (lo, hi) = (1000.0, 1400.0)
    val (hits, scanned) = ZoneIndex.rangeLookup(spark, s"$dir/o", "o_orderkey", lo, hi)
    val expected = full.filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
    assert(hits.count() == expected.count(), "zone lookup != full scan")
    assert(hits.agg(sum("o_custkey")).head().getLong(0) ==
      expected.agg(sum("o_custkey")).head().getLong(0))
    // range-clustered layout → a narrow range touches a strict subset
    assert(scanned.nonEmpty && scanned.length < nFilesTotal,
      s"scanned ${scanned.length}/$nFilesTotal files — no pruning")
  }

  test("zone lookup on a secondary column is correct (prunes only if correlated)") {
    val full = spark.read.parquet(s"$dir/o")
    val (lo, hi) = (0.0, 5000.0)
    val (hits, scanned) = ZoneIndex.rangeLookup(spark, s"$dir/o", "o_totalprice", lo, hi)
    val expected = full.filter(col("o_totalprice") >= lo && col("o_totalprice") <= hi)
    assert(hits.count() == expected.count(), "secondary-column lookup != full scan")
    assert(scanned.length <= nFilesTotal)
  }

  test("disjoint range scans zero files; all-covering range scans all") {
    val (miss, scannedMiss) = ZoneIndex.rangeLookup(
      spark, s"$dir/o", "o_orderkey", -5000.0, -1.0)
    assert(miss.count() == 0 && scannedMiss.isEmpty)
    val (all, scannedAll) = ZoneIndex.rangeLookup(
      spark, s"$dir/o", "o_orderkey", 0.0, 1e12)
    assert(all.count() == spark.read.parquet(s"$dir/o").count())
    assert(scannedAll.length == nFilesTotal)
  }

  test("sidecar NDV: scan-free distinct estimates, exact under k, union-composable") {
    // whole-table NDV of the clustered key: every key distinct, well under
    // k=1024 per file, so per-file sketches are exact and the merged
    // estimate of the full range tracks the true count closely
    val exact = spark.read.parquet(s"$dir/o")
      .select(countDistinct(col("o_orderkey"))).head().getLong(0)
    val (estAll, filesAll) = ZoneIndex.estimateDistinctInRange(
      spark, s"$dir/o", "o_orderkey", Double.MinValue, Double.MaxValue)
    assert(filesAll == nFilesTotal)
    assert(math.abs(estAll - exact) / exact < 0.15,
      s"full-range NDV est $estAll vs exact $exact")
    // a narrow key range reads a strict subset of sidecar rows and its
    // estimate is bounded by (subrange exact) <= est <= (touched files' rows)
    val (lo, hi) = (1000.0, 1400.0)
    val subExact = spark.read.parquet(s"$dir/o")
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
      .select(countDistinct(col("o_orderkey"))).head().getLong(0)
    val (estSub, filesSub) = ZoneIndex.estimateDistinctInRange(
      spark, s"$dir/o", "o_orderkey", lo, hi)
    assert(filesSub < filesAll, "no sidecar pruning for the subrange")
    assert(estSub >= subExact * 0.85,
      s"subrange NDV est $estSub below exact $subExact")
    // deterministic: same sidecar, same answer
    assert(ZoneIndex.estimateDistinctInRange(
      spark, s"$dir/o", "o_orderkey", lo, hi) == ((estSub, filesSub)))
    // secondary column NDV also answerable (few distinct prices repeat
    // rarely; estimate must stay within 15% of exact)
    val exactP = spark.read.parquet(s"$dir/o")
      .select(countDistinct(col("o_totalprice"))).head().getLong(0)
    val (estP, _) = ZoneIndex.estimateDistinctInRange(
      spark, s"$dir/o", "o_totalprice", Double.MinValue, Double.MaxValue)
    assert(math.abs(estP - exactP) / exactP < 0.15,
      s"price NDV est $estP vs exact $exactP")
  }

  test("NDV works for a STRING column: null zones contribute their sketches") {
    val d = java.nio.file.Files.createTempDirectory("graft_zone_str").toFile.getAbsolutePath
    val c = T.customer(spark, TinyDir).select("c_custkey", "c_mktsegment")
    ZoneIndex.writeWithZoneIndex(c, s"$d/c", "c_custkey",
      nFiles = 4, extraCols = Seq("c_mktsegment"))
    // a string column casts to NULL zmin/zmax — its zone rows must still
    // contribute their KMV sketches instead of vanishing through a
    // three-valued range comparison
    val (est, files) = ZoneIndex.estimateDistinctInRange(
      spark, s"$d/c", "c_mktsegment", Double.MinValue, Double.MaxValue)
    val exact = c.select(countDistinct(col("c_mktsegment"))).head().getLong(0)
    assert(files > 0, "string-column zone rows were dropped")
    assert(est == exact.toDouble, s"segment NDV $est vs exact $exact (under k => exact)")
  }

  test("refreshIncremental: appended files statted O(delta), lookups and NDV stay exact") {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft_zone_incr").toFile.getAbsolutePath
    val o = T.orders(spark, TinyDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val half = o.filter(col("o_orderkey") % 2 === 0)
    ZoneIndex.writeWithZoneIndex(half, s"$d/o", "o_orderkey",
      nFiles = 4, extraCols = Seq("o_totalprice"))
    val sideBefore = spark.read.parquet(s"$d/o/_zone_index")
      .collect().map(r => (r.getAs[String]("file"), r.getAs[String]("col")) -> r.getAs[Double]("zmax")).toMap
    // new data lands as plain appended part files (a streaming batch)
    o.filter(col("o_orderkey") % 2 === 1).coalesce(2)
      .write.mode("append").parquet(s"$d/o")
    val statted = ZoneIndex.refreshIncremental(spark, s"$d/o")
    assert(statted >= 1, "no new files detected")
    // original sidecar rows untouched
    val sideAfter = spark.read.parquet(s"$d/o/_zone_index")
      .collect().map(r => (r.getAs[String]("file"), r.getAs[String]("col")) -> r.getAs[Double]("zmax")).toMap
    sideBefore.foreach { case (k, v) => assert(sideAfter(k) == v, s"row $k changed") }
    assert(sideAfter.size == sideBefore.size + statted * 2) // 2 covered cols
    // lookups over the refreshed sidecar see ALL rows (old + appended)
    val (hits, _) = ZoneIndex.rangeLookup(spark, s"$d/o", "o_orderkey",
      Double.MinValue, Double.MaxValue)
    assert(hits.count() == o.count(), "refreshed lookup lost rows")
    // NDV over the full range now covers appended keys (all keys distinct,
    // under k → sketches exact)
    val (est, _) = ZoneIndex.estimateDistinctInRange(
      spark, s"$d/o", "o_orderkey", Double.MinValue, Double.MaxValue)
    val exact = o.select(countDistinct(col("o_orderkey"))).head().getLong(0)
    assert(math.abs(est - exact) / exact < 0.15, s"NDV $est vs $exact")
    // idempotent: nothing new → nothing statted, sidecar unchanged
    assert(ZoneIndex.refreshIncremental(spark, s"$d/o") == 0)
    assert(spark.read.parquet(s"$d/o/_zone_index").count() == sideAfter.size)
  }
}

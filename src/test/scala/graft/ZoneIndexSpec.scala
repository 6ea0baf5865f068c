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
}

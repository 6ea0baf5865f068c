package graft

import graft.sources.{FileIndex, SidecarStats, ZoneIndex, Tables => T}
import org.apache.spark.sql.functions._

/** Sketch-backed catalog statistics (SURVEY.md §2.5 conf_sidecar_stats)
  * + incremental bloom-sidecar maintenance: the zone sidecar is the
  * write-path ANALYZE, and its fold must (a) never read a data file,
  * (b) be exact where ANALYZE is exact, (c) land in the catalog slot
  * CBO actually consumes. */
class SidecarStatsSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def writeIndexed(dir: String): Unit = {
    val li = T.lineitem(spark, TinyDir)
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_returnflag")
    ZoneIndex.writeWithZoneIndex(li, dir, "l_orderkey", 8,
      Seq("l_suppkey", "l_quantity", "l_returnflag"))
  }

  test("tableStats: exact rows/nulls/min/max, NDV within 10%, string col covered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs").toFile.getAbsolutePath
    writeIndexed(s"$dir/li")
    val li = spark.read.parquet(s"$dir/li")
    val st = SidecarStats.tableStats(spark, s"$dir/li")
    val n = li.count()
    for (c <- Seq("l_orderkey", "l_suppkey", "l_quantity")) {
      assert(st(c).rows == n, s"$c rows")
      assert(st(c).nulls == 0L, s"$c nulls")
      val Array(mn, mx) = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      assert(st(c).min.contains(mn) && st(c).max.contains(mx), s"$c bounds $st")
      val exact = li.select(c).distinct().count()
      assert(math.abs(st(c).ndv - exact) <= math.max(1L, exact / 10),
        s"$c ndv ${st(c).ndv} vs exact $exact")
    }
    // string column: no numeric zones, but NDV + null stats fully valid
    assert(st("l_returnflag").min.isEmpty && st("l_returnflag").max.isEmpty)
    assert(st("l_returnflag").ndv == 3L, st("l_returnflag").toString)
  }

  test("the fold is scan-free: stats computable after the data files are gone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs2").toFile.getAbsolutePath
    writeIndexed(s"$dir/li")
    val before = SidecarStats.tableStats(spark, s"$dir/li")
    // delete every data file, keep only the sidecar — any fold that
    // touches the data now throws FileNotFound
    val d = new java.io.File(s"$dir/li")
    d.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
      .foreach(f => assert(f.delete()))
    val after = SidecarStats.tableStats(spark, s"$dir/li")
    assert(after == before, "stats changed after data deletion — fold read data files")
  }

  test("registerWithStats: catalog row count + filter selectivity reach the plan with NO ANALYZE") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs3").toFile.getAbsolutePath
    writeIndexed(s"$dir/li")
    spark.sql("DROP TABLE IF EXISTS scs_li")
    val injected = SidecarStats.registerWithStats(spark, s"$dir/li", "scs_li")
    val actual = spark.read.parquet(s"$dir/li").count()
    assert(injected.rowCount.contains(BigInt(actual)))
    withConf("spark.sql.cbo.enabled" -> "true") {
      val scanStats = spark.table("scs_li").queryExecution.optimizedPlan.stats
      assert(scanStats.rowCount.contains(BigInt(actual)),
        s"catalog rowCount ${scanStats.rowCount} != $actual")
      // min/max made it into the catalog: a range filter's estimate
      // shrinks instead of degrading to the no-stats guess
      val full = spark.table("scs_li").queryExecution.optimizedPlan.stats.rowCount.get
      val filtered = spark.table("scs_li").filter(col("l_quantity") > 25)
        .queryExecution.optimizedPlan.stats.rowCount.get
      assert(filtered < full, s"selectivity ignored: $filtered vs $full")
      assert(filtered > 0, "filter estimated empty — min/max injected wrong")
    }
    spark.sql("DROP TABLE IF EXISTS scs_li")
  }

  test("sidecar NDV parity with ANALYZE's distinct counts (the CBO input)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs4").toFile.getAbsolutePath
    writeIndexed(s"$dir/li")
    spark.sql("DROP TABLE IF EXISTS scs_ndv")
    SidecarStats.registerWithStats(spark, s"$dir/li", "scs_ndv")
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("scs_ndv"))
    val colStats = cat.stats.get.colStats
    val exact = spark.read.parquet(s"$dir/li")
      .select(countDistinct("l_suppkey")).collect().head.getLong(0)
    val ndv = colStats("l_suppkey").distinctCount.get
    assert((ndv - BigInt(exact)).abs <= BigInt(math.max(1L, exact / 10)),
      s"catalog NDV $ndv vs exact $exact")
    spark.sql("DROP TABLE IF EXISTS scs_ndv")
  }

  test("exchange sizing helpers are scan-free and sane") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs5").toFile.getAbsolutePath
    writeIndexed(s"$dir/li")
    val bytes = SidecarStats.dataBytes(spark, s"$dir/li")
    assert(bytes > 0)
    // tiny table, huge target → 1 partition; 1-byte target → #bytes partitions
    assert(SidecarStats.suggestedShufflePartitions(spark, s"$dir/li") == 1)
    assert(SidecarStats.suggestedShufflePartitions(spark, s"$dir/li", 1L) == bytes)
    val p = SidecarStats.suggestedAggPartitions(spark, s"$dir/li", "l_suppkey", 2L)
    val ndv = SidecarStats.tableStats(spark, s"$dir/li")("l_suppkey").ndv
    assert(p == math.ceil(ndv / 2.0).toInt, s"agg partitions $p for ndv $ndv")
  }

  test("bloom refreshIncremental: appended files indexed O(delta), lookups stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs6").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir).select("l_suppkey", "l_orderkey")
    val mid = li.agg(percentile_approx(col("l_suppkey"), lit(0.5), lit(100)))
      .head().getLong(0)
    val loKeys = li.filter(col("l_suppkey") <= mid)
    val hiKeys = li.filter(col("l_suppkey") > mid)
    assert(hiKeys.count() > 0, s"empty append half (median $mid) — test premise broken")
    FileIndex.writeWithBloomIndex(loKeys, s"$dir/li", "l_suppkey",
      nFiles = 4, expectedPerFile = 10000L)
    // nothing new → no-op, idempotent
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 0)
    val rowsBefore = spark.read.parquet(s"$dir/li/_bloom_index").count()
    def dataFiles(): Long = spark.read.parquet(s"$dir/li")
      .select(input_file_name()).distinct().count()
    val filesBefore = dataFiles()
    // append-ingest the high keys, then refresh the sidecar
    hiKeys.repartition(3, col("l_suppkey"))
      .write.mode("append").parquet(s"$dir/li")
    val freshFiles = dataFiles() - filesBefore
    val statted = FileIndex.refreshIncremental(spark, s"$dir/li")
    assert(freshFiles >= 1 && statted == freshFiles,
      s"statted $statted of $freshFiles fresh files")
    assert(spark.read.parquet(s"$dir/li/_bloom_index").count() == rowsBefore + freshFiles)
    // a key that lives only in the appended region is found, with skipping
    val k = hiKeys.select("l_suppkey").head().getLong(0)
    val (hits, scanned) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", k)
    val expected = spark.read.parquet(s"$dir/li").filter(col("l_suppkey") === k).count()
    assert(expected > 0 && hits.count() == expected)
    val total = spark.read.parquet(s"$dir/li")
      .select(input_file_name()).distinct().count()
    assert(scanned.length < total, s"scanned ${scanned.length}/$total — no skipping")
    // second refresh: nothing new again
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 0)
  }
}

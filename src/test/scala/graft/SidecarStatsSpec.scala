package graft

import graft.sources.{FileIndex, SidecarStats, ZoneIndex, Tables => T}
import org.apache.spark.sql.functions._

/** Sketch-backed catalog statistics (SURVEY.md §2.5 conf_sidecar_stats)
  * + incremental bloom-sidecar maintenance: the zone sidecar is the
  * write-path ANALYZE, and its fold must (a) never read a data file,
  * (b) be exact where ANALYZE is exact, (c) land in the catalog slot
  * CBO actually consumes. */
class SidecarStatsSpec extends SparkSpec {

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

  test("sidecar stats flip the physical join: selective filter broadcasts, no stats sort-merges") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft_scs9").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir)
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")
    ZoneIndex.writeWithZoneIndex(li, s"$dir/dim", "l_orderkey", 8,
      Seq("l_suppkey", "l_quantity"))
    spark.sql("DROP TABLE IF EXISTS scs_dim")
    SidecarStats.registerWithStats(spark, s"$dir/dim", "scs_dim")
    val fact = T.lineitem(spark, TinyDir).select("l_orderkey", "l_partkey")
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    def joined(dim: org.apache.spark.sql.DataFrame) = fact.join(
      // range predicate: only column min/max stats can see it's selective
      dim.filter(col("l_orderkey") > maxKey - 2), Seq("l_orderkey"))
    def joinNodes(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val plan = df.queryExecution.executedPlan
      def count[T](p: org.apache.spark.sql.execution.SparkPlan)(pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Int =
        p.collect(pf).size + p.subqueries.map(count(_)(pf)).sum
      (count(plan) { case b: BroadcastHashJoinExec => b },
        count(plan) { case s: SortMergeJoinExec => s })
    }
    withConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false", // read the static planner's choice
      // between the filtered stats estimate (tiny) and the dim's file
      // size (well above): only stats-based selectivity can go under
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      assert(SidecarStats.dataBytes(spark, s"$dir/dim") > 4096,
        "test premise broken: dim files smaller than the threshold")
      val (bhjStats, smjStats) = joinNodes(joined(spark.table("scs_dim")))
      assert(bhjStats == 1 && smjStats == 0,
        s"with sidecar stats expected broadcast join, got bhj=$bhjStats smj=$smjStats")
      // identical plan WITHOUT catalog stats: file-size estimate stays
      // above the threshold → shuffle join. The stats are load-bearing.
      val (bhjRaw, smjRaw) = joinNodes(joined(spark.read.parquet(s"$dir/dim")))
      assert(bhjRaw == 0 && smjRaw == 1,
        s"without stats expected sort-merge join, got bhj=$bhjRaw smj=$smjRaw")
      // and the result is the same rows either way
      assert(joined(spark.table("scs_dim")).count() ==
        joined(spark.read.parquet(s"$dir/dim")).count())
    }
    spark.sql("DROP TABLE IF EXISTS scs_dim")
  }

  test("indexedAppendSink: streaming batches land in batch dirs, sidecar fresh mid-stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_scs7").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir).select("l_suppkey", "l_orderkey")
    // bootstrap: indexed base region
    FileIndex.writeWithBloomIndex(li.filter(col("l_suppkey") <= 3), s"$dir/li",
      "l_suppkey", nFiles = 2, expectedPerFile = 10000L)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = graft.streaming.StreamingOps.indexedAppendSink(
      mem.toDF().toDF("l_suppkey", "l_orderkey"), s"$dir/li",
      Seq(FileIndex.refreshIncremental(_, _)))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((100L, 1L), (100L, 2L), (101L, 3L))
      q.processAllAvailable()
      // sidecar already knows batch 0: the streamed-only key is found
      val (h0, scanned0) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", 100L)
      assert(h0.count() == 2, "streamed rows not visible via the sidecar")
      mem.addData((102L, 4L))
      q.processAllAvailable()
      val (h1, _) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", 102L)
      assert(h1.count() == 1)
      // every data file (flat base + both batch dirs) has a sidecar row
      val disk = graft.sources.SidecarLayout.dataFiles(spark, s"$dir/li")
        .map(_.getPath.getName).toSet
      val side = spark.read.parquet(s"$dir/li/_bloom_index")
        .select("file").collect()
        .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)).toSet
      assert(side == disk, s"sidecar/disk drift: ${side.diff(disk)} vs ${disk.diff(side)}")
      // base keys still found with skipping across the mixed layout
      val (hb, scannedB) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", 1L)
      assert(hb.count() == li.filter(col("l_suppkey") === 1L).count())
      assert(scannedB.length < disk.size, "no skipping across mixed layout")
      assert(scanned0.length < disk.size)
    } finally q.stop()
  }

  test("compactSwap: streamed batch dirs fold back to flat, sidecar minimal, prev = backup") {
    import graft.sources.SidecarLayout
    val dir = java.nio.file.Files.createTempDirectory("graft_scs10").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir).select("l_suppkey", "l_orderkey")
    FileIndex.writeWithBloomIndex(li.filter(col("l_suppkey") <= 3), s"$dir/li",
      "l_suppkey", nFiles = 2, expectedPerFile = 10000L)
    // two streamed batches + refresh (the indexedAppendSink layout)
    li.filter(col("l_suppkey") === 4L).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/li/batch_id=0")
    li.filter(col("l_suppkey") === 5L).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/li/batch_id=1")
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 2)
    val before = SidecarLayout.readData(spark, s"$dir/li")
      .orderBy("l_suppkey", "l_orderkey").collect().toSeq
    val n = SidecarLayout.compactSwap(spark, s"$dir/li", (df, next) =>
      FileIndex.writeWithBloomIndex(df, next, "l_suppkey",
        nFiles = 2, expectedPerFile = 10000L))
    assert(n == before.size.toLong)
    // flat again: no batch dirs, sidecar rows == flat file count
    val root = new java.io.File(s"$dir/li")
    assert(!root.listFiles().exists(f => f.isDirectory && f.getName.startsWith("batch_id=")))
    val flatFiles = SidecarLayout.dataFiles(spark, s"$dir/li")
    assert(flatFiles.size == 2, s"expected 2 compacted files, got ${flatFiles.size}")
    assert(spark.read.parquet(s"$dir/li/_bloom_index").count() == 2)
    // same rows, exact lookups, backup holds the pre-compaction copy
    val after = SidecarLayout.readData(spark, s"$dir/li")
      .orderBy("l_suppkey", "l_orderkey").collect().toSeq
    assert(after == before, "compaction changed the data")
    val (hits, scanned) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", 5L)
    assert(hits.count() == li.filter(col("l_suppkey") === 5L).count())
    assert(scanned.length <= 2)
    assert(SidecarLayout.readData(spark, s"$dir/li_prev").count() == n)
    // post-compaction refresh: clean no-op
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 0)
  }

  test("batch replay: overwritten batch dir's stale sidecar rows are pruned, lookups exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scs8").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir).select("l_suppkey", "l_orderkey")
    FileIndex.writeWithBloomIndex(li.filter(col("l_suppkey") <= 3), s"$dir/li",
      "l_suppkey", nFiles = 2, expectedPerFile = 10000L)
    // batch 0 lands and is indexed
    li.filter(col("l_suppkey") === 4L).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/li/batch_id=0")
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 1)
    // the batch REPLAYS with different content (crash between sink commit
    // and checkpoint): overwrite = new part files, old ones vanish
    li.filter(col("l_suppkey").isin(4L, 5L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/li/batch_id=0")
    assert(FileIndex.refreshIncremental(spark, s"$dir/li") == 1)
    // sidecar matches disk exactly — no dead-file rows, no double rows
    val disk = graft.sources.SidecarLayout.dataFiles(spark, s"$dir/li")
      .map(_.getPath.getName).toSet
    val side = spark.read.parquet(s"$dir/li/_bloom_index").select("file").collect()
      .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)).toSeq
    assert(side.size == side.distinct.size, "duplicate sidecar rows after replay")
    assert(side.toSet == disk, "sidecar points at dead files after replay")
    val (hits, _) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", 5L)
    assert(hits.count() == li.filter(col("l_suppkey") === 5L).count())
    // zone sidecar: same replay contract
    ZoneIndex.writeWithZoneIndex(li.filter(col("l_suppkey") <= 3), s"$dir/zi",
      "l_suppkey", 2, Seq("l_orderkey"))
    li.filter(col("l_suppkey") === 4L).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/zi/batch_id=0")
    assert(ZoneIndex.refreshIncremental(spark, s"$dir/zi") == 1)
    li.filter(col("l_suppkey").isin(4L, 5L)).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/zi/batch_id=0")
    assert(ZoneIndex.refreshIncremental(spark, s"$dir/zi") == 1)
    val zdisk = graft.sources.SidecarLayout.dataFiles(spark, s"$dir/zi")
      .map(_.getPath.getName).toSet
    val zside = spark.read.parquet(s"$dir/zi/_zone_index")
      .select("file").distinct().collect()
      .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)).toSet
    assert(zside == zdisk, "zone sidecar drifted from disk after replay")
    // folded stats see the replayed content exactly once
    val st = SidecarStats.tableStats(spark, s"$dir/zi")
    val expectRows = li.filter(col("l_suppkey") <= 3).count() +
      li.filter(col("l_suppkey").isin(4L, 5L)).count()
    assert(st("l_suppkey").rows == expectRows,
      s"stats rows ${st("l_suppkey").rows} != $expectRows after replay")
  }
}

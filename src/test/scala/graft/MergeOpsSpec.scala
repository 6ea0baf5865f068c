package graft

import graft.operators.MergeOps
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpec {

  test("upsert: updates replace, inserts append, base survives untouched keys") {
    import spark.implicits._
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "ver")
    val updates = Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("id", "v", "ver")
    val got = MergeOps.upsert(base, updates, "id", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("upsert: equal versions — update side wins deterministically") {
    import spark.implicits._
    val base = Seq((1L, "old", 5L)).toDF("id", "v", "ver")
    val updates = Seq((1L, "new", 5L)).toDF("id", "v", "ver")
    val got = MergeOps.upsert(base, updates, "id", "ver").collect()
    assert(got.length == 1 && got(0).getString(1) == "new")
  }

  test("upsertWithDeletes removes flagged keys") {
    import spark.implicits._
    val base = Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("id", "v", "ver", "del")
    val updates = Seq((2L, "b", 2L, true), (3L, "c", 2L, false))
      .toDF("id", "v", "ver", "del")
    val got = MergeOps.upsertWithDeletes(base, updates, "id", "ver", "del")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 3L -> "c"))
  }

  test("upsert over a real table slice round-trips row counts") {
    val base = graft.sources.Tables.customer(spark, TinyDir)
      .withColumn("ver", lit(1L))
    val updates = base.limit(10).withColumn("ver", lit(2L))
      .withColumn("c_name", upper(col("c_name")))
    val merged = MergeOps.upsert(base, updates, "c_custkey", "ver")
    assert(merged.count() == base.count())
    assert(merged.filter(col("c_name") === upper(col("c_name"))).count() >= 10)
  }

  test("provenance ledger: tracked writes record rows + order-independent fingerprint") {
    import spark.implicits._
    import graft.operators.ProvenanceOps
    val dir = java.nio.file.Files.createTempDirectory("graft_prov").toFile.getAbsolutePath
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "txt")
    ProvenanceOps.writeWithProvenance(v1, s"$dir/data", col("txt"),
      "docs", "unit-test", loadedAtUs = 1000L, provDir = s"$dir/prov")
    // same content, different row order/partitioning -> same fingerprint
    val v1shuffled = v1.orderBy(col("id").desc).repartition(3)
    ProvenanceOps.record(v1shuffled, col("txt"), "docs", "unit-test", 2000L, s"$dir/prov")
    // one row's content changes (same row count) -> fingerprint must move
    val v2 = Seq((1L, "alpha"), (2L, "CHANGED"), (3L, "gamma")).toDF("id", "txt")
    ProvenanceOps.record(v2, col("txt"), "docs", "unit-test", 3000L, s"$dir/prov")
    val led = ProvenanceOps.ledger(spark, s"$dir/prov")
      .orderBy("loaded_at_us").collect()
    assert(led.length == 3)
    assert(led.forall(_.getLong(led.head.fieldIndex("n_rows")) == 3L))
    val fps = led.map(_.getLong(led.head.fieldIndex("content_fp")))
    assert(fps(0) == fps(1), "order/partitioning must not change the fingerprint")
    assert(fps(0) != fps(2), "content change with equal counts must change the fingerprint")
  }

  test("incremental join maintenance: materialized view + delta == full recompute") {
    import graft.operators.MergeOps
    import graft.sources.{Tables => T}
    val cust = T.customer(spark, TinyDir).select("c_custkey", "c_mktsegment")
    val ord = T.orders(spark, TinyDir)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    // "yesterday's" state: 80% of each side; today's delta: the rest
    val baseC = cust.filter(col("c_custkey") % 5 =!= 0)
    val deltaC = cust.filter(col("c_custkey") % 5 === 0)
    val baseO = ord.filter(col("o_orderkey") % 5 =!= 0)
    val deltaO = ord.filter(col("o_orderkey") % 5 === 0)
    val view0 = baseC.join(baseO, "c_custkey") // initial materialization
    val delta = MergeOps.incrementalJoinDelta(baseC, deltaC, baseO, deltaO, "c_custkey")
    val maintained = view0.unionByName(delta)
    val full = cust.join(ord, "c_custkey")
    assert(maintained.count() == full.count())
    assert(maintained.exceptAll(full).isEmpty && full.exceptAll(maintained).isEmpty,
      "delta-maintained view differs from full recompute")
  }

  test("bloom file index: point lookups match full scan and skip files") {
    import graft.sources.FileIndex
    import graft.sources.{Tables => T}
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir).select("l_suppkey", "l_orderkey", "l_extendedprice")
    FileIndex.writeWithBloomIndex(li, s"$dir/li", "l_suppkey",
      nFiles = 8, expectedPerFile = 10000L)
    val nFilesTotal = spark.read.parquet(s"$dir/li")
      .select(input_file_name()).distinct().count()
    val keys = li.select("l_suppkey").distinct().limit(5)
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      val (hits, scanned) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", k)
      val expected = spark.read.parquet(s"$dir/li").filter(col("l_suppkey") === k)
      assert(hits.count() == expected.count(), s"key $k: lookup != full scan")
      // clustered writes put each key in exactly one file; fpp=1% may add
      // the odd false-positive file, never miss the true one
      assert(scanned.nonEmpty && scanned.length < nFilesTotal,
        s"key $k scanned ${scanned.length}/$nFilesTotal files — no skipping")
    }
    // absent key: no false negatives required, near-total skipping expected
    val (miss, scannedMiss) = FileIndex.pointLookup(spark, s"$dir/li", "l_suppkey", -999999L)
    assert(miss.count() == 0)
    assert(scannedMiss.length < nFilesTotal)
  }

  test("deleteByKey rewrites only touched partitions; untouched files stay byte-identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toFile.getAbsolutePath
    val table = s"$dir/t"
    val rows = for (p <- 0 to 3; i <- 0 to 9) yield (s"s$p", p * 100L + i, s"v$p$i")
    rows.toDF("src", "id", "v").repartition(4)
      .write.partitionBy("src").parquet(table)
    def listing(p: String): Seq[(String, Long, Long)] = {
      val d = new java.io.File(s"$table/src=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSeq.sorted
    }
    val before0 = listing("s0"); val before2 = listing("s2")
    // doomed: two keys in s1, every key of s3 (full-partition wipe), one absent key
    val doomed = (Seq(101L, 105L, 999999L) ++ (300L to 309L)).toDF("id")
    val touched = MergeOps.deleteByKey(spark, table, "src", "id", doomed)
    assert(touched == Seq("s1", "s3"))
    // untouched partitions: same files, same mtimes, same bytes
    assert(listing("s0") == before0, "s0 files were rewritten")
    assert(listing("s2") == before2, "s2 files were rewritten")
    // fully-doomed partition directory is gone (dynamic overwrite alone
    // would have left it stale)
    assert(!new java.io.File(s"$table/src=s3").exists(), "s3 dir survived")
    // surviving contents are exactly original minus doomed
    val got = spark.read.parquet(table).select("id").collect().map(_.getLong(0)).toSet
    val expected = rows.map(_._2).toSet -- Set(101L, 105L) -- (300L to 309L).toSet
    assert(got == expected)
  }
}

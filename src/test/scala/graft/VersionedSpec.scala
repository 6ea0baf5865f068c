package graft

import graft.sources.Versioned

class VersionedSpec extends SparkSpec {

  private def snapshot(dir: String, v: Int): Map[Long, (String, Long)] =
    Versioned.readVersion(spark, dir, v).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("v"), r.getAs[Long]("ver"))).toMap

  test("versioned commits: time travel, snapshot isolation, partition-level file sharing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ver").toFile.getAbsolutePath
    assert(Versioned.latestVersion(spark, dir) == 0)

    // v1: two partitions
    val v1 = Versioned.commit(spark, dir,
      Seq(("p0", 1L, "a", 1L), ("p0", 2L, "b", 1L), ("p1", 3L, "c", 1L))
        .toDF("part", "id", "v", "ver"),
      "part", "id", "ver")
    assert(v1 == 1)

    // hold a reader on v1 across later commits (isolation)
    val readerV1 = Versioned.readVersion(spark, dir, 1)

    // v2: update one key in p1, open a new partition p2 — p0 untouched
    val v2 = Versioned.commit(spark, dir,
      Seq(("p1", 3L, "c2", 2L), ("p2", 4L, "d", 1L)).toDF("part", "id", "v", "ver"),
      "part", "id", "ver")
    assert(v2 == 2 && Versioned.latestVersion(spark, dir) == 2)

    // v3: stale update loses, fresh insert lands in p0
    Versioned.commit(spark, dir,
      Seq(("p1", 3L, "stale", 1L), ("p0", 5L, "e", 1L)).toDF("part", "id", "v", "ver"),
      "part", "id", "ver")

    assert(snapshot(dir, 1) ==
      Map(1L -> ("a", 1L), 2L -> ("b", 1L), 3L -> ("c", 1L)))
    assert(snapshot(dir, 2) ==
      Map(1L -> ("a", 1L), 2L -> ("b", 1L), 3L -> ("c2", 2L), 4L -> ("d", 1L)))
    assert(snapshot(dir, 3) ==
      Map(1L -> ("a", 1L), 2L -> ("b", 1L), 3L -> ("c2", 2L), 4L -> ("d", 1L),
        5L -> ("e", 1L)))

    // structural sharing: v2 still points p0 at the files v1 wrote, and
    // the v2 data dir holds ONLY the partitions v2 touched
    val m1 = Versioned.readManifest(spark, dir, 1)
    val m2 = Versioned.readManifest(spark, dir, 2)
    assert(m2("p0") == m1("p0"), "untouched partition was rewritten")
    assert(m2("p1") != m1("p1"))
    val v2Dirs = new java.io.File(s"$dir/data/v2").listFiles()
      .map(_.getName).filter(_.startsWith("__p=")).sorted.toSeq
    assert(v2Dirs == Seq("__p=p1", "__p=p2"), s"v2 wrote $v2Dirs")

    // the held v1 reader still sees the v1 snapshot after two commits
    assert(readerV1.count() == 3)

    // time-travel diff v1 -> v2: the changed row and the new row
    val diff = Versioned.changedBetween(spark, dir, 1, 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSet
    assert(diff == Set((3L, "c2"), (4L, "d")))
  }

  test("vacuum drops expired snapshots and unreferenced partition dirs, keeps live ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toFile.getAbsolutePath
    Versioned.commit(spark, dir,
      Seq(("p0", 1L, "a", 1L), ("p1", 2L, "b", 1L)).toDF("part", "id", "v", "ver"),
      "part", "id", "ver")
    Versioned.commit(spark, dir,
      Seq(("p1", 2L, "b2", 2L)).toDF("part", "id", "v", "ver"),
      "part", "id", "ver")
    Versioned.commit(spark, dir,
      Seq(("p1", 2L, "b3", 3L)).toDF("part", "id", "v", "ver"),
      "part", "id", "ver")
    // orphan from a "crashed commit": a data dir no manifest references
    val orphan = new java.io.File(s"$dir/data/v9/__p=px")
    orphan.mkdirs()
    Versioned.vacuum(spark, dir, keepLast = 1)
    // v1/v2 manifests gone, v3 alive and correct
    assert(!new java.io.File(s"$dir/manifest/v1.manifest").exists())
    assert(!new java.io.File(s"$dir/manifest/v2.manifest").exists())
    assert(snapshot(dir, 3) == Map(1L -> ("a", 1L), 2L -> ("b3", 3L)))
    // v3 references v1's p0 files — they must survive; v2's p1 rewrite and
    // the orphan must not
    assert(new java.io.File(s"$dir/data/v1/__p=p0").exists(), "shared p0 deleted")
    assert(!new java.io.File(s"$dir/data/v2").exists(), "expired v2 data survived")
    assert(!orphan.exists(), "orphan dir survived")
  }

  test("streaming CDC sink: each micro-batch commits a time-travelable version") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vstream").toFile.getAbsolutePath
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String, Long)]
    val df = mem.toDF().toDF("part", "id", "v", "ver")
    val q = graft.streaming.StreamingOps
      .versionedCommitSink(df, dir, "part", "id", "ver").start()
    try {
      mem.addData(("p0", 1L, "a", 1L), ("p1", 2L, "b", 1L))
      q.processAllAvailable()
      mem.addData(("p1", 2L, "b2", 2L), ("p2", 3L, "c", 1L))
      q.processAllAvailable()
      assert(Versioned.latestVersion(spark, dir) == 2)
      assert(snapshot(dir, 1) == Map(1L -> ("a", 1L), 2L -> ("b", 1L)))
      assert(snapshot(dir, 2) ==
        Map(1L -> ("a", 1L), 2L -> ("b2", 2L), 3L -> ("c", 1L)))
      // structural sharing held under streaming: v2 never rewrote p0
      val m1 = Versioned.readManifest(spark, dir, 1)
      val m2 = Versioned.readManifest(spark, dir, 2)
      assert(m2("p0") == m1("p0"))
    } finally q.stop()
  }

  test("versioned commit rejects manifest-unsafe partition values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ver2").toFile.getAbsolutePath
    val bad = Seq(("a/b", 1L, "x", 1L)).toDF("part", "id", "v", "ver")
    intercept[IllegalArgumentException] {
      Versioned.commit(spark, dir, bad, "part", "id", "ver")
    }
  }
}

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
}

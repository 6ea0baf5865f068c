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
}

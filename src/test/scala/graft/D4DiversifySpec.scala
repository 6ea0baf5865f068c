package graft

import org.apache.spark.sql.functions._

/** q_d4_diversify invariants (the DuckDB oracle pins exact values; these
  * pin the published recipe's structure on the live plan). */
class D4DiversifySpec extends SparkSpec {

  private lazy val out = SparkEntry.queries("q_d4_diversify")(spark, TinyDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))

  test("decision table covers every vector exactly once with a valid status") {
    val n = graft.sources.Tables.embeddings(spark, TinyDir).count()
    assert(out.length == n)
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => Set("kept", "dup", "proto").contains(r._4)))
  }

  test("dup decisions are exactly SemDeDup's (shared clustering, shared rule)") {
    val sem = SparkEntry.queries("q_semdedup")(spark, TinyDir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    out.foreach { case (id, _, _, st) =>
      assert((sem(id) == 0) == (st == "dup"),
        s"vec $id: semdedup keep=${sem(id)} but d4 status=$st")
    }
  }

  test("proto drops are the per-cell quota of HIGHEST-centroid-cosine survivors") {
    val surv = out.filter(_._4 != "dup")
    surv.groupBy(_._2).foreach { case (cell, rows) =>
      val quota = math.floor(0.25 * rows.length).toLong
      val protos = rows.filter(_._4 == "proto")
      assert(protos.length == quota, s"cell $cell: ${protos.length} protos, quota $quota")
      if (quota > 0) {
        // every proto outranks (ccos desc, id asc) every kept survivor
        val ranked = rows.sortBy(r => (-r._3, r._1)).map(_._4)
        assert(ranked.take(quota.toInt).forall(_ == "proto"),
          s"cell $cell: a kept survivor outranks a proto")
      }
    }
    assert(surv.exists(_._4 == "proto"), "corpus produced no proto drops at all")
  }

  test("partition-invariant: same table at 3 and 13 shuffle partitions") {
    val base = out.toSet
    withConf("spark.sql.shuffle.partitions" -> "13") {
      val again = SparkEntry.queries("q_d4_diversify")(spark, TinyDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      assert(again == base)
    }
  }
}

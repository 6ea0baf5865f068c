package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** transitiveClosure and coSupplyBfs are size-routed (r14): the driver
  * replay (default for every spec-sized input) and the distributed loop
  * (forced with driverMaxEdges = 0) must emit the IDENTICAL row set.
  * The planted shapes stress the corners: a diamond (two paths to one
  * descendant — the closure must stay a SET), a depth-4 chain against
  * maxDepth (paths longer than the bound must NOT appear), string ids
  * (the driver route is type-generic), and a BFS source outside the
  * graph (kept at dist 0 by both routes). */
class ClosureBfsRouteSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().toIndexedSeq.map(_.toString)

  test("transitiveClosure: driver set replay == distributed doubling (longs)") {
    import spark.implicits._
    // diamond 1→2→4, 1→3→4, plus chain 4→5→6→7 (depth past maxDepth 4)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    for (depth <- Seq(2, 4, 8)) {
      val driver = rows(GraphOps.transitiveClosure(e, depth))
      val dist = rows(GraphOps.transitiveClosure(e, depth, driverMaxEdges = 0L))
      assert(driver == dist, s"maxDepth=$depth")
    }
  }

  test("transitiveClosure: driver replay == distributed (string ids)") {
    import spark.implicits._
    val e = Seq(("part:1", "brand:a"), ("part:2", "brand:a"),
      ("brand:a", "type:x"), ("type:x", "ROOT")).toDF("src", "dst")
    val driver = rows(GraphOps.transitiveClosure(e, 4))
    val dist = rows(GraphOps.transitiveClosure(e, 4, driverMaxEdges = 0L))
    assert(driver == dist)
  }

  test("coSupplyBfs: driver adjacency replay == distributed hop joins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_route").toString
    // lineitem stand-in: parts 100/200 shared by supplier chains
    Seq((100L, 1L), (100L, 2L), (200L, 2L), (200L, 3L), (300L, 3L),
      (300L, 4L), (400L, 5L)) // supplier 5 isolated from 1's component
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val sources = Seq(1L, 99L).toDF("node") // 99: not in the graph
    for (hops <- Seq(1, 2, 3)) {
      val driver = rows(GraphOps.coSupplyBfs(spark, dir, sources, hops))
      val dist = rows(GraphOps.coSupplyBfs(spark, dir, sources, hops,
        driverMaxEdges = 0L))
      assert(driver == dist, s"maxHops=$hops")
      assert(driver.exists(_.contains("[99,0]")), "off-graph source kept at 0")
    }
  }
}

package graft

import graft.sources.Jdbc
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JDBC source/sink against embedded Derby — the same Spark JDBC code path
  * a MySQL/Postgres warehouse exercises, serverless for specs. */
class JdbcSpec extends SparkSpec {

  private lazy val dbDir =
    Files.createTempDirectory("graft_derby").toFile.getAbsolutePath + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private val DerbyDriver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("batched write + partitioned read round-trips and parallelizes by stride") {
    import spark.implicits._
    val src = (1L to 200L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "nm", "score")
    Jdbc.write(src, url, "targets", SaveMode.Overwrite, batchSize = 50,
      driver = DerbyDriver)
    val back = Jdbc.readPartitioned(spark, url, "targets",
      partitionColumn = "id", lowerBound = 1L, upperBound = 200L,
      numPartitions = 4, driver = DerbyDriver)
    // 4 stride predicates -> 4 read partitions
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 200)
    val r = back.orderBy("id").collect()
    assert(r(0).getLong(0) == 1L && r(0).getString(1) == "name_1")
    assert(r(199).getDouble(2) == 300.0)
    // rows outside the stride bounds are still read (bounds ≠ filter)
    val narrow = Jdbc.readPartitioned(spark, url, "targets",
      "id", lowerBound = 50L, upperBound = 60L, numPartitions = 2,
      driver = DerbyDriver)
    assert(narrow.count() == 200)
  }

  test("filters and projection push into the JDBC scan") {
    val back = Jdbc.read(spark, url, "targets", driver = DerbyDriver)
      .filter(col("id") <= 10).select("id", "nm")
    assert(back.count() == 10)
    val plan = back.queryExecution.executedPlan.toString()
    // the JDBC relation carries the pushed filter + pruned columns
    assert(plan.contains("PushedFilters"), plan)
    assert(!plan.toLowerCase.contains("score"), plan)
  }

  test("append mode accumulates batches (the loader ins_* shape)") {
    import spark.implicits._
    val extra = Seq((201L, "name_201", 301.5)).toDF("id", "nm", "score")
    Jdbc.write(extra, url, "targets", SaveMode.Append, driver = DerbyDriver)
    val n = Jdbc.read(spark, url, "targets", driver = DerbyDriver).count()
    assert(n == 201)
  }
}

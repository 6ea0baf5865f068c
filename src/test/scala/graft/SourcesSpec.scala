package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("readDelimited ingests TSV with an explicit schema (csv2sql analog)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "targets.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("id\tsym\tscore")
    w.println("1\tDRD2\t3.5")
    w.println("2\tEGFR\t7.25")
    w.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("sym", StringType),
      StructField("score", DoubleType)))
    val df = Tables.readDelimited(spark, f.getAbsolutePath, schema, delimiter = "\t")
    assert(df.schema == schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2 && rows(1).getString(1) == "EGFR" && rows(1).getDouble(2) == 7.25)
  }

  test("writePartitioned lays out parquet by partition key and round-trips") {
    val out = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath + "/nations"
    val n = Tables.nation(spark, TinyDir)
    Tables.writePartitioned(n, out, Seq("n_regionkey"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("n_regionkey=")))
    val back = spark.read.parquet(out)
    assert(back.count() == n.count())
    // partition pruning: reading one key touches one directory
    val one = back.filter(col("n_regionkey") === 0)
    val scanned = one.queryExecution.executedPlan.toString()
    assert(one.count() == n.filter(col("n_regionkey") === 0).count())
  }

  test("events nanos timestamps normalize to microsecond precision") {
    val e = Tables.events(spark, TinyDir)
    assert(e.schema("ts").dataType == TimestampType)
    assert(e.count() > 0)
  }
}

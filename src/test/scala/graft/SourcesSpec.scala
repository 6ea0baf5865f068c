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

  test("readParquetMerged unions evolving schemas with nulls for absent columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir + "/gen1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(dir + "/gen2")
    val df = Tables.readParquetMerged(spark, dir + "/gen1", dir + "/gen2")
    assert(df.columns.toSet == Set("id", "v1", "v2"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) == 9.5)
  }

  test("compact rewrites a many-file dataset into row-bounded files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toFile.getAbsolutePath
    (1L to 100L).toDF("id").repartition(20).write.parquet(dir + "/in")
    val inFiles = new java.io.File(dir + "/in").listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles == 20)
    val n = Tables.compact(spark, dir + "/in", dir + "/out", targetRowsPerFile = 50)
    assert(n == 100)
    val outFiles = new java.io.File(dir + "/out").listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles == 2)
    assert(spark.read.parquet(dir + "/out").count() == 100)
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

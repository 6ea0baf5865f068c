package graft

import java.nio.file.{Files, Paths}

import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector (src_dsv2): result equality with the
  * lineSep-based reader, filter pushdown visible in the physical plan and
  * honored by the reader, column pruning honored, per-file partitioning. */
class OboSourceV2Spec extends SparkSpec {

  private val Fmt = "graft.sources.v2.OboSource"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("obov2").toString
    val f1 =
      """format-version: 1.2
        |
        |[Term]
        |id: GO:0001
        |name: root
        |
        |[Term]
        |id: GO:0002
        |name: alpha process
        |is_a: GO:0001
        |
        |[Typedef]
        |id: part_of
        |""".stripMargin
    val f2 =
      """[Term]
        |id: GO:0003
        |name: beta process
        |is_a: GO:0001
        |is_a: GO:0002
        |
        |[Term]
        |id: GO:0004
        |name: gamma
        |is_a: GO:0003
        |""".stripMargin
    Files.write(Paths.get(d, "a.obo"), f1.getBytes("UTF-8"))
    Files.write(Paths.get(d, "b.obo"), f2.getBytes("UTF-8"))
    d
  }

  test("dsv2 rows equal the lineSep reader on the same files") {
    val v2 = spark.read.format(Fmt).load(dir)
      .select("term_id", "name", "parents").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList)).toSet
    val v1 = T.readOboTerms(spark, dir)
      .select("term_id", "name", "parents").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList)).toSet
    assert(v2 == v1)
    assert(v2.map(_._1) == Set("GO:0001", "GO:0002", "GO:0003", "GO:0004"))
    assert(v2.find(_._1 == "GO:0003").get._3 == List("GO:0001", "GO:0002"))
  }

  test("filters are pushed into the scan and results stay correct") {
    val df = spark.read.format(Fmt).load(dir)
      .filter(col("term_id") === "GO:0003")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-obo"), plan)
    assert(plan.contains("EqualTo(term_id,GO:0003)"), plan)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getString(1) == "beta process")

    val pre = spark.read.format(Fmt).load(dir)
      .filter(col("term_id").startsWith("GO:000"))
    assert(pre.count() == 4)
    val nameEq = spark.read.format(Fmt).load(dir)
      .filter(col("name") === "alpha process")
    assert(nameEq.queryExecution.executedPlan.toString
      .contains("EqualTo(name,alpha process)"))
    assert(nameEq.select("term_id").collect().map(_.getString(0)).toList
      == List("GO:0002"))
  }

  test("column pruning reaches the scan; one partition per file") {
    val df = spark.read.format(Fmt).load(dir).select("term_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<term_id:string>"), plan)
    assert(df.collect().map(_.getString(0)).sorted.toList
      == List("GO:0001", "GO:0002", "GO:0003", "GO:0004"))
    val nParts = spark.read.format(Fmt).load(dir).rdd.getNumPartitions
    assert(nParts == 2, s"expected one partition per file, got $nParts")
  }

  test("limit pushdown reaches the scan and bounds the result") {
    val df = spark.read.format(Fmt).load(dir).limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=2"), plan)
    assert(df.collect().length == 2)
    val unlimited = spark.read.format(Fmt).load(dir)
    assert(unlimited.queryExecution.executedPlan.toString.contains("limit=-1"))
    assert(unlimited.count() == 4)
  }

  test("COUNT(*) pushes into the scan as per-file partials; filtered counts fall back") {
    val cnt = spark.read.format(Fmt).load(dir)
    // force a fresh plan for the aggregate shape
    val agg = cnt.groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("agg=count(*)"), plan)
    assert(agg.head().getLong(0) == 4L)
    // a filter must disable the pushed count (residual filters change it)
    val filtered = spark.read.format(Fmt).load(dir)
      .filter(col("term_id") =!= "GO:0001").groupBy().count()
    assert(!filtered.queryExecution.executedPlan.toString.contains("agg=count(*)"))
    assert(filtered.head().getLong(0) == 3L)
  }

  test("dsv2 write path: round-trip through both readers, commit is clean") {
    val out = Files.createTempDirectory("obowrite").toString
    val orig = spark.read.format(Fmt).load(dir)
    orig.write.format(Fmt).mode("append").save(out)
    // staging gone, numbered part files + manifest present
    val names = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("_staging")), s"staging left: $names")
    assert(names.contains("_obo_manifest"))
    assert(names.exists(_.matches("part-\\d{5}\\.obo")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("term_id"), col("name"), col("parents"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2))).toSet
    // the written files parse identically through the V2 reader AND the
    // lineSep-based reader — true format round-trip, not reader symmetry
    assert(canon(spark.read.format(Fmt).load(out)) == canon(orig))
    assert(canon(T.readOboTerms(spark, s"$out/part-*.obo")) == canon(orig))
    val manifest = new String(Files.readAllBytes(Paths.get(out, "_obo_manifest")), "UTF-8")
    assert(manifest.trim == s"n_terms=${orig.count()}")
  }

  test("dsv2 overwrite truncates the previous load in the same commit") {
    val out = Files.createTempDirectory("obowrite2").toString
    spark.read.format(Fmt).load(dir).write.format(Fmt).mode("append").save(out)
    import spark.implicits._
    Seq(("GO:9999", "only survivor", Seq("GO:0001")))
      .toDF("term_id", "name", "parents")
      .write.format(Fmt).mode("overwrite").save(out)
    val back = spark.read.format(Fmt).load(out).collect()
    assert(back.map(_.getString(0)).toSet == Set("GO:9999"), back.mkString(","))
  }

  test("dsv2 source feeds the existing closure operator end-to-end") {
    val edges = spark.read.format(Fmt).load(dir)
      .select(col("term_id").as("src"), explode(col("parents")).as("dst"))
    val closed = graft.operators.GraphOps.transitiveClosure(
      edges.select(xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst")),
      maxDepth = 4)
    // GO:0001 is an ancestor of 0002, 0003, 0004
    val rootH = spark.range(1).select(xxhash64(lit("GO:0001"))).head().getLong(0)
    assert(closed.filter(col("dst") === rootH).count() == 3)
  }
}

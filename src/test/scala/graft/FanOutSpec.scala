package graft

import graft.sources.{FanOut, Tables}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** The one-scan multi-sink loader pattern (sink_fanout): one parsed OBO
  * source fans out into three tables, each write reading the CACHED parse
  * — proven from the executed plans of the real write commands, not from
  * a re-constructed lookalike. */
class FanOutSpec extends SparkSpec {

  private def writeObo(dir: java.io.File): String = {
    val f = new java.io.File(dir, "mini.obo")
    val w = new java.io.PrintWriter(f)
    w.println("format-version: 1.2")
    w.println("")
    w.println("[Term]")
    w.println("id: GO:0001")
    w.println("name: root term")
    w.println("")
    w.println("[Term]")
    w.println("id: GO:0002")
    w.println("name: middle term")
    w.println("is_a: GO:0001")
    w.println("")
    w.println("[Term]")
    w.println("id: GO:0003")
    w.println("name: leaf term")
    w.println("is_a: GO:0002")
    w.println("is_a: GO:0001")
    w.close()
    f.getAbsolutePath
  }

  test("writeFanOut: one parse, three sinks, provenance rows, no source re-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout_spec").toFile
    val obo = writeObo(dir)
    val out = dir.getAbsolutePath
    val parsed = Tables.readOboTerms(spark, obo)

    val plans = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += ((funcName, qe.executedPlan.toString)); () }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val counts = FanOut.writeFanOut(parsed, Seq(
        FanOut.Sink("terms",
          df => df.select("term_id", "name"), s"$out/terms"),
        FanOut.Sink("edges",
          df => df.select(col("term_id"), explode(col("parents")).as("parent")),
          s"$out/edges"),
        FanOut.Sink("fanin",
          df => df.select(col("term_id"), size(col("parents")).as("n_parents")),
          s"$out/fanin")),
        provDir = Some(s"$out/prov"), loadedAtUs = 42L, source = "mini.obo")

      assert(counts == Map("terms" -> 3L, "edges" -> 3L, "fanin" -> 3L))
      // the written tables are real and correct
      assert(spark.read.parquet(s"$out/edges").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("GO:0002", "GO:0001"), ("GO:0003", "GO:0002"), ("GO:0003", "GO:0001")))
      // provenance: one ledger row per sink, caller-supplied batch time
      val prov = spark.read.parquet(s"$out/prov").collect()
      assert(prov.length == 3)
      assert(prov.map(_.getAs[String]("dataset")).sorted.toSeq ==
        Seq("edges", "fanin", "terms"))
      assert(prov.forall(_.getAs[Long]("loaded_at_us") == 42L))
      assert(prov.forall(_.getAs[String]("source") == "mini.obo"))
      assert(prov.map(r => r.getAs[String]("dataset") -> r.getAs[Long]("n_rows")).toMap ==
        Map("terms" -> 3L, "edges" -> 3L, "fanin" -> 3L))

      // SINGLE-SCAN PROOF: the listener captured the actual executed plan
      // of every action writeFanOut ran. Each sink's write command must
      // read the in-memory cache, never the obo source file.
      val deadline = System.nanoTime() + 15e9.toLong
      val sinkPaths = Seq(s"$out/terms", s"$out/edges", s"$out/fanin")
      def writePlans = plans.synchronized {
        // only the three SINK writes — the provenance append also writes,
        // but it reads back the sink parquet (by contract), not the cache
        plans.filter { case (_, p) =>
          p.contains("WriteFiles") &&
            sinkPaths.exists(sp => p.contains(s"InsertIntoHadoopFsRelationCommand file:$sp,"))
        }.toSeq
      }
      while (writePlans.size < 3 && System.nanoTime() < deadline) Thread.sleep(100)
      val wp = writePlans
      assert(wp.size >= 3, s"expected >=3 captured write plans, got ${wp.size}")
      wp.foreach { case (fn, p) =>
        // the write must reach its rows via the cache. A FileScan of the
        // source may appear in the printout, but only BELOW the
        // InMemoryRelation marker — that's the cache's (already
        // materialized) definition, not a live rescan path.
        val imts = p.indexOf("InMemoryTableScan")
        assert(imts >= 0, s"$fn: sink write did not read the cached parse:\n$p")
        val imr = p.indexOf("InMemoryRelation")
        val scan = p.indexOf("mini.obo")
        assert(scan < 0 || (imr >= 0 && scan > imr),
          s"$fn: sink write re-scanned the obo source above the cache:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("writeFanOut from the XML source: one parsed entry feeds entity + xref + alias sinks") {
    // the load-UniProt shape: one parsed record carries the entity fields
    // plus repeated xref/alias children, fanned into separate tables
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout_xml").toFile
    val xml = new java.io.File(dir, "entries.xml")
    val w = new java.io.PrintWriter(xml)
    w.println("<entries>")
    w.println("""  <entry><id>P1</id><name>alpha</name>""" +
      """<xref>db1:1</xref><xref>db2:9</xref><alias>a1</alias></entry>""")
    w.println("""  <entry><id>P2</id><name>beta</name>""" +
      """<xref>db1:2</xref><alias>b1</alias><alias>b2</alias></entry>""")
    w.println("</entries>")
    w.close()
    val out = dir.getAbsolutePath
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("xref", ArrayType(StringType)),
      StructField("alias", ArrayType(StringType))))
    val parsed = Tables.readXml(spark, xml.getAbsolutePath, "entry", schema)
      .select("id", "name", "xref", "alias")
    val counts = FanOut.writeFanOut(parsed, Seq(
      FanOut.Sink("entity", df => df.select("id", "name"), s"$out/entity"),
      FanOut.Sink("xref",
        df => df.select(col("id"), explode(col("xref")).as("xref")), s"$out/xref"),
      FanOut.Sink("alias",
        df => df.select(col("id"), explode(col("alias")).as("alias")), s"$out/alias")),
      provDir = Some(s"$out/prov"), loadedAtUs = 5L, source = "entries.xml")
    assert(counts == Map("entity" -> 2L, "xref" -> 3L, "alias" -> 3L))
    assert(spark.read.parquet(s"$out/xref").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("P1", "db1:1"), ("P1", "db2:9"), ("P2", "db1:2")))
    assert(spark.read.parquet(s"$out/alias").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("P1", "a1"), ("P2", "b1"), ("P2", "b2")))
    val prov = spark.read.parquet(s"$out/prov")
    assert(prov.count() == 3)
    assert(prov.collect().map(r =>
      r.getAs[String]("dataset") -> r.getAs[Long]("n_rows")).toMap ==
      Map("entity" -> 2L, "xref" -> 3L, "alias" -> 3L))
  }
}

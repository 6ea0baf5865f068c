package graft

import graft.operators.SchemaDrift
import org.apache.spark.sql.functions._

/** q_schema_drift: renames are detected by CONTENT (a name-only diff
  * would report removed+added and lose the column), duplicate-content
  * orphans pair deterministically, and nulls profile cleanly. */
class SchemaDriftSpec extends SparkSpec {

  test("the demo carve yields one column of every drift class") {
    val out = SchemaDrift.qSchemaDrift.fn(spark, TinyDir).collect()
      .map(r => (r.getAs[String]("old_col"), r.getAs[String]("new_col"),
        r.getAs[String]("status"))).toSet
    assert(out == Set(
      ("doc_id", "doc_id", "same"),
      ("source", "source", "changed"),
      ("text", "body", "renamed"),
      ("n_chars", null, "removed"),
      (null, "lang", "added")), s"got $out")
  }

  test("duplicate-content columns pair as renames deterministically by rank") {
    import spark.implicits._
    val oldRel = Seq((1, 1, "k"), (2, 2, "l")).toDF("a", "b", "keep")
    val newRel = Seq((1, 1, "k"), (2, 2, "l")).toDF("x", "y", "keep")
    val out = SchemaDrift.drift(
      SchemaDrift.columnProfiles(oldRel),
      SchemaDrift.columnProfiles(newRel)).collect()
      .map(r => (r.getAs[String]("old_col"), r.getAs[String]("new_col"),
        r.getAs[String]("status"))).toSet
    // a and b carry identical content; rank order pairs a->x, b->y
    assert(out == Set(("keep", "keep", "same"),
      ("a", "x", "renamed"), ("b", "y", "renamed")), s"got $out")
  }

  test("null values: profiles count non-nulls and a renamed nullable column still matches") {
    import spark.implicits._
    val oldRel = Seq((Some("p"), 1L), (None, 2L), (Some("q"), 3L))
      .toDF("tag", "id")
    val newRel = Seq((Some("p"), 1L), (None, 2L), (Some("q"), 3L))
      .toDF("label", "id")
    val profiles = SchemaDrift.columnProfiles(oldRel).collect()
      .map(r => r.getAs[String]("c") -> r.getAs[Long]("n")).toMap
    assert(profiles("tag") == 2L, "null counted as a value")
    val out = SchemaDrift.drift(
      SchemaDrift.columnProfiles(oldRel),
      SchemaDrift.columnProfiles(newRel)).collect()
      .map(r => (r.getAs[String]("old_col"), r.getAs[String]("new_col"),
        r.getAs[String]("status"))).toSet
    assert(out == Set(("id", "id", "same"), ("tag", "label", "renamed")),
      s"got $out")
  }

  test("applyDrift restores the old schema exactly and preserves renamed content") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val oldRel = docs.select(col("doc_id"), col("text"), col("source"),
      col("n_chars"))
    val newRel = docs.select(col("doc_id"), col("text").as("body"),
      when(col("doc_id") % 50 === 0, upper(col("source")))
        .otherwise(col("source")).as("source"),
      col("lang"))
    val report = SchemaDrift.drift(
      SchemaDrift.columnProfiles(oldRel), SchemaDrift.columnProfiles(newRel))
    val repaired = SchemaDrift.applyDrift(newRel, report, oldRel.schema)
    // exact old schema: names, order, types (n_chars back as a typed null)
    assert(repaired.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      oldRel.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // renamed column content survives byte-for-byte
    val before = oldRel.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    repaired.select("doc_id", "text").collect().foreach { r =>
      assert(r.getString(1) == before(r.getLong(0)))
    }
    // removed column is present but empty
    assert(repaired.filter(col("n_chars").isNotNull).count() == 0)
  }
}

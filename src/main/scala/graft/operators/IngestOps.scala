package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-text ingestion as in-plan operators (SURVEY.md §2.1 src_xml /
  * src_obo): XML record extraction and OBO stanza parsing, both fully
  * declarative (codegen regex / native XML expressions — no UDFs), both
  * oracled end-to-end. The file-level readers live in
  * [[graft.sources.Tables.readXml]] / [[graft.sources.Tables.readOboTerms]];
  * these queries exercise the same parse logic inside a plan so the
  * correctness gate covers it.
  */
object IngestOps {

  private val xmlDocSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("lang", StringType)))),
    StructField("text_len", LongType)))

  /** XML round-trip: serialize each document row (with a nested `meta`
    * element) via to_xml, parse back via from_xml with an explicit schema,
    * and emit the recovered fields. The oracle reads the same fields
    * straight off the table — a parse bug (escaping, nesting, type
    * coercion) breaks the hash. Reference analog: the XML loader family
    * (loaders/load-UniProt.py:108 parses records to typed fields). */
  val qXmlExtract: Q = Q(
    "q_xml_extract",
    """SELECT doc_id, source, lang, CAST(length(text) AS BIGINT) AS text_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val xml = T.documents(s, d).select(
      to_xml(struct(
        col("doc_id"),
        struct(col("source"), col("lang")).as("meta"),
        length(col("text")).cast("long").as("text_len"))).as("payload"))
    xml.select(from_xml(col("payload"), xmlDocSchema).as("r"))
      .select(col("r.doc_id").as("doc_id"),
        col("r.meta.source").as("source"),
        col("r.meta.lang").as("lang"),
        col("r.text_len").as("text_len"))
      .orderBy("doc_id")
  }

  /** OBO ontology pipeline end-to-end from stanza TEXT: render each term of
    * the part→brand→type→ROOT hierarchy as an OBO [Term] stanza (multiple
    * is_a lines where a term has several parents), pack stanzas into
    * per-bucket blobs (the "file content" shape), re-split each blob on the
    * [Term] delimiter exactly like [[graft.sources.Tables.readOboTerms]],
    * regex-extract (id, is_a*) edges, then run the path-doubling closure and
    * count descendants per ancestor. The oracle derives the same edges
    * relationally and closes them with a recursive CTE — so the whole
    * text→edges→closure path must agree with pure SQL semantics.
    * Spaces in type names are underscore-encoded (OBO ids are space-free).
    * Reference analog: python/obo.py feeding loaders/load-Ontologies.py. */
  val qOboClosure: Q = Q(
    "q_obo_closure",
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT 'part:' || CAST(p_partkey AS VARCHAR) AS src, 'brand:' || p_brand AS dst FROM part
      |  UNION SELECT DISTINCT 'brand:' || p_brand, 'type:' || replace(p_type, ' ', '_') FROM part
      |  UNION SELECT DISTINCT 'type:' || replace(p_type, ' ', '_'), 'ROOT' FROM part),
      |walk(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT walk.src, edges.dst FROM walk JOIN edges ON edges.src = walk.dst)
      |SELECT dst AS node, COUNT(DISTINCT src) AS n_descendants
      |FROM walk GROUP BY dst ORDER BY node""".stripMargin) { (s, d) =>
    val p = T.part(s, d)
    // one row per (term, parent): multi-parent terms get several is_a lines
    val rels =
      p.select(concat(lit("part:"), col("p_partkey")).as("id"),
          concat(lit("brand:"), col("p_brand")).as("parent"))
        .union(p.select(concat(lit("brand:"), col("p_brand")),
          concat(lit("type:"), translate(col("p_type"), " ", "_"))))
        .union(p.select(concat(lit("type:"), translate(col("p_type"), " ", "_")),
          lit("ROOT")))
        .distinct()
    // render one stanza per term; deterministic is_a order inside a stanza
    val stanzas = rels.groupBy(col("id"))
      .agg(sort_array(collect_list(col("parent"))).as("parents"))
      .select(col("id"),
        concat(lit("[Term]\nid: "), col("id"), lit("\nname: "), col("id"),
          lit("\n"),
          array_join(transform(col("parents"),
            x => concat(lit("is_a: "), x)), "\n"),
          lit("\n")).as("stanza"))
    // pack stanzas into per-bucket blobs (simulated file contents) —
    // deterministic order inside each blob
    val blobs = stanzas
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(8)))
      .groupBy("bucket")
      .agg(array_join(array_sort(collect_list(col("stanza"))), "").as("blob"))
    // re-split on the stanza delimiter and regex-extract edges — the same
    // logic readOboTerms applies to raw files
    val parsed = blobs
      .select(explode(split(col("blob"), "\\[Term\\]")).as("stanza"))
      .filter(length(trim(col("stanza"))) > 0)
      .select(
        regexp_extract(col("stanza"), """(?m)^id: (\S+)""", 1).as("src"),
        expr("""regexp_extract_all(stanza, '(?m)^is_a: (\\S+)', 1)""").as("parents"))
      .filter(col("src") =!= "")
    val edges = parsed.select(col("src"), explode(col("parents")).as("dst")).distinct()
    // dictionary-encode term ids to int64 before the closure (the same
    // lever as qSubtreeCounts: doubling self-joins shuffle 8-byte longs,
    // labels rejoin only at the ancestor-count-sized final aggregate)
    val encoded = edges.select(xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
    val dict = edges.select(col("dst").as("node"), xxhash64(col("dst")).as("h")).distinct()
    // fixed 3-level hierarchy: two doubling rounds close it (cf. GraphOps)
    GraphOps.transitiveClosure(encoded, maxDepth = 4)
      .groupBy(col("dst").as("h"))
      .agg(count(lit(1)).as("n_descendants"))
      .join(dict, "h")
      .select(col("node"), col("n_descendants"))
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(qXmlExtract, qOboClosure)
}

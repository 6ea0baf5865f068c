package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector for the OBO stanza format
  * (SURVEY.md §2.5 src_dsv2) — the "write your own source" tier of the
  * engine-extension ladder, complementing the lineSep-based
  * [[graft.sources.Tables.readOboTerms]]:
  *
  *  - `spark.read.format("graft.sources.v2.OboSource").load(dir)` yields
  *    (term_id, name, parents) rows, schema declared by the connector;
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): EqualTo /
  *    StringStartsWith / IsNotNull on term_id or name are evaluated
  *    inside the reader BEFORE a row is materialized — a non-matching
  *    stanza costs one regex probe, not a full parse + row + filter;
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader parses only requested fields (e.g. a term_id-only scan
  *    never runs the is_a regex or builds the parents array);
  *  - **partition planning**: one [[InputPartition]] per file — ontology
  *    corpora ship as many files, so file-grain parallelism is the
  *    natural unit (byte-range splitting of ONE huge file is what
  *    readOboTerms' lineSep path provides; both coexist by design).
  *
  * Pushed filters are re-applied by Spark above the scan (they are also
  * returned as residuals) — pushdown here is an I/O reduction, never a
  * correctness dependency. Reference analog: python/obo.py, consumed by
  * loaders/load-Ontologies.py / load-DTO.py.
  */
class OboSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OboSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OboTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object OboSource {
  val schema: StructType = StructType(Seq(
    StructField("term_id", StringType),
    StructField("name", StringType),
    StructField("parents", ArrayType(StringType))))

  private val IdRe = """(?m)^id: (\S+)""".r
  private val NameRe = """(?m)^name: (.*)$""".r
  private val IsaRe = """(?m)^is_a: (\S+)""".r

  /** Split raw OBO file content into [Term] stanza bodies (the text after
    * each "[Term]" header, cut at the next "[X]" header). */
  def stanzaBodies(content: String): Iterator[String] =
    content.split("""\[Term\]""").iterator.drop(1)
      .map(s => s.split("""(?m)^\[""", 2)(0))

  def extractId(stanza: String): String =
    IdRe.findFirstMatchIn(stanza).map(_.group(1)).getOrElse("")
  def extractName(stanza: String): String =
    NameRe.findFirstMatchIn(stanza).map(_.group(1)).getOrElse("")
  def extractParents(stanza: String): Array[String] =
    IsaRe.findAllMatchIn(stanza).map(_.group(1)).toArray
}

class OboTable(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-obo:$path"
  override def schema(): StructType = OboSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OboScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new OboWriteBuilder(path, info.schema())
}

class OboScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = OboSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countStar = false

  /** Partial COUNT(*) pushdown: each partition emits ONE pre-counted row
    * (stanza-id probes only — no name/is_a parsing, no row
    * materialization) and Spark sums the partials. Only when nothing
    * else is pushed: residual filters or a limit change the count. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar] &&
      pushed.isEmpty && limit < 0
    if (ok) countStar = true
    ok
  }

  /** LIMIT pushdown: each partition stops parsing after `limit` rows.
    * Partial push (Spark keeps the global limit; we only bound per-file
    * work — the safe contract for a multi-partition source). */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  /** Accept filters the reader can evaluate on the parsed id/name; return
    * ALL filters as residual so Spark re-applies them (pushdown is an
    * optimization, never the only evaluation). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo(a, _) => a == "term_id" || a == "name"
      case StringStartsWith(a, _) => a == "term_id" || a == "name"
      case IsNotNull(a) => a == "term_id" || a == "name"
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (countStar) new OboCountScan(path) else new OboScan(path, required, pushed, limit)
}

/** COUNT(*)-pushed scan: one partial-count row per file. */
class OboCountScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType)))
  override def description(): String = s"graft-obo path=$path, agg=count(*)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    OboScan.listFiles(path).map(f => OboInputPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val file = partition.asInstanceOf[OboInputPartition].file
          private var done = false
          private var row: InternalRow = _
          override def next(): Boolean =
            if (done) false
            else {
              val n = OboScan.readContent(file) match {
                case content => OboSource.stanzaBodies(content)
                  .count(st => OboSource.extractId(st).nonEmpty)
              }
              row = new GenericInternalRow(Array[Any](n.toLong))
              done = true
              true
            }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
    }
}

object OboScan {
  /** Driver-side file listing (hidden files excluded, stable order). */
  def listFiles(path: String): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
        .sortBy(_.toString).map(_.toString)
    else Array(path)
  }

  /** Executor-side whole-file read (stanza files are record-grain). */
  def readContent(file: String): String = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0, bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }
}

class OboScan(path: String, required: StructType, pushed: Array[Filter],
              limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-obo path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}, limit=$limit"
  override def toBatch: Batch = this

  /** One partition per file — listed once, on the driver. */
  override def planInputPartitions(): Array[InputPartition] =
    OboScan.listFiles(path).map(f => OboInputPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new OboReaderFactory(required.fieldNames, pushed, limit)
}

case class OboInputPartition(file: String) extends InputPartition

class OboReaderFactory(fieldNames: Array[String], pushed: Array[Filter],
                       limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OboPartitionReader(partition.asInstanceOf[OboInputPartition].file,
      fieldNames, pushed, limit)
}

/** Executor-side reader: parses one file's stanzas, applies pushed filters
  * on the cheap fields before materializing rows, and builds only the
  * pruned columns. */
class OboPartitionReader(file: String, fieldNames: Array[String],
                         pushed: Array[Filter], limit: Int)
    extends PartitionReader[InternalRow] {

  private var emitted = 0

  private val needName = fieldNames.contains("name") ||
    pushed.exists { case EqualTo("name", _) => true
                    case StringStartsWith("name", _) => true
                    case _ => false }
  private val needParents = fieldNames.contains("parents")

  private val stanzas: Iterator[(String, String)] =
    OboSource.stanzaBodies(OboScan.readContent(file))
      .map(st => (OboSource.extractId(st), st))
      .filter { case (id, _) => id.nonEmpty }

  private def passes(id: String, name: => String): Boolean =
    pushed.forall {
      case EqualTo("term_id", v) => id == v
      case StringStartsWith("term_id", v) => id.startsWith(v)
      case EqualTo("name", v) => name == v
      case StringStartsWith("name", v) => name.startsWith(v)
      case IsNotNull(_) => true
      case _ => true
    }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (stanzas.hasNext) {
      val (id, st) = stanzas.next()
      lazy val name = OboSource.extractName(st)
      if (passes(id, name)) {
        val values = fieldNames.map {
          case "term_id" => UTF8String.fromString(id)
          case "name" => UTF8String.fromString(if (needName) name else "")
          case "parents" =>
            new GenericArrayData(
              (if (needParents) OboSource.extractParents(st) else Array.empty[String])
                .map(UTF8String.fromString(_): Any))
        }
        current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

// ---------------------------------------------------------------------------
// Write path (SURVEY.md §2.5 src_dsv2, write tier): the full V2 commit
// protocol. Each task streams its rows as [Term] stanzas into a staged
// file and reports it in a WriterCommitMessage; the DRIVER's job commit
// renames exactly the reported files into place (one per partition — Spark
// commits at most one attempt per partition) and drops the staging dir, so
// readers never observe a half-written load and a failed/zombie attempt's
// file is simply never renamed. Truncate (SaveMode.Overwrite) removes the
// previous part files inside the same job commit.
// ---------------------------------------------------------------------------

class OboWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      private val t = doTruncate
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new OboBatchWrite(path, schema, t)
    }
}

case class OboCommitMessage(stagedFile: String, partitionId: Int, nTerms: Long)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class OboBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val stagingDir = s"$path/_staging"

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new OboWriterFactory(stagingDir, schema.fieldNames)

  override def commit(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    if (truncate)
      OboScan.listFiles(path).foreach(f => fs.delete(new Path(f), false))
    var total = 0L
    messages.collect { case m: OboCommitMessage => m }.foreach { m =>
      fs.rename(new Path(m.stagedFile),
        new Path(root, f"part-${m.partitionId}%05d.obo"))
      total += m.nTerms
    }
    fs.delete(new Path(stagingDir), true)
    // informational job summary; underscore-prefixed so scans skip it
    val out = fs.create(new Path(root, "_obo_manifest"), true)
    try out.write(s"n_terms=$total\n".getBytes("UTF-8")) finally out.close()
  }

  override def abort(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = new Path(stagingDir).getFileSystem(new Configuration())
    fs.delete(new Path(stagingDir), true)
  }
}

class OboWriterFactory(stagingDir: String, fieldNames: Array[String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new OboDataWriter(stagingDir, fieldNames, partitionId, taskId)
}

/** Executor-side writer: streams stanzas to `_staging/part-<pid>-<tid>`;
  * the attempt-unique task id keeps concurrent attempts from colliding.
  * commit() hands the staged name to the driver; abort() deletes it. */
class OboDataWriter(stagingDir: String, fieldNames: Array[String],
                    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val file = new Path(s"$stagingDir/part-$partitionId-$taskId.obo")
  private val fs = file.getFileSystem(new Configuration())
  private val out = fs.create(file, true)
  private var n = 0L

  private val idIdx = fieldNames.indexOf("term_id")
  private val nameIdx = fieldNames.indexOf("name")
  private val parentsIdx = fieldNames.indexOf("parents")

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("[Term]\n")
    if (idIdx >= 0 && !row.isNullAt(idIdx))
      sb.append("id: ").append(row.getUTF8String(idIdx).toString).append('\n')
    if (nameIdx >= 0 && !row.isNullAt(nameIdx))
      sb.append("name: ").append(row.getUTF8String(nameIdx).toString).append('\n')
    if (parentsIdx >= 0 && !row.isNullAt(parentsIdx)) {
      val arr = row.getArray(parentsIdx)
      var i = 0
      while (i < arr.numElements()) {
        sb.append("is_a: ").append(arr.getUTF8String(i).toString).append('\n')
        i += 1
      }
    }
    sb.append('\n')
    out.write(sb.toString.getBytes("UTF-8"))
    n += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    OboCommitMessage(file.toString, partitionId, n)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}

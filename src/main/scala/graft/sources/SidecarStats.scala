package graft.sources

import graft.Q
import graft.functions.KmvAgg
import graft.sources.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-backed catalog statistics (SURVEY.md §2.5 conf_sidecar_stats):
  * fold the zone sidecar's per-file (count, nulls, min, max, KMV sketch)
  * rows into TABLE-level statistics and inject them into the session
  * catalog — the optimizer gets ANALYZE-quality row counts and column
  * NDV/min/max WITHOUT the stats job's table scan.
  *
  * The reference refreshes MySQL index statistics after each load
  * (ANALYZE in the loader commit path around `loaders/TCRD.py`'s inserts);
  * at 100 TB an ANALYZE-style second read of the data is a job of the
  * same size as the load itself. The zone sidecar already holds every
  * per-file statistic the optimizer wants — collected in the SAME
  * aggregation pass that wrote the data ([[ZoneIndex.writeWithZoneIndex]])
  * and kept fresh under append ingest ([[ZoneIndex.refreshIncremental]]) —
  * so table stats become a planner-sized FOLD over sidecar rows:
  *   - rowCount  = Σ per-file counts (exact);
  *   - nullCount = Σ per-file null counts (exact);
  *   - min/max   = min/max over per-file zone bounds (exact);
  *   - NDV       = KMV union over per-file sketches (mergeable by
  *     construction; exact below the sketch's k, ~3% error above it).
  *
  * With `spark.sql.cbo.enabled` these drive filter selectivity, join
  * reorder, and build-side choice exactly as ANALYZE-computed stats do —
  * they land in the SAME `CatalogStatistics` slot. SidecarStatsSpec pins
  * that the fold never touches a data file (stats computable after the
  * data files are gone) and that the injected estimates propagate.
  */
object SidecarStats {

  /** Table-level statistics for one covered column, folded from the
    * sidecar. `min`/`max` are None for columns whose zones are non-numeric
    * (string-typed covered columns — their NDV/null stats still hold). */
  final case class ColStats(rows: Long, nulls: Long, ndv: Long,
                            min: Option[Double], max: Option[Double])

  /** Fold the `_zone_index` sidecar at `path` into per-column table stats.
    * Reads ONLY the sidecar (#files × #cols rows, planner-sized); the
    * data files are never opened. */
  def tableStats(spark: SparkSession, path: String): Map[String, ColStats] = {
    val rows = spark.read.parquet(SidecarLayout.sidecarDir(spark, path, "_zone_index"))
      .select("col", "cnt", "nulls", "zmin", "zmax", "kmv").collect()
    rows.groupBy(_.getString(0)).map { case (c, rs) =>
      val mins = rs.collect { case r if !r.isNullAt(3) => r.getDouble(3) }
      val maxs = rs.collect { case r if !r.isNullAt(4) => r.getDouble(4) }
      val merged = rs.map(_.getAs[Array[Byte]](5)).reduce(KmvAgg.union)
      c -> ColStats(
        rows = rs.map(_.getLong(1)).sum,
        nulls = rs.map(_.getLong(2)).sum,
        ndv = math.round(KmvAgg.estimateDistinct(merged)),
        min = mins.minOption,
        max = maxs.maxOption)
    }
  }

  /** Total bytes of the data files under `path` (sidecar and other
    * underscore-prefixed entries excluded) — the `sizeInBytes` the
    * planner would otherwise derive itself from the file listing. */
  def dataBytes(spark: SparkSession, path: String): Long =
    SidecarLayout.dataFiles(spark, path).map(_.getLen).sum

  /** Register the parquet directory at `path` as external table `table`
    * and attach sidecar-folded statistics to the catalog — the scan-free
    * ANALYZE. Returns the injected statistics. Columns without a sidecar
    * row simply carry no column stats (same as an un-ANALYZEd column);
    * min/max are injected only for integral/floating columns, where the
    * sidecar's double zones round-trip exactly. */
  def registerWithStats(spark: SparkSession, path: String,
                        table: String): CatalogStatistics = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$path'")
    val folded = tableStats(spark, path)
    val schema = spark.table(table).schema
    val colStats: Map[String, CatalogColumnStat] = folded.flatMap { case (c, st) =>
      schema.find(_.name == c).map { f =>
        val (mn, mx) = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            (st.min.map(_.toLong.toString), st.max.map(_.toLong.toString))
          case FloatType | DoubleType =>
            (st.min.map(_.toString), st.max.map(_.toString))
          case _ => (None, None) // non-numeric zones: NDV/nulls only
        }
        val len = f.dataType.defaultSize.toLong
        c -> CatalogColumnStat(
          distinctCount = Some(BigInt(st.ndv)),
          min = mn, max = mx,
          nullCount = Some(BigInt(st.nulls)),
          avgLen = Some(len), maxLen = Some(len))
      }
    }
    val rowCount = folded.values.headOption.map(_.rows).getOrElse(0L)
    val stats = CatalogStatistics(
      sizeInBytes = BigInt(dataBytes(spark, path)),
      rowCount = Some(BigInt(rowCount)),
      colStats = colStats)
    spark.sessionState.catalog.alterTableStats(TableIdentifier(table), Some(stats))
    stats
  }

  /** Exchange sizing from sidecar stats, no scan: partitions for a
    * shuffle over `path`'s data such that each lands ~`targetBytes`
    * (AQE coalesces lighter stages; this sets the upper bound the
    * deployer would otherwise guess). */
  def suggestedShufflePartitions(spark: SparkSession, path: String,
                                 targetBytes: Long = 256L << 20): Int =
    math.max(1, math.ceil(dataBytes(spark, path).toDouble / targetBytes).toInt)

  /** Partition count for a groupBy on `colName`: one partition per
    * `targetKeysPerPartition` distinct keys (sidecar NDV), so per-group
    * state stays bounded no matter how the table grew since deploy. */
  def suggestedAggPartitions(spark: SparkSession, path: String, colName: String,
                             targetKeysPerPartition: Long = 100000L): Int = {
    val ndv = tableStats(spark, path).get(colName).map(_.ndv).getOrElse(0L)
    math.max(1, math.ceil(ndv.toDouble / targetKeysPerPartition).toInt)
  }

  private val Covered = Seq("l_suppkey", "l_quantity", "l_extendedprice")

  /** Exact table statistics — count / nulls / min / max per covered
    * column — answered from sidecar bytes alone and hash-matched against
    * the oracle computing them from the data. The scan-free half of
    * ANALYZE, as a query. */
  val qStatsTable: Q = Q(
    "q_stats_table",
    Covered.map { c =>
      s"""SELECT '$c' AS col, count(*) AS cnt,
         |  count(*) - count($c) AS nulls,
         |  CAST(min($c) AS DOUBLE) AS minv, CAST(max($c) AS DOUBLE) AS maxv
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col")) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_stats").toFile.getAbsolutePath
    val li = T.lineitem(s, d).select((("l_orderkey" +: Covered).map(col)): _*)
    ZoneIndex.writeWithZoneIndex(li, s"$tmp/li", "l_orderkey", 8, Covered)
    val st = tableStats(s, s"$tmp/li")
    import s.implicits._
    Covered.sorted.map { c =>
      val cs = st(c)
      (c, cs.rows, cs.nulls, cs.min, cs.max)
    }.toDF("col", "cnt", "nulls", "minv", "maxv")
  }

  /** The approximate half: per-column NDV from the unioned per-file KMV
    * sketches (deterministic, but the estimator isn't SQL-portable →
    * rows-only; SidecarStatsSpec pins the ≤10% parity vs exact). */
  val qStatsNdv: Q = Q(
    "q_stats_ndv",
    """SELECT col, exact_ndv, TRUE AS ndv_within_tol FROM (
      |  SELECT 'l_extendedprice' AS col,
      |         COUNT(DISTINCT l_extendedprice) AS exact_ndv FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity', COUNT(DISTINCT l_quantity) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey', COUNT(DISTINCT l_suppkey) FROM lineitem)
      |ORDER BY col""".stripMargin) { (s, d) =>
    // fully oracled (r9) via the exact-half + certificate recipe: exact
    // per-column NDVs hash-match DuckDB; the sidecar's KMV-merged ndv
    // rides `ndv_within_tol` (±15% ≈ 5× the k=1024 bottom-k RSE; exact
    // below k) pinned TRUE by the oracle
    val tmp = java.nio.file.Files.createTempDirectory("graft_statsndv").toFile.getAbsolutePath
    val li = T.lineitem(s, d).select((("l_orderkey" +: Covered).map(col)): _*)
    ZoneIndex.writeWithZoneIndex(li, s"$tmp/li", "l_orderkey", 8, Covered)
    val st = tableStats(s, s"$tmp/li")
    val exact = T.lineitem(s, d)
      .select(Covered.map(c => countDistinct(col(c)).as(c)): _*).head
    import s.implicits._
    Covered.sorted.map { c =>
      val ex = exact.getAs[Long](c)
      // empty input writes no sidecar rows — ndv 0, matching exact 0
      val est = st.get(c).map(_.ndv).getOrElse(0L)
      (c, ex, math.abs(est - ex) <= math.max(math.ceil(0.15 * ex).toLong, 2L))
    }.toDF("col", "exact_ndv", "ndv_within_tol")
  }

  val all: Seq[Q] = Seq(qStatsTable, qStatsNdv)
}

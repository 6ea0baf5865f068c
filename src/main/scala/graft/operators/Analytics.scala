package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-2 analytic capabilities (SURVEY.md §2.2/§2.3 additions): CUBE,
  * range/interval join, deciles, running totals, correlation, histograms,
  * date-spine gap fill, SCD2 history builds.
  *
  * Reference analogs: the QC rollups and per-dimension summary matrices in
  * doc/TCRD_Build_Notes.txt and R/*.R (correlation/normalization passes),
  * and the MySQL upsert history every loader keeps (ins_*/upd_* in
  * loaders/TCRD.py) — re-expressed as declarative window/join plans.
  */
object Analytics {

  /** CUBE over (region, order status): all 2^2 grouping sets in one
    * Expand-based pass — one shuffle, not 4 separate aggregations.
    * SQL entry point for the same Dataset-API quirk noted on q_rollup. */
  val qCube: Q = Q(
    "q_cube",
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE(r_name, o_orderstatus)
      |ORDER BY region, status""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .join(T.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("rn"), col("o_orderstatus").as("st"), col("o_totalprice"))
      .createOrReplaceTempView("graft_cube_base")
    s.sql(
      """SELECT COALESCE(rn, 'ALL') AS region, COALESCE(st, 'ALL') AS status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM graft_cube_base
        |GROUP BY CUBE(rn, st)
        |ORDER BY region, status""".stripMargin)
  }

  /** Range/interval join, the scale way: replicate each band onto every
    * fixed-width bucket it overlaps, equi-join fact rows by bucket, then
    * refine with the exact range predicate. The theta join a naive plan
    * would use (BroadcastNestedLoop at best, cartesian at worst) becomes a
    * hash join whose key is uniform by construction — this is how you
    * range-join 100 TB of facts against an interval dimension. */
  def bucketedRangeJoin(fact: DataFrame, factCol: Column, bands: DataFrame,
                        width: Long): DataFrame = {
    // replicate through floor(hi/w) inclusive — the exact range refine
    // below filters the (at most one) spurious boundary bucket; an epsilon
    // trick would silently drop matches when hi sits fractionally above a
    // bucket boundary. greatest() keeps degenerate (hi < lo) bands on
    // their lo bucket instead of feeding sequence() a descending range.
    val b = bands.withColumn("bucket",
      explode(sequence(floor(col("lo") / width).cast(LongType),
        greatest(floor(col("lo") / width).cast(LongType),
          floor(col("hi") / width).cast(LongType)))))
    fact.withColumn("bucket", floor(factCol / width).cast(LongType))
      .join(broadcast(b), Seq("bucket"))
      .filter(factCol >= col("lo") && factCol < col("hi"))
      .drop("bucket")
  }

  /** Orders bucketed into fixed price bands via the bucketed range join;
    * the oracle states the same join as a plain range predicate. */
  val qRangeJoin: Q = Q(
    "q_range_join",
    """SELECT band, lo, hi, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |JOIN (SELECT r // 50000 AS band, CAST(r AS DOUBLE) AS lo,
      |             CAST(r + 50000 AS DOUBLE) AS hi
      |      FROM range(0, 600000, 50000) t(r)) bands
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band, lo, hi
      |ORDER BY band""".stripMargin) { (s, d) =>
    val bands = s.range(0, 12).select(col("id").as("band"),
      dbl(col("id") * 50000).as("lo"), dbl((col("id") + 1) * 50000).as("hi"))
    bucketedRangeJoin(T.orders(s, d), col("o_totalprice"), bands, 50000L)
      .groupBy("band", "lo", "hi")
      .agg(count(lit(1)).as("n_orders"),
        sumDbl(dec2(col("o_totalprice"))).as("sum_price"))
      .orderBy("band")
  }

  /** NTILE decile summary per segment (rank-normalization passes in
    * R/gtex_process.R): tie-broken total order so tiles are deterministic. */
  val qNtile: Q = Q(
    "q_ntile",
    """SELECT c_mktsegment, tile, COUNT(*) AS cnt,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM (SELECT c_mktsegment, o_totalprice,
      |        NTILE(10) OVER (PARTITION BY c_mktsegment
      |                        ORDER BY o_totalprice, o_orderkey) AS tile
      |      FROM orders JOIN customer ON o_custkey = c_custkey)
      |GROUP BY c_mktsegment, tile
      |ORDER BY c_mktsegment, tile""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    T.orders(s, d)
      .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("tile", lng(ntile(10).over(w)))
      .groupBy("c_mktsegment", "tile")
      .agg(count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("c_mktsegment", "tile")
  }

  /** Running total per entity (cumulative spend per customer over time) —
    * one shuffle on the partition key; the running sum is exact decimal. */
  val qRunningTotal: Q = Q(
    "q_running_total",
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        dbl(sum(dec2(col("o_totalprice"))).over(w)).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Pearson correlation per group from exact decimal moment sums (the
    * R-script correlation passes, e.g. R/process-CCLE.R): the five sums are
    * order-independent decimals; the r formula is one fixed-shape double
    * computation per group. */
  val qCorr: Q = Q(
    "q_corr",
    """WITH m AS (SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS r,
      |  CAST(n AS BIGINT) AS cnt
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val x = dec2(col("l_quantity")); val y = dec2(col("l_extendedprice"))
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(dbl(count(lit(1))).as("n"),
        sumDbl(x).as("sx"), sumDbl(y).as("sy"),
        sumDbl(x * y).as("sxy"), sumDbl(x * x).as("sxx"), sumDbl(y * y).as("syy"))
      .select(col("l_returnflag"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r"),
        lng(col("n")).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** Fixed-width histogram with per-group shares — a single map-side
    * bucketing expression, no per-bucket scan. */
  val qHistogram: Q = Q(
    "q_histogram",
    """WITH h AS (SELECT l_returnflag,
      |    CAST(floor(l_quantity / 5.0) AS BIGINT) AS bucket, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, bucket, cnt,
      |  round(CAST(cnt AS DOUBLE) /
      |        CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS DOUBLE), 6) AS share
      |FROM h ORDER BY l_returnflag, bucket""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_returnflag")
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"), lng(floor(col("l_quantity") / 5.0)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share", round(dbl(col("cnt")) / dbl(sum(col("cnt")).over(w)), 6))
      .orderBy("l_returnflag", "bucket")
  }

  /** Calendar-spine gap fill: generate the full month range between the
    * data's min and max, left-join actual monthly counts, zero-fill. The
    * spine is generated (a few hundred rows at any scale), never scanned. */
  val qDateSpine: Q = Q(
    "q_date_spine",
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon, COUNT(*) AS cnt
      |           FROM orders GROUP BY 1),
      |  r AS (SELECT MIN(mon) AS lo, MAX(mon) AS hi FROM m),
      |  spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM r)
      |SELECT strftime(spine.mon, '%Y-%m') AS month,
      |  CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders
      |FROM spine LEFT JOIN m ON spine.mon = m.mon
      |ORDER BY month""".stripMargin) { (s, d) =>
    val monthly = T.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("cnt"))
    val spine = monthly.agg(min("mon").as("lo"), max("mon").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("mon"))
    spine.join(monthly, Seq("mon"), "left")
      .select(date_format(col("mon"), "yyyy-MM").as("month"),
        lng(coalesce(col("cnt"), lit(0))).as("n_orders"))
      .orderBy("month")
  }

  /** SCD2 history build (the MySQL ins/upd history every loader maintains,
    * loaders/TCRD.py): order each entity's change events, valid_from = ts,
    * valid_to = next change, open interval = current. Times are exact
    * integer microseconds (engine-independent). */
  val qScd2: Q = Q(
    "q_scd2",
    """SELECT user_id, event_id, epoch_us(ts) AS valid_from,
      |  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS valid_to,
      |  (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) IS NULL) AS is_current,
      |  value
      |FROM events WHERE event_type = 'signup'
      |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    T.events(s, d)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("valid_from"), col("value"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"), col("value"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** One-pass data-quality profile: row count, null count, exact distinct
    * count, min/max per profiled column — the QC gate every ingest runs
    * (python/csv2sql.py sanity checks, TCRD build-notes audits). One scan,
    * one aggregation (Spark expands multi-distinct internally); min/max
    * are canonicalized to strings via DECIMAL so engines render equally. */
  val qProfile: Q = Q(
    "q_profile",
    """WITH a AS (SELECT COUNT(*) AS n_rows,
      |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_name,
      |    CAST(COUNT(DISTINCT c_name) AS BIGINT) AS nd_name,
      |    CAST(MIN(c_name) AS VARCHAR) AS mn_name, CAST(MAX(c_name) AS VARCHAR) AS mx_name,
      |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_seg,
      |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS nd_seg,
      |    CAST(MIN(c_mktsegment) AS VARCHAR) AS mn_seg, CAST(MAX(c_mktsegment) AS VARCHAR) AS mx_seg,
      |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_bal,
      |    CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS nd_bal,
      |    CAST(CAST(MIN(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR) AS mn_bal,
      |    CAST(CAST(MAX(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR) AS mx_bal
      |  FROM customer)
      |SELECT * FROM (
      |  SELECT 'c_name' AS col_name, n_rows, nn_name AS n_nulls, nd_name AS n_distinct,
      |         mn_name AS min_val, mx_name AS max_val FROM a
      |  UNION ALL
      |  SELECT 'c_mktsegment', n_rows, nn_seg, nd_seg, mn_seg, mx_seg FROM a
      |  UNION ALL
      |  SELECT 'c_acctbal', n_rows, nn_bal, nd_bal, mn_bal, mx_bal FROM a)
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    def prof(c: String, canon: Column => Column) = Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).cast(LongType).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      canon(min(col(c))).cast(StringType).as(s"mn_$c"),
      canon(max(col(c))).cast(StringType).as(s"mx_$c"))
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      prof("c_name", identity) ++ prof("c_mktsegment", identity) ++
      prof("c_acctbal", _.cast(DecimalType(12, 2)))
    val a = T.customer(s, d).agg(aggs.head, aggs.tail: _*)
    val rows = Seq("c_name", "c_mktsegment", "c_acctbal").map { c =>
      a.select(lit(c).as("col_name"), col("n_rows"),
        col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val"))
    }
    rows.reduce(_.union(_)).orderBy("col_name")
  }

  /** Robust outlier detection via median absolute deviation: per-group
    * median and MAD (both exact percentiles), robust z = (x - med) /
    * (1.4826·MAD), emit |z| >= 1.4 (the tail screen for this uniform-tailed test data; real-world data uses 2.5-3). Two grouped percentile passes + one
    * broadcast join per stage — the outlier screen that, unlike the
    * mean/stddev z-score (q_zscore), a few extreme rows cannot poison. */
  val qMadOutliers: Q = Q(
    "q_mad_outliers",
    """WITH med AS (SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS med
      |             FROM customer GROUP BY 1),
      |dev AS (SELECT c_custkey, c.c_mktsegment, c_acctbal, med,
      |          abs(c_acctbal - med) AS ad
      |        FROM customer c JOIN med USING (c_mktsegment)),
      |mad AS (SELECT c_mktsegment, quantile_cont(ad, 0.5) AS mad
      |        FROM dev GROUP BY 1)
      |SELECT c_custkey, dev.c_mktsegment, c_acctbal,
      |  round((c_acctbal - med) / (1.4826 * mad), 4) AS robust_z
      |FROM dev JOIN mad USING (c_mktsegment)
      |WHERE abs(round((c_acctbal - med) / (1.4826 * mad), 4)) >= 1.4
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val med = c.groupBy("c_mktsegment")
      .agg(percentile(col("c_acctbal"), lit(0.5)).as("med"))
    val dev = c.join(broadcast(med), "c_mktsegment")
      .withColumn("ad", abs(col("c_acctbal") - col("med")))
    val mad = dev.groupBy(col("c_mktsegment").as("seg2"))
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), col("c_mktsegment") === col("seg2"))
      .withColumn("robust_z",
        round((col("c_acctbal") - col("med")) / (lit(1.4826) * col("mad")), 4))
      .filter(abs(col("robust_z")) >= 1.4)
      .select("c_custkey", "c_mktsegment", "c_acctbal", "robust_z")
      .orderBy("c_custkey")
  }

  /** Ranked substring search (the tcrd_app.py search endpoint shape):
    * exact match beats prefix beats contains, ties broken by key — a
    * full-scan LIKE at this grain; at warehouse scale the same ranking
    * runs over an inverted token index (see q_dict_tag's tokenization). */
  val qSearch: Q = Q(
    "q_search",
    """SELECT p_partkey, p_name,
      |  CAST(CASE WHEN p_name = 'bolt' THEN 0
      |       WHEN p_name LIKE 'bolt%' THEN 1
      |       ELSE 2 END AS BIGINT) AS relevance
      |FROM part WHERE p_name LIKE '%bolt%'
      |ORDER BY relevance, p_partkey LIMIT 50""".stripMargin) { (s, d) =>
    T.part(s, d)
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"), col("p_name"),
        lng(when(col("p_name") === "bolt", 0)
          .when(col("p_name").like("bolt%"), 1)
          .otherwise(2)).as("relevance"))
      .orderBy("relevance", "p_partkey")
      .limit(50)
  }

  /** The serving-layer "search page" in one plan (tcrd_app.py's target
    * listing: ranked hits + per-facet counts + total, paginated): one scan
    * computes the hit set; from it, (a) page 2 of ranked results (ranks
    * 11-20), (b) top-5 facet counts for two dimensions, (c) the total hit
    * count — unioned into one sectioned result, the payload a search API
    * returns per request. Facets aggregate the FULL hit set (as a real
    * facet panel does), not just the visible page. */
  val qFacetSearch: Q = Q(
    "q_facet_search",
    """WITH hits AS (
      |  SELECT p_partkey, p_name, p_brand, p_type,
      |    CAST(CASE WHEN p_name = 'bolt' THEN 0
      |         WHEN p_name LIKE 'bolt%' THEN 1 ELSE 2 END AS BIGINT) AS relevance
      |  FROM part WHERE p_name LIKE '%bolt%'),
      |page AS (
      |  SELECT 'hits' AS section, p_name AS label, rnk, p_partkey AS n FROM (
      |    SELECT p_partkey, p_name,
      |      ROW_NUMBER() OVER (ORDER BY relevance, p_partkey) AS rnk
      |    FROM hits)
      |  WHERE rnk BETWEEN 11 AND 20),
      |fb AS (
      |  SELECT 'facet:brand' AS section, p_brand AS label,
      |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_brand) AS rnk,
      |    COUNT(*) AS n
      |  FROM hits GROUP BY p_brand QUALIFY rnk <= 5),
      |ft AS (
      |  SELECT 'facet:type' AS section, p_type AS label,
      |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_type) AS rnk,
      |    COUNT(*) AS n
      |  FROM hits GROUP BY p_type QUALIFY rnk <= 5),
      |tot AS (SELECT 'total' AS section, '' AS label, CAST(0 AS BIGINT) AS rnk, COUNT(*) AS n FROM hits)
      |SELECT section, label, rnk, n FROM
      |  (SELECT * FROM page UNION ALL SELECT * FROM fb
      |   UNION ALL SELECT * FROM ft UNION ALL SELECT * FROM tot)
      |ORDER BY section, rnk""".stripMargin) { (s, d) =>
    val hits = T.part(s, d)
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        lng(when(col("p_name") === "bolt", 0)
          .when(col("p_name").like("bolt%"), 1)
          .otherwise(2)).as("relevance"))
      // the hit set feeds four branches below — materialize once
      .localCheckpoint(true)
    val page = hits
      .withColumn("rnk",
        row_number().over(Window.orderBy("relevance", "p_partkey")).cast("long"))
      .filter(col("rnk") >= 11 && col("rnk") <= 20)
      .select(lit("hits").as("section"), col("p_name").as("label"),
        col("rnk"), col("p_partkey").as("n"))
    def facet(c: String): DataFrame =
      hits.groupBy(col(c).as("label")).agg(count(lit(1)).as("n"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("n").desc, col("label"))).cast("long"))
        .filter(col("rnk") <= 5)
        .select(lit(s"facet:${c.stripPrefix("p_")}").as("section"),
          col("label"), col("rnk"), col("n"))
    val tot = hits.agg(count(lit(1)).as("n"))
      .select(lit("total").as("section"), lit("").as("label"),
        lit(0L).as("rnk"), col("n"))
    page.unionByName(facet("p_brand")).unionByName(facet("p_type")).unionByName(tot)
      .orderBy("section", "rnk")
  }

  val all: Seq[Q] = Seq(qCube, qRangeJoin, qNtile, qRunningTotal, qCorr,
    qHistogram, qDateSpine, qScd2, qProfile, qMadOutliers, qSearch, qFacetSearch)
}

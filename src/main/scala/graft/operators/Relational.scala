package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational capabilities of the reference pipeline, re-expressed as
  * declarative Spark plans (SURVEY.md §2.2).
  *
  * Scale notes baked into every query:
  *  - dimension tables (region/nation/supplier/part at warehouse scale) are
  *    `broadcast()` so only fact-fact joins shuffle;
  *  - aggregates go decimal-exact (see [[graft.functions.Exact]]);
  *  - outputs carry a total ORDER BY with a unique tie-break so results are
  *    deterministic under any partitioning.
  */
object Relational {

  /** TPC-H Q1 shape: scan-filter-aggregate with map-side partial agg.
    * Reference analog: per-dataset rollup stats in loaders/load-ChEMBL.py. */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumDbl(dec2(col("l_quantity"))).as("sum_qty"),
        sumDbl(dec2(col("l_extendedprice"))).as("sum_base_price"),
        sumDbl(discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        sumDbl(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Star-schema enrichment join (xref/HGNC pattern, loaders/load-HGNC.py):
    * fact rows pick up names from two broadcast dims — zero shuffle. */
  val qEnrichJoin: Q = Q(
    "q_enrich_join",
    """SELECT c_custkey, c_name, c_mktsegment, n_name, r_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_name", "c_mktsegment", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** TPC-H Q3 shape: selective dim filter → fact join → agg → top-N. */
  val qTopRevenue: Q = Q(
    "q_top_revenue",
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
    val cutoff = lit("1998-01-01 00:00:00").cast(TimestampType)
    T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(T.orders(s, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sumDbl(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q5 shape: 6-way join; all dims broadcast, lineitem⋈orders is the
    * only shuffled join. Flagship query (SparkEntry.entry). */
  val qRegionVolume: Q = Q(
    "q_region_volume",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumDbl(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join (EXISTS): entities having supporting evidence
    * (loaders/load-UniProtXRefs.py: targets with an xref). */
  val qSemiJoin: Q = Q(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): "dark" entities with no evidence
    * (the Tdark side of loaders/load-TDLs.py). */
  val qAntiJoin: Q = Q(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast(TimestampType)),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Multi-source union + distinct: disease associations arriving from many
    * upstream sources (loaders/load-Diseases.py merges 5+ sources). */
  val qUnionDedup: Q = Q(
    "q_union_dedup",
    """SELECT entity, source FROM (
      |  SELECT DISTINCT o_custkey AS entity, 'high_value' AS source
      |  FROM orders WHERE o_totalprice > 400000
      |  UNION
      |  SELECT DISTINCT o_custkey AS entity, 'urgent' AS source
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY entity, source""".stripMargin) { (s, d) =>
    val o = T.orders(s, d)
    val a = o.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("entity"), lit("high_value").as("source"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("entity"), lit("urgent").as("source"))
    a.union(b).distinct().orderBy("entity", "source")
  }

  /** Multi-valued field split + explode (loaders/load-GWASCatalog.py SNP
    * lists): global token frequencies from the documents table. */
  val qExplodeSplit: Q = Q(
    "q_explode_split",
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY cnt DESC, token LIMIT 50""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(50)
  }

  /** Long→wide pivot (R/gtex_process.R expression matrix shaping):
    * revenue per nation pivoted across return flags. */
  val qPivot: Q = Q(
    "q_pivot",
    """SELECT n_name,
      |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS A,
      |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS N,
      |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS R
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(dec2(col("l_extendedprice"))))
      .select(col("n_name"),
        dbl(coalesce(col("A"), lit(0))).as("A"),
        dbl(coalesce(col("N"), lit(0))).as("N"),
        dbl(coalesce(col("R"), lit(0))).as("R"))
      .orderBy("n_name")
  }

  /** Wide→long unpivot (python/cnv-HarmonizomeExport.py matrix→rows). */
  val qUnpivot: Q = Q(
    "q_unpivot",
    """SELECT p_partkey, metric, val FROM (
      |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part)
      |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
    T.part(s, d)
      .select(col("p_partkey"),
        col("p_retailprice").as("retailprice"),
        dbl(col("p_size")).as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "metric", "val")
      .orderBy("p_partkey", "metric")
  }

  /** Hierarchical ROLLUP (QC rollup counts in doc/TCRD_Build_Notes.txt):
    * region → nation → grand total. NULL group keys are coalesced to 'ALL'
    * so the output is null-free and ordering is engine-independent. */
  val qRollup: Q = Q(
    "q_rollup",
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin) { (s, d) =>
    // Native single-pass ROLLUP (Catalyst Expand); the SQL entry point
    // sidesteps a Dataset-API attribute-ambiguity quirk with coalesced
    // grouping columns.
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("rn"), col("n_name").as("nn"), col("c_acctbal"))
      .createOrReplaceTempView("graft_rollup_base")
    s.sql(
      """SELECT COALESCE(rn, 'ALL') AS region, COALESCE(nn, 'ALL') AS nation,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM graft_rollup_base
        |GROUP BY ROLLUP(rn, nn)
        |ORDER BY region, nation""".stripMargin)
  }

  /** rank() top-k per group (loaders/load-KEGGNearestTclins.py picks the
    * best-ranked neighbor per target): top-3 parts by revenue per brand. */
  val qWindowTopk: Q = Q(
    "q_window_topk",
    """SELECT p_brand, p_partkey, revenue, rnk FROM (
      |  SELECT p_brand, p_partkey, revenue,
      |    RANK() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
      |  FROM (
      |    SELECT p_brand, p_partkey,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey))
      |WHERE rnk <= 3
      |ORDER BY p_brand, rnk, p_partkey""".stripMargin) { (s, d) =>
    val rev = T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sumDbl(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", lng(rank().over(w)))
      .filter(col("rnk") <= 3)
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  /** lag() year-over-year delta (loaders/load-GeneRIF_Years.py series). */
  val qLagDelta: Q = Q(
    "q_lag_delta",
    """SELECT o_orderstatus, yr, cnt, cnt - COALESCE(LAG(cnt) OVER (PARTITION BY o_orderstatus ORDER BY yr), 0) AS delta
      |FROM (SELECT o_orderstatus, year(o_orderdate) AS yr, COUNT(*) AS cnt
      |      FROM orders GROUP BY 1, 2)
      |ORDER BY o_orderstatus, yr""".stripMargin) { (s, d) =>
    val byYear = T.orders(s, d)
      .groupBy(col("o_orderstatus"), lng(year(col("o_orderdate"))).as("yr"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus").orderBy("yr")
    byYear
      .withColumn("delta", col("cnt") - coalesce(lag(col("cnt"), 1).over(w), lit(0L)))
      .orderBy("o_orderstatus", "yr")
  }

  /** Exact per-group percentiles (R/gtex_process.R median/rank norm).
    * Interpolated percentile is double math on sorted exact inputs; a
    * round(4) guards the one-ulp interpolation differences. */
  val qPercentile: Q = Q(
    "q_percentile",
    """SELECT c_mktsegment,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
      |  COUNT(*) AS cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      // one percentile aggregate for both targets (the array form): two
      // separate percentile() calls each buffer + shuffle + sort the
      // full per-group value multiset; one buffer serves both reads,
      // per-element results identical
      .agg(percentile(col("o_totalprice"), array(lit(0.5), lit(0.9))).as("__ps"),
        count(lit(1)).as("cnt"))
      .select(col("c_mktsegment"),
        round(element_at(col("__ps"), 1), 4).as("median_price"),
        round(element_at(col("__ps"), 2), 4).as("p90_price"),
        col("cnt"))
      .orderBy("c_mktsegment")
  }

  /** Per-group standardization (R/process-CCLE.R z-scores). Mean/variance
    * from exact decimal sums; the z formula is fixed-shape double math. */
  val qZscore: Q = Q(
    "q_zscore",
    """WITH stats AS (
      |  SELECT c_mktsegment,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s2,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c_custkey, c_mktsegment,
      |  round((c_acctbal - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
      |FROM customer JOIN stats USING (c_mktsegment)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val stats = c.groupBy("c_mktsegment")
      .agg(
        sumDbl(dec2(col("c_acctbal"))).as("s1"),
        sumDbl(dec2(col("c_acctbal")) * dec2(col("c_acctbal"))).as("s2"),
        dbl(count(lit(1))).as("n"))
    c.join(broadcast(stats), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"),
        round((col("c_acctbal") - col("s1") / col("n")) /
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6).as("z"))
      .orderBy("c_custkey")
  }

  /** JSON field extraction (web-API JSON loaders, e.g. loaders/load-TIGA.py):
    * Spark side uses a real from_json; oracle extracts with a regex. */
  val qJsonExtract: Q = Q(
    "q_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    T.events(s, d)
      .withColumn("k",
        lng(from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k")))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, qEnrichJoin, qTopRevenue, qRegionVolume, qSemiJoin,
    qAntiJoin, qUnionDedup, qExplodeSplit, qPivot, qUnpivot, qRollup,
    qWindowTopk, qLagDelta, qPercentile, qZscore, qJsonExtract)
}

package graft.plans

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Checklist wiring for the custom TopKPerKey operator: same semantics
  * (and same oracle SQL) as q_window_topk, but planned through
  * TopKStrategy — heap-pruned before the exchange instead of a full
  * window sort. rank == row_number here because the ordering is total. */
object TopKQueries {

  val qTopkCustom: Q = Q(
    "q_topk_custom",
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
    val pruned = TopK.perKey(rev, Seq(col("p_brand")),
      Seq(col("revenue").desc, col("p_partkey").asc), 3)
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    pruned.withColumn("rnk", lng(row_number().over(w)))
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  val all: Seq[Q] = Seq(qTopkCustom)
}

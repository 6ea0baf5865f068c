package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4).
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is the
  * explicit fallback when one side has pathological hot keys (a handful of
  * keys carrying a large share of rows — e.g. one mega-customer, one
  * stopword shingle). The hot side gets a random-ish salt derived from a
  * row hash (deterministic, no RNG), the other side is replicated
  * `factor` times; the join key becomes (key, salt) so a hot key's rows
  * spread over `factor` reducers instead of one.
  *
  * Join-result equivalence to the unsalted join is exact (spec-verified):
  * every original pair (l, r) appears exactly once because r is replicated
  * across all salts and l picks exactly one salt.
  */
object SkewOps {

  /** Inner equi-join with the LEFT side treated as skewed.
    * @param factor number of salt buckets per key (2..shufflePartitions) */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
                      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // deterministic per-row salt: hash over all columns, uniform
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(factor)))
    val replicated = other
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    val joined = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
    // drop the helper + the duplicate right key column
    val rightCols = other.columns.filterNot(_ == key).map(replicated(_))
    joined.select(skewed.columns.map(salted(_)) ++ rightCols: _*)
  }

  /** Top hot keys by frequency — feed into AQE monitoring or a targeted
    * salt of only the hot keys (split-union plan). */
  def hotKeys(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key)).limit(topN)

  /** q_skew_audit's planning formula as a library call: per top key,
    * salt_factor = ceil(cnt · parts / total) — how many reducers that
    * key's rows need to occupy for balanced parallelism. The max over
    * the hot set is the `factor` to hand [[saltedInnerJoin]]; 1 means
    * no key needs salting. Key-cardinality-sized, never the fact table. */
  def suggestedSaltFactors(df: DataFrame, key: String, topN: Int,
                           parts: Int): DataFrame = {
    // materialize the key counts once: both the total and the rows read
    // them, and an uncached reference would scan + aggregate the FACT
    // table twice (the audit must stay key-cardinality-sized)
    val c = df.groupBy(col(key)).agg(count(lit(1)).as("cnt")).localCheckpoint(true)
    val t = c.agg(sum(col("cnt")).cast("long").as("n"))
    c.crossJoin(broadcast(t))
      .select(col(key), col("cnt"),
        ceil(col("cnt").cast("double") * parts / col("n").cast("double"))
          .cast("long").as("salt_factor"))
      .orderBy(col("cnt").desc, col(key)).limit(topN)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine exact arithmetic helpers.
  *
  * The correctness oracle (DuckDB) and Spark must produce bit-identical
  * doubles. Summing raw doubles is order-dependent, and partition order is
  * nondeterministic — so every aggregation over monetary/quantity columns
  * goes through DECIMAL (exact, order-independent), and doubles appear only
  * as a final deterministic scalar cast/computation. See SURVEY.md §5.
  */
object Exact {
  /** Prices / quantities / balances: all test data is exact at 2 dp and
    * < 10^10, so DECIMAL(12,2) is a lossless representation. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small factors in [0, ~1.1] (discount/tax): DECIMAL(3,2) lossless. */
  def decF(c: Column): Column = c.cast(DecimalType(3, 2))

  def dbl(c: Column): Column = c.cast(DoubleType)
  def lng(c: Column): Column = c.cast(LongType)

  /** Exact revenue term: price * (1 - discount), all decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(3, 2)) - decF(discount))

  /** Exact charge term: price * (1 - discount) * (1 + tax). */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1).cast(DecimalType(3, 2)) + decF(tax))

  /** Sum a per-row exact decimal expression and emit a double. */
  def sumDbl(c: Column): Column = dbl(sum(c))
}

package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers (SURVEY.md §7.2).
  *
  * Floating-point aggregation is reduction-order dependent, and Spark's
  * shuffle order differs run-to-run and engine-to-engine. Summing in
  * DECIMAL is exact and therefore order-independent: Spark and DuckDB
  * produce bit-identical results. The final value is cast to DOUBLE
  * (exact for < 2^53 scaled units) so output schemas are stable.
  */
object Det {

  /** Exact order-independent sum of a 2-decimal money column → DOUBLE. */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of an arbitrary double at 6-decimal quantization → DOUBLE. */
  def sumD6(c: Column): Column =
    sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Deterministic mean: exact decimal sum, double division, round(6). */
  def avgMoney(c: Column): Column =
    round(sumMoney(c) / count(lit(1)), 6)

  def avgD6(c: Column): Column =
    round(sumD6(c) / count(lit(1)), 6)

  /** Epoch seconds as BIGINT (Spark side; DuckDB pairs with
    * CAST(floor(epoch(ts)) AS BIGINT)). */
  def epochS(c: Column): Column = unix_timestamp(c)
}

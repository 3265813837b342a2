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

  /** Exact integer division of nonnegative longs (x − x%y)/y: the
    * subtraction makes the double division exact, so the cast never
    * truncates a nearly-k value to k. */
  private def intDiv(x: Column, y: Column): Column =
    ((x - pmod(x, y)) / y).cast("long")

  /** round(num/den, 6) for NONNEGATIVE INTEGER num/den, computed
    * entirely in integer space: round-half-up(num·10⁶/den) =
    * ⌊(2·num·10⁶ + den) / (2·den)⌋, then an exact /10⁶. Unlike
    * round(double, 6), this has NO floating-point boundary hazard —
    * Spark's BigDecimal rounding and DuckDB's multiply-based round can
    * disagree by one last-digit ulp when a rational lands on a
    * 6th-decimal half (observed on q_quality_score at sf0.1). DuckDB
    * twin: [[ratio6Sql]]. Requires num·2·10⁶ + den < 2⁶³. */
  def ratio6(num: Column, den: Column): Column = {
    val x = num.cast("long") * lit(2000000L) + den.cast("long")
    val y = den.cast("long") * lit(2L)
    intDiv(x, y).cast("double") / 1000000.0
  }

  /** DuckDB form of [[ratio6]] over integer SQL expressions. */
  def ratio6Sql(num: String, den: String): String =
    s"(CAST((CAST($num AS BIGINT) * 2000000 + CAST($den AS BIGINT))" +
      s" // (2 * CAST($den AS BIGINT)) AS DOUBLE) / 1000000.0)"
}

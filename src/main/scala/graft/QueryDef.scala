package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark DataFrame plan plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Determinism contract (SURVEY.md §7.2): every oracle-checked query
  *  - ends with an explicit ORDER BY on a unique key, identical in both
  *    engines;
  *  - does all money/unit sums in DECIMAL (order-independent, exact) and
  *    casts the final value to DOUBLE;
  *  - wraps every trig/derived double in round(x, 6) in BOTH engines;
  *  - never emits a raw TIMESTAMP column (Spark writes instant-semantics
  *    parquet timestamps, DuckDB writes naive ones → hash mismatch); emits
  *    DATE or epoch seconds (BIGINT) instead;
  *  - casts every integral output to BIGINT in both engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

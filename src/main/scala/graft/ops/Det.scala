package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers (SURVEY.md §7.3).
  *
  * Floating-point SUM/AVG are order-sensitive: Spark reduces partials in
  * shuffle order, DuckDB in scan order, so raw double aggregates diverge in
  * the last ulps and break the driver's hash-match. Fix: cast every input
  * value to DECIMAL (exact, order-insensitive addition), aggregate, then
  * cast the result back to DOUBLE so both engines emit float64 columns.
  * Multiplication/division of identical doubles is IEEE-deterministic, so
  * only the *reduction* needs the decimal detour.
  *
  * The `Sql` twin emits the equivalent DuckDB text for `oracleSql`.
  */
object Det {
  /** Order-insensitive sum of a double expression, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Order-insensitive mean of a double expression, returned as double. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(28, scale))).cast(DoubleType) / count(c))
      .cast(DoubleType)

  /** DuckDB-dialect twins of the helpers above. Keep in lockstep. */
  object Sql {
    def dsum(e: String, scale: Int = 2): String =
      s"CAST(SUM(CAST(($e) AS DECIMAL(28,$scale))) AS DOUBLE)"
    def davg(e: String, scale: Int = 4): String =
      s"(CAST(SUM(CAST(($e) AS DECIMAL(28,$scale))) AS DOUBLE) / COUNT($e))"
  }
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared column builders.
  *
  * Determinism strategy (see SURVEY.md §4): double sums are cast to
  * DECIMAL(38,10) pre-aggregation so the sum is exact and
  * partition-order independent, then rounded in the *decimal* domain to
  * a small scale and only then cast to double — a scale-≤4 decimal
  * below 2^53/10^4 converts to double with a single correct rounding in
  * both Spark and DuckDB, so the oracle sees bit-identical values.
  */
package object functions {

  /** Exact, order-independent sum of a double column, surfaced as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(38, 10))), scale).cast(DoubleType)

  /** SQL-side twin of [[dsum]] for DuckDB oracles. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(38,10))), $scale) AS DOUBLE)"

  /** num/den on already-deterministic doubles; null when den = 0. */
  def ratio(num: Column, den: Column): Column =
    round(num / when(den =!= 0.0, den), 6)

  def ratioSql(num: String, den: String): String =
    s"ROUND($num / NULLIF($den, 0), 6)"

  /** Calendar validity incl. leap years — the reference's DQ predicate
    * (glue_spark_trades_etl.py:135-171) as one codegen'd boolean. */
  def validCalendar(y: Column, m: Column, d: Column): Column = {
    val leap = ((y % 4 === 0) && (y % 100 =!= 0)) || (y % 400 === 0)
    (d >= 1) && (
      (m.isin(1, 3, 5, 7, 8, 10, 12) && d <= 31) ||
      (m.isin(4, 6, 9, 11) && d <= 30) ||
      ((m === 2) && when(leap, d <= 29).otherwise(d <= 28)))
  }

  /** SQL twin of [[validCalendar]]. */
  def validCalendarSql(y: String, m: String, d: String): String =
    s"""($d >= 1 AND (
       |  ($m IN (1,3,5,7,8,10,12) AND $d <= 31) OR
       |  ($m IN (4,6,9,11) AND $d <= 30) OR
       |  ($m = 2 AND CASE WHEN (($y % 4 = 0 AND $y % 100 <> 0) OR $y % 400 = 0)
       |              THEN $d <= 29 ELSE $d <= 28 END)))""".stripMargin
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named group of driver-checkable queries: each entry pairs a Spark
  * implementation with (optionally) an equivalent DuckDB oracle SQL.
  * SparkEntry merges all packs.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Helpers shared by query packs to keep Spark/DuckDB results
  * bit-identical for hash comparison:
  *
  * Floating-point SUM/AVG are order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's — so money-style aggregates are
  * computed in DECIMAL (exact, order-independent), rounded while still
  * exact, and only then cast to double. Both engines round the same stored
  * double to the same decimal, sum exactly, and emit the same double.
  */
object OracleMath {
  /** Exact sum: round(sum(cast(c as decimal(27,scale))), outScale) as double. */
  def dsum(c: Column, scale: Int = 4, outScale: Int = 2): Column =
    round(sum(c.cast(s"decimal(27,$scale)")), outScale).cast("double")

  def dsumSql(c: String, scale: Int = 4, outScale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($c AS DECIMAL(27,$scale))), $outScale) AS DOUBLE)"

  /** Exact-numerator average: cast(sum(decimal) as double)/count, rounded. */
  def davg(c: Column, scale: Int = 4, outScale: Int = 6): Column =
    round(sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c), outScale)

  def davgSql(c: String, scale: Int = 4, outScale: Int = 6): String =
    s"ROUND(CAST(SUM(CAST($c AS DECIMAL(27,$scale))) AS DOUBLE) / COUNT($c), $outScale)"
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-resolution time-series cascade (SURVEY.md §3.1; ref: the Binance
  * raw → hourly → daily DAGs, lecture3/12..15_binance_*.py).
  *
  * The pandas pipeline's positional first/last (`iloc[0]`/`iloc[-1]`) is
  * re-specified as explicit time order via `min_by`/`max_by` — one-pass
  * hash aggregates, no sort and no window shuffle, which is what survives
  * a 100x scale-up (the alternative, a row_number window per hour, sorts
  * every partition).
  *
  * Both levels are plain groupBy aggregates: at cluster scale Spark does
  * partial (map-side) aggregation before the shuffle, and the daily level
  * aggregates 24 rows per day — negligible regardless of input size.
  */
object TimeSeries {

  /** A2/T2 (ref: 13_binance_calculate_hourly.py:56-67): per-hour stats of a
    * (ts, price) point stream. Output one row per hour with avg/min/max/
    * first/last/count, column names matching the reference's hourly CSV. */
  def hourlyStats(points: DataFrame, ts: Column, price: Column): DataFrame =
    points.groupBy(date_trunc("hour", ts).as("hour_start")).agg(
      // decimal-exact mean: double SUM is accumulation-order-dependent and
      // would diverge run-to-run (and from the oracle) at high parallelism
      round(sum(price.cast("decimal(27,6)")).cast("double") / count(lit(1)), 6).as("avg_price"),
      min(price).as("min_price"),
      max(price).as("max_price"),
      min_by(price, ts).as("first_price"),
      max_by(price, ts).as("last_price"),
      count(lit(1)).as("data_points"))

  /** A3+A4/T3 (ref: 14_binance_calculate_daily.py:47-64): daily rollup over
    * the hourly output — mean of hourly means, min of mins, max of maxes,
    * open/close from the first/last hour, guarded pct-change. */
  def dailyStats(hourly: DataFrame): DataFrame = {
    val day = date_trunc("day", col("hour_start"))
    val agg = hourly.groupBy(day.as("day_start")).agg(
      round(sum(col("avg_price").cast("decimal(27,6)")).cast("double") / count(lit(1)), 6).as("avg_price"),
      min(col("min_price")).as("min_price"),
      max(col("max_price")).as("max_price"),
      min_by(col("first_price"), col("hour_start")).as("opening_price"),
      max_by(col("last_price"), col("hour_start")).as("closing_price"),
      sum(col("data_points")).as("total_data_points"),
      count(lit(1)).as("hours_with_data"))
    agg
      .withColumn("price_change", round(col("closing_price") - col("opening_price"), 6))
      .withColumn("price_change_pct",
        round(when(col("opening_price") > 0,
          (col("closing_price") - col("opening_price")) / col("opening_price") * 100.0)
          .otherwise(lit(0.0)), 6))
  }
}

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

  /** Resample a sparse per-key time series onto a regular grid with
    * forward fill (LOCF — last observation carried forward): every key
    * gets one row per `step` between its first and last observation;
    * grid points with no observation carry the previous value and are
    * flagged `is_gap`. The gap-filling step every downstream
    * window/forecast consumer needs before assuming regular cadence.
    *
    * Scale shape: the grid generates per key from its own (min, max)
    * bounds — sequence + explode, rows proportional to span/step, no
    * driver loop; the fill is one window per key ordered by grid time
    * (a single shuffle on the key). A key with a pathological span
    * (sensor stuck for years at 1s step) generates span/step rows — cap
    * upstream if that is a real hazard.
    *
    * Output: key, grid ts (`ts_grid`), `value` (filled), `is_gap`. */
  def resample(points: DataFrame, key: Column, ts: Column, value: Column,
               step: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // epoch-floor snapping is timezone-free, which equals date_trunc's
    // hour/day buckets ONLY under a UTC session — a non-UTC session would
    // silently produce UTC-midnight day buckets where the caller expects
    // session-local midnights (and day-length DST anomalies in the
    // INTERVAL grid). GraftSession pins UTC; a foreign session must too.
    val tz = points.sparkSession.conf.get("spark.sql.session.timeZone")
    require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
      s"resample requires a UTC session (epoch-aligned buckets); " +
        s"spark.sql.session.timeZone is '$tz'")
    val stepSec = stepSeconds(step)
    // snap to the step grid by flooring epoch seconds — unlike date_trunc
    // this supports any multiple ("15 minutes", "6 hours"); grid points
    // are epoch-aligned, which in the pinned-UTC session coincides with
    // date_trunc for the 1-minute/hour/day cases. cast-to-double keeps
    // sub-second observations inside their bucket and floors correctly
    // for pre-epoch timestamps (Long division would truncate toward 0).
    def snap(c: Column): Column =
      timestamp_seconds(floor(c.cast("double") / stepSec).cast("long") * stepSec)
    val snapped = points
      .select(key.as("_k"), snap(ts).as("_t"), value.as("_v"))
      // one observation per (key, grid point): the LAST by raw order of
      // arrival is arbitrary — aggregate deterministically (mean would
      // need decimal care; max is order-free and exact)
      .groupBy(col("_k"), col("_t")).agg(max(col("_v")).as("_v"))
    val bounds = snapped.groupBy(col("_k"))
      .agg(min(col("_t")).as("_mn"), max(col("_t")).as("_mx"))
    val grid = bounds.select(col("_k"),
      explode(sequence(col("_mn"), col("_mx"),
        expr(s"INTERVAL $step"))).as("_t"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(snapped, Seq("_k", "_t"), "left")
      .withColumn("value", last(col("_v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("_v").isNull)
      .select(col("_k").as("key"), col("_t").as("ts_grid"),
        col("value"), col("is_gap"))
  }

  private val StepRe = """(\d{1,7})\s+(second|minute|hour|day)s?""".r

  /** Parse "N seconds|minutes|hours|days" to a positive second count; the
    * same string also feeds `INTERVAL` for the grid `sequence`, so the two
    * stay in lockstep by construction. */
  private def stepSeconds(step: String): Long = step.trim.toLowerCase match {
    case StepRe(n, unit) if n.toLong > 0 =>
      n.toLong * (unit match {
        case "second" => 1L
        case "minute" => 60L
        case "hour"   => 3600L
        case "day"    => 86400L
      })
    case other => throw new IllegalArgumentException(
      s"resample step must be 'N seconds/minutes/hours/days', got '$other'")
  }

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

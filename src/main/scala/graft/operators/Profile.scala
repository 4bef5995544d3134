package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling and skew-resistant aggregation — the utility
  * operators a 100 TB training-data ingest runs before anything else.
  */
object Profile {

  /** One-pass column profile: per column, null count + distinct count +
    * min/max (numeric/string-safe). Single aggregation over the table —
    * one scan regardless of column count. Output: one row per column.
    *
    * `approxDistinct = true` swaps exact countDistinct (an expand +
    * shuffle per column — exact, used by the oracle check) for
    * HyperLogLog++ approx_count_distinct, which aggregates map-side in
    * constant memory — the right default when profiling 100 TB. */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    approxDistinct: Boolean = false): DataFrame = {
    val distinctAgg: Column => Column =
      if (approxDistinct) c => approx_count_distinct(c) else c => countDistinct(c)
    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        distinctAgg(col(c)).as(s"${c}__distinct")) ++
        (if (isNum) Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
        else Seq(lit(null).cast("double").as(s"${c}__min"),
          lit(null).cast("double").as(s"${c}__max")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per column
    val stack = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(stack: _*)).as("p")).select(col("p.*"))
  }

  /** Two-phase (salted) aggregation for skewed keys: phase 1 aggregates on
    * (key, salt) spreading a hot key over `saltBuckets` reducers; phase 2
    * merges the partials. Result is identical to a plain groupBy count/sum
    * — only the shuffle distribution changes. */
  def saltedGroupAgg(df: DataFrame, key: String, valueCol: Column,
                     saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{Sessionize, TimeSeries}
import graft.sources.Synthetic

/** Scale smoke: runs the core operator shapes on a synthetic event stream
  * 100-1000x larger than the sf0.1 testdata (driver testdata caps at
  * ~100k events; a 100 TB design claim deserves evidence at millions of
  * rows). Prints one timing line per shape.
  *
  * Usage: SPARK_GRAFT_SMOKE_ROWS=20000000 sbt "runMain graft.ScaleSmoke"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val targetRows = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-smoke", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~2k users/day x 100 days x ~avg 100 events -> tune usersPerDay to hit target
    val days = 100
    val maxPerUserDay = 19 // avg 10
    val usersPerDay = math.max(1L, targetRows / (days * 10L)).toInt
    val events = Synthetic.events(spark, java.time.LocalDate.of(2024, 1, 1),
      days, usersPerDay, maxPerUserDay, seed = 42L)
      .withColumn("ts", timestamp_seconds(
        col("date").cast("timestamp").cast("long") +
          pmod(xxhash64(col("user_id"), col("value")), lit(86400L))))
      .withColumn("user_id", col("user_id") + col("date").cast("timestamp").cast("long") % 7)

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"SCALE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val n = events.count()
    println(s"SCALE rows: $n")
    time("group_count (a1 shape)") {
      events.groupBy(col("date"), col("user_id")).agg(count(lit(1)).as("n"))
    }
    time("hourly_stats (a2 shape)") {
      TimeSeries.hourlyStats(events, col("ts"), col("value"))
    }
    time("keep_last dedup (u2 shape)") {
      graft.operators.Dedup.keepLastBy(events, Seq("user_id"), col("ts"))
    }
    time("sessionize (w6 shape)") {
      Sessionize.sessions(events.select(col("user_id"), col("ts")), "user_id", "ts",
        java.time.Duration.ofMinutes(30))
    }
    spark.stop()
  }
}

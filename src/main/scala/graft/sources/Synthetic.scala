package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S17 (ref: Solutions/chapter03/docker/events-api/app.py:25-47): the
  * deterministic seeded event generator, as a distributed source.
  *
  * The reference seeds Faker per day; here determinism comes from hash
  * mixing over `spark.range` ids — fully parallel, identical output for a
  * given (seed, shape) on any cluster size or partitioning (no `rand()`,
  * whose draws depend on partition layout).
  */
object Synthetic {

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Generate `days` x `usersPerDay` user-days starting at `start`; each
    * user-day yields 1..maxEventsPerUserDay events with hash-derived
    * attributes. */
  def events(spark: SparkSession, start: java.time.LocalDate, days: Int,
             usersPerDay: Int, maxEventsPerUserDay: Int, seed: Long): DataFrame = {
    val userDays = spark.range(days.toLong * usersPerDay)
      .withColumn("date", date_add(lit(java.sql.Date.valueOf(start)),
        (col("id") / usersPerDay).cast("int")))
      .withColumn("user_id", pmod(xxhash64(col("id"), lit(seed)), lit(usersPerDay.toLong)))
      .withColumn("n_events",
        (pmod(xxhash64(col("id"), lit(seed + 1)), lit(maxEventsPerUserDay.toLong)) + 1).cast("int"))
    val typeCases = eventTypes.zipWithIndex
      .foldLeft(lit(eventTypes.head)) { case (acc, (t, i)) =>
        when(pmod(xxhash64(col("id"), col("seq"), lit(seed + 2)), lit(eventTypes.size.toLong)) === i,
          lit(t)).otherwise(acc)
      }
    userDays
      .select(col("id"), col("date"), col("user_id"),
        explode(sequence(lit(1), col("n_events"))).as("seq"))
      .select(
        col("date"), col("user_id"),
        typeCases.as("event_type"),
        (pmod(xxhash64(col("id"), col("seq"), lit(seed + 3)), lit(10000L)).cast("double") / 100.0)
          .as("value"))
  }
}

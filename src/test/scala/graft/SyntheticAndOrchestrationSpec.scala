package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.plans.{Pipeline, Schedule, Sensors, Stage}
import graft.sources.Synthetic

class SyntheticAndOrchestrationSpec extends SparkSpec {
  import spark.implicits._

  test("S17 synthetic events: deterministic, bounded, well-shaped") {
    val a = Synthetic.events(spark, java.time.LocalDate.of(2024, 1, 1),
      days = 3, usersPerDay = 10, maxEventsPerUserDay = 5, seed = 42L)
    val b = Synthetic.events(spark, java.time.LocalDate.of(2024, 1, 1),
      days = 3, usersPerDay = 10, maxEventsPerUserDay = 5, seed = 42L)
    // identical across invocations (and any partitioning): same content hash
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("date"), col("user_id"), col("event_type"), col("value")).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head()
    assert(digest(a) == digest(b))
    assert(digest(a.repartition(13)) == digest(a))
    val perDay = a.groupBy("date").count().select("count").as[Long].collect()
    assert(perDay.length == 3)
    assert(perDay.forall(n => n >= 10 && n <= 50))
    assert(a.filter(!col("event_type").isin("click", "view", "purchase", "signup", "error")).count() == 0)
    // different seed, different stream
    val c = Synthetic.events(spark, java.time.LocalDate.of(2024, 1, 1),
      days = 3, usersPerDay = 10, maxEventsPerUserDay = 5, seed = 7L)
    assert(digest(c) != digest(a))
  }

  test("salted aggregation equals plain groupBy") {
    val df = Tables(spark)
    val plain = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(27,6)")).as("total"))
      .orderBy("event_type").collect().toSeq
    val salted = Profile.saltedGroupAgg(df, "event_type",
      col("value").cast("decimal(27,6)"), 16, col("event_id"))
      .orderBy("event_type").collect().toSeq
    assert(plain.map(_.toString) == salted.map(_.toString))
  }

  private def Tables(s: org.apache.spark.sql.SparkSession) =
    graft.core.Tables.events(s, sf())

  test("T8/T9: upstream commit marker gates and triggers the downstream pipeline") {
    val dir = Files.createTempDirectory("xpipe").toString
    val ran = collection.mutable.Buffer[String]()
    val downstream = Pipeline("report", Schedule.parse("None"),
      start = java.time.LocalDate.of(2026, 1, 1))
    val downstreamStage = Stage("report") { ctx => ran += s"report:${ctx.ds}" }

    val upstream = Pipeline("ingest", Schedule.parse("@daily"),
      start = java.time.LocalDate.of(2026, 1, 1),
      onComplete = ctx => {
        // atomic commit marker (the _SUCCESS convention), then trigger (T9)
        Files.writeString(java.nio.file.Paths.get(s"$dir/_SUCCESS_${ctx.ds}"), "")
        downstream.run(Seq(downstreamStage), ctx.runDate, _ => ())
        ()
      })
    upstream.run(Seq(Stage("ingest") { ctx => ran += s"ingest:${ctx.ds}" }),
      java.time.LocalDate.of(2026, 1, 1), _ => ())
    assert(ran.toSeq == Seq("ingest:2026-01-01", "report:2026-01-01"))

    // T8: ExternalTaskSensor equivalent — a third pipeline awaits the marker
    val seen = Sensors.await(
      Sensors.fileExists(spark, s"$dir/_SUCCESS_2026-01-01"),
      java.time.Duration.ofMillis(5), java.time.Duration.ofSeconds(2))
    assert(seen)
    assert(!Sensors.await(Sensors.fileExists(spark, s"$dir/_SUCCESS_2099-01-01"),
      java.time.Duration.ofMillis(5), java.time.Duration.ofMillis(30)))
  }
}

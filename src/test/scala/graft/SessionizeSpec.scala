package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.operators.Sessionize.{SessionEvent, SessionOut}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization splits on gap and numbers sessions per key") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"),   // > 30min gap: new session
      (2L, "2024-01-01 00:05:00"))
      .toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
    val got = Sessionize.sessions(events, "user_id", "ts",
      java.time.Duration.ofMinutes(30))
      .orderBy("user_id", "session_seq")
      .select($"user_id", $"session_seq", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("batch sessionization boundary: exactly-gap interval stays in session") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:30:00"))
      .toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
    val got = Sessionize.sessions(events, "user_id", "ts",
      java.time.Duration.ofMinutes(30))
    assert(got.count() == 1)
  }

  test("streaming sessionization emits closed sessions, times out open ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.streamingSessions(input.toDS(),
      java.time.Duration.ofSeconds(30))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    def ev(k: Long, s: String) = SessionEvent(k, Timestamp.valueOf(s))
    input.addData(
      ev(1, "2024-01-01 00:00:00"), ev(1, "2024-01-01 00:00:10"),
      ev(1, "2024-01-01 00:02:00"))   // 110s gap: closes session 1
    q.processAllAvailable()
    // push watermark far forward so the open session times out
    input.addData(ev(2, "2024-01-01 01:00:00"))
    q.processAllAvailable()
    input.addData(ev(2, "2024-01-01 02:00:00"))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[SessionOut].collect()
      .sortBy(s => (s.key, s.session_start.getTime))
    assert(sessions.exists(s => s.key == 1 && s.n_events == 2))   // closed by gap
    assert(sessions.exists(s => s.key == 1 && s.n_events == 1))   // closed by timeout
  }
}

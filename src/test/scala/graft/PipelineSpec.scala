package graft

import java.time.{Duration, LocalDate, LocalDateTime}

import graft.plans._

class PipelineSpec extends SparkSpec {

  test("schedule parse grammar") {
    assert(Schedule.parse("None") == Manual)
    assert(Schedule.parse("@daily") == Every(Duration.ofDays(1)))
    assert(Schedule.parse("@hourly") == Every(Duration.ofHours(1)))
    val c = Schedule.parse("0 16 * * *").asInstanceOf[Cron]
    assert(c.minute == Set(0) && c.hour == Set(16))
    assert(Schedule.parse("*/15 * * * *").asInstanceOf[Cron].minute ==
      Set(0, 15, 30, 45))
  }

  test("cron next fires at the scheduled instant") {
    val c = Schedule.parse("0 16 * * *")
    val next = c.next(LocalDateTime.of(2026, 1, 1, 12, 0)).get
    assert(next == LocalDateTime.of(2026, 1, 1, 16, 0))
    val rollover = c.next(LocalDateTime.of(2026, 1, 1, 17, 0)).get
    assert(rollover == LocalDateTime.of(2026, 1, 2, 16, 0))
  }

  test("catchup=true materializes the full range; false only the latest") {
    val p = Pipeline("p", Schedule.parse("@daily"),
      start = LocalDate.of(2026, 1, 1), catchup = true)
    val runs = p.logicalRuns(LocalDate.of(2026, 1, 5))
    assert(runs.map(_.ds) == Seq("2026-01-01", "2026-01-02", "2026-01-03",
      "2026-01-04", "2026-01-05"))
    assert(runs.last.isLatest && !runs.head.isLatest)
    val latest = p.copy(catchup = false).logicalRuns(LocalDate.of(2026, 1, 5))
    assert(latest.map(_.ds) == Seq("2026-01-05"))
  }

  test("interval is half-open [start, end)") {
    val ctx = Pipeline("p", Manual, LocalDate.of(2026, 1, 1), catchup = true)
      .logicalRuns(LocalDate.of(2026, 1, 1)).head
    assert(ctx.intervalStart == LocalDateTime.of(2026, 1, 1, 0, 0))
    assert(ctx.intervalEnd == LocalDateTime.of(2026, 1, 2, 0, 0))
    assert(ctx.dsNodash == "20260101")
  }

  test("stage retries with backoff then succeeds") {
    var attempts = 0
    val delays = collection.mutable.Buffer[Long]()
    val st = Stage("flaky", RetryPolicy(retries = 3,
      delay = Duration.ofMillis(100), backoff = 2.0)) { _ =>
      attempts += 1
      if (attempts < 3) sys.error("boom")
      "ok"
    }
    val ctx = RunContext(LocalDate.now(), LocalDateTime.MIN, LocalDateTime.MAX)
    assert(st.execute(ctx, d => delays += d.toMillis) == "ok")
    assert(attempts == 3)
    assert(delays.toSeq == Seq(100L, 200L))
  }

  test("stage exhausts retries and rethrows; onFailure hook fires") {
    var failed = 0
    val p = Pipeline("p", Manual, LocalDate.of(2026, 1, 1),
      onFailure = (_, _) => failed += 1)
    val boom = Stage("always", RetryPolicy(retries = 1))(_ => sys.error("nope"))
    intercept[RuntimeException] {
      p.run(Seq(boom), LocalDate.of(2026, 1, 1), _ => ())
    }
    assert(failed == 1)
  }

  test("pipeline runs stages per logical date, onComplete per run") {
    val seen = collection.mutable.Buffer[String]()
    var completed = 0
    val p = Pipeline("events", Schedule.parse("@daily"),
      start = LocalDate.of(2026, 1, 1), catchup = true,
      onComplete = _ => completed += 1)
    val st = Stage("collect")(ctx => seen += ctx.ds)
    p.run(Seq(st), LocalDate.of(2026, 1, 3), _ => ())
    assert(seen.toSeq == Seq("2026-01-01", "2026-01-02", "2026-01-03"))
    assert(completed == 3)
  }

  test("sensor awaits condition with bounded polling") {
    var polls = 0
    val ok = Sensors.await(() => { polls += 1; polls >= 3 },
      Duration.ofMillis(1), Duration.ofSeconds(5))
    assert(ok && polls == 3)
    assert(!Sensors.await(() => false, Duration.ofMillis(1), Duration.ofMillis(5)))
  }

  test("branch and latestOnly control flow") {
    val ctx = RunContext(LocalDate.of(2026, 1, 1), LocalDateTime.MIN,
      LocalDateTime.MAX, isLatest = false)
    val path = ControlFlow.branch(ctx)(_.runDate.isBefore(LocalDate.of(2027, 1, 1)))("old")("new")
    assert(path == "old")
    var deployed = false
    ControlFlow.latestOnly(ctx) { deployed = true }
    assert(!deployed)
  }
}

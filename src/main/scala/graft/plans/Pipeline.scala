package graft.plans

import java.time.{Duration, LocalDate, LocalDateTime, ZoneOffset}
import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Pipeline/orchestration surface (SURVEY.md §2.11, C1-C12): the
  * reference's Airflow DAG semantics — schedules, logical dates, catchup,
  * retries, branching, sensors — re-expressed as plain Scala driver code
  * around lazy Spark plans.
  *
  * Design stance: inside one run, task `>>` chains collapse into a single
  * Catalyst plan (Spark's lazy DAG *is* the task graph); the explicit
  * machinery here only survives where Airflow semantics are about the
  * *outside* of a query — time, retries, idempotent re-runs, side-effect
  * ordering.
  */

/** C3 (ref: {{ds}}/{{next_ds}} templating): the logical-run parameters,
  * threaded explicitly instead of Jinja. `interval` is half-open
  * [start, end) exactly like Airflow's data interval. */
final case class RunContext(runDate: LocalDate, intervalStart: LocalDateTime,
                            intervalEnd: LocalDateTime, isLatest: Boolean = true) {
  /** {{ds}} */
  def ds: String = runDate.toString
  /** {{ds_nodash}} */
  def dsNodash: String = ds.replace("-", "")
}

/** C2: schedule grammar — None/manual, @hourly/@daily/@weekly, fixed
  * timedelta, and 5-field cron (subset: minute hour dom month dow with
  * numbers, *, and lists). */
sealed trait Schedule { def next(after: LocalDateTime): Option[LocalDateTime] }
case object Manual extends Schedule { def next(after: LocalDateTime) = None }
final case class Every(interval: Duration) extends Schedule {
  def next(after: LocalDateTime) = Some(after.plus(interval))
}
final case class Cron(minute: Set[Int], hour: Set[Int], dom: Set[Int],
                      month: Set[Int], dow: Set[Int]) extends Schedule {
  def matches(t: LocalDateTime): Boolean =
    minute(t.getMinute) && hour(t.getHour) && dom(t.getDayOfMonth) &&
      month(t.getMonthValue) && dow(t.getDayOfWeek.getValue % 7)
  def next(after: LocalDateTime): Option[LocalDateTime] = {
    @tailrec def scan(t: LocalDateTime, left: Int): Option[LocalDateTime] =
      if (left == 0) None
      else if (matches(t)) Some(t)
      else scan(t.plusMinutes(1), left - 1)
    scan(after.plusMinutes(1).withSecond(0).withNano(0), 366 * 24 * 60)
  }
}
object Schedule {
  /** Parse Airflow-style schedule strings. */
  def parse(s: String): Schedule = s match {
    case null | "" | "None" => Manual
    case "@hourly"          => Every(Duration.ofHours(1))
    case "@daily"           => Every(Duration.ofDays(1))
    case "@weekly"          => Every(Duration.ofDays(7))
    case cron =>
      val f = cron.trim.split("\\s+")
      require(f.length == 5, s"bad cron: $s")
      def field(spec: String, lo: Int, hi: Int): Set[Int] = spec match {
        case "*" => (lo to hi).toSet
        case v if v.startsWith("*/") =>
          val step = v.drop(2).toInt; (lo to hi by step).toSet
        case v => v.split(",").map(_.toInt).toSet
      }
      Cron(field(f(0), 0, 59), field(f(1), 0, 23), field(f(2), 1, 31),
        field(f(3), 1, 12), field(f(4), 0, 6))
  }
}

/** C9: retry policy (ref: default_args retries/retry_delay,
  * tutorial1:47-54). `backoff` multiplies the delay per attempt. */
final case class RetryPolicy(retries: Int = 0, delay: Duration = Duration.ZERO,
                             backoff: Double = 1.0)

/** One pipeline stage: a named, retryable unit. `run` receives the logical
  * RunContext (C3) and performs one idempotent write (T10 atomicity). */
final case class Stage[A](name: String, retry: RetryPolicy = RetryPolicy())(
    val run: RunContext => A) {

  def execute(ctx: RunContext, sleep: Duration => Unit = d => Thread.sleep(d.toMillis)): A = {
    @tailrec def attempt(n: Int, delay: Duration): A =
      Try(run(ctx)) match {
        case Success(a) => a
        case Failure(e) if n < retry.retries =>
          sleep(delay)
          attempt(n + 1,
            Duration.ofMillis((delay.toMillis * retry.backoff).toLong max 1L))
        case Failure(e) => throw e
      }
    attempt(0, retry.delay)
  }
}

/** C1: pipeline definition. Stages run sequentially per logical date
  * (intra-run parallelism belongs to Spark); `maxActiveRuns=1` (C10) is
  * inherent — the runner is single-threaded per pipeline. */
final case class Pipeline(name: String, schedule: Schedule,
                          start: LocalDate, end: Option[LocalDate] = None,
                          catchup: Boolean = false,
                          onComplete: RunContext => Unit = _ => (),
                          onFailure: (RunContext, Throwable) => Unit = (_, _) => ()) {

  /** T5/C1: materialize the logical runs in [start, end] under catchup
    * semantics (catchup=false → only the latest interval, like Airflow). */
  def logicalRuns(now: LocalDate): Seq[RunContext] = {
    val last = end.getOrElse(now).isBefore(now) match {
      case true  => end.getOrElse(now)
      case false => now
    }
    val all = Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(last)).toSeq
    val picked = if (catchup) all else all.takeRight(1)
    picked.map { d =>
      RunContext(d, d.atStartOfDay(), d.plusDays(1).atStartOfDay(),
        isLatest = d == all.last)
    }
  }

  /** Execute stages for every logical run (backfill = catchup over a
    * historical range with the same code path — T5). */
  def run(stages: Seq[Stage[_]], now: LocalDate,
          sleep: Duration => Unit = d => Thread.sleep(d.toMillis)): Seq[RunContext] = {
    val runs = logicalRuns(now)
    runs.foreach { ctx =>
      try {
        stages.foreach(_.execute(ctx, sleep))
        onComplete(ctx)
      } catch { case e: Throwable => onFailure(ctx, e); throw e }
    }
    runs
  }
}

/** T6/T7: sensors — bounded poll-await helpers (reschedule-mode semantics:
  * the caller owns the wait loop; nothing blocks an executor). */
object Sensors {
  /** PythonSensor equivalent: poll `condition` every `poke` up to `timeout`. */
  def await(condition: () => Boolean, poke: Duration, timeout: Duration,
            sleep: Duration => Unit = d => Thread.sleep(d.toMillis)): Boolean = {
    val deadline = System.nanoTime() + timeout.toNanos
    @tailrec def loop(): Boolean =
      if (condition()) true
      else if (System.nanoTime() > deadline) false
      else { sleep(poke); loop() }
    loop()
  }

  /** FileSensor on a _SUCCESS marker (Spark's own commit convention). */
  def fileExists(spark: org.apache.spark.sql.SparkSession, path: String): () => Boolean =
    () => {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
}

/** C6/C7: branching and latest-only guards are plain Scala; named here so
  * pipeline code reads like the reference's operators. */
object ControlFlow {
  /** BranchPythonOperator: pick a stage set by predicate on the context. */
  def branch[A](ctx: RunContext)(pred: RunContext => Boolean)(
      ifTrue: => A)(ifFalse: => A): A =
    if (pred(ctx)) ifTrue else ifFalse

  /** LatestOnlyOperator: run only for the most recent logical interval. */
  def latestOnly(ctx: RunContext)(body: => Unit): Unit =
    if (ctx.isLatest) body
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Joins

/** Skew-join scale smoke (round 8): the one classic 100 TB killer the
  * other smokes don't cover — a JOIN key where one value holds 40% of
  * the large side, landing on a single reducer while every other
  * executor idles. Three runs of the same 20M x 3M equi-join:
  *
  *   1. plain shuffle join with AQE skew-join DISABLED — the straggler
  *      baseline (one task carries the 8M-row hot key);
  *   2. plain shuffle join with AQE skew-join ENABLED (Spark's runtime
  *      mitigation, on by default in GraftSession);
  *   3. [[Joins.skewedEquiJoin]] — the deterministic salted path.
  *
  * Every run must produce the EXACT planted match count (the join's
  * correctness does not depend on the path), and the salted path's
  * longest task must be measurably shorter than the disabled-AQE
  * straggler — the task-time histogram, not wall-clock, is where skew
  * lives (local[32] shares cores, so wall-clock differences understate
  * what a 1000-executor cluster would see: there, the straggler IS the
  * job time).
  *
  * Broadcast is forced off: the 3M-row dim fits under the default 10 MB
  * threshold at this scale, but the 100 TB analogue (a 3B-row dim)
  * would not — the smoke exercises the shuffle path a cluster would
  * actually take.
  */
object ScaleSmokeSkewJoin {

  private var failures = 0
  private def check(name: String, cond: Boolean, detail: => String): Unit =
    if (cond) println(s"SCALE CHECK ok: $name ($detail)")
    else { failures += 1; println(s"SCALE CHECK FAIL: $name ($detail)") }

  /** Tracks the worst single task two ways: wall duration and SHUFFLE
    * READ RECORDS. Records are the skew ruler — the straggler is the
    * task that reads the hot key's whole partition; duration alone is
    * polluted by healthy-but-expensive tasks (the 20M-row sort before a
    * merge join) and by 32 tasks sharing this host's cores. */
  private final class MaxTaskListener extends SparkListener {
    val maxMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxShuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null)
        maxMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
      if (t.taskMetrics != null && t.taskMetrics.shuffleReadMetrics != null) {
        val rec = t.taskMetrics.shuffleReadMetrics.recordsRead
        maxShuffleRecords.getAndUpdate(m => math.max(m, rec))
        perStage.merge(t.stageId, rec, (a, b) => math.max(a, b))
      }
    }
    def topStages: String = {
      import scala.jdk.CollectionConverters._
      perStage.asScala.toSeq.sortBy(-_._2).take(3)
        .map { case (s, r) => s"stage $s: $r" }.mkString("; ")
    }
  }

  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-skewjoin", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // AQE's byte-targeted partition coalescing legitimately re-merges
    // the salt buckets at this toy byte-scale (8M hot rows of synthetic
    // compressible data shuffle-compress to a few MB per bucket, far
    // under the 64 MB advisory) — masking the RECORD skew this smoke
    // measures. At 100 TB each bucket is GBs and coalescing keeps its
    // hands off; disabling it here reproduces that regime. AQE's
    // skew-join SPLITTING (the mitigation run 2 measures) is a separate
    // rule and stays on.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val coldKeys = 1000000L
    // left: 40% of rows on one HOT key, the rest uniform over 1M keys
    val left = spark.range(target).select(
      when(pmod(col("id"), lit(5L)) < 2, lit("HOT"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(coldKeys)).cast("string"))).as("k"),
      col("id").as("lv"),
      lpad(col("id").cast("string"), 96, "x").as("pad"))
    // right: every key (HOT + k0..k999999) exactly 3 times -> expected
    // matches = 3 * |left|, exactly
    val right = spark.range((coldKeys + 1) * 3).select(
      when(col("id") % (coldKeys + 1) === coldKeys, lit("HOT"))
        .otherwise(concat(lit("k"), (col("id") % (coldKeys + 1)).cast("string"))).as("k"),
      (col("id") % 3).as("rv"))
    val expected = 3L * target

    def run(name: String, df: => DataFrame): (Long, Double, Long, Long) = {
      val listener = new MaxTaskListener
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async (and its drain API is private) — give the
      // queue a moment to flush the final task-end events
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(listener)
      println(f"SCALE skewjoin $name: $sec%.1f s, $n rows, " +
        f"max task ${listener.maxMs.get()} ms / ${listener.maxShuffleRecords.get()} shuffle records " +
        f"(worst stages: ${listener.topStages})")
      (n, sec, listener.maxMs.get(), listener.maxShuffleRecords.get())
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (nPlain, _, msPlain, recPlain) = run("plain join, AQE skew OFF (straggler baseline)",
      left.join(right, Seq("k"), "inner"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (nAqe, _, msAqe, recAqe) = run("plain join, AQE skew ON",
      left.join(right, Seq("k"), "inner"))
    import spark.implicits._
    val hot = Seq("HOT").toDF("k")
    val (nSalt, _, msSalt, recSalt) = run("skewedEquiJoin (32 salt buckets)",
      Joins.skewedEquiJoin(left, right, Seq("k"), hot,
        joinType = "inner", saltBuckets = 32, saltSource = Some(col("lv"))))

    check("all three paths produce the exact planted match count",
      nPlain == expected && nAqe == expected && nSalt == expected,
      s"expected=$expected plain=$nPlain aqe=$nAqe salted=$nSalt")
    // the straggler task reads the hot key's entire 8M-row partition;
    // salting spreads it over 32 buckets, so the worst task's shuffle
    // read must collapse by ~an order of magnitude
    check("salted join kills the straggler (max shuffle records per task)",
      recSalt * 5 <= recPlain,
      s"straggler=$recPlain records ($msPlain ms), aqe=$recAqe ($msAqe ms), " +
        s"salted=$recSalt ($msSalt ms)")

    println(if (failures == 0) "SCALE skewjoin: ALL CHECKS PASSED"
    else s"SCALE skewjoin: $failures CHECK(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

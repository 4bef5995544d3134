package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{Profile, TimeSeries, Upsert}

/** Analytics-tier scale smoke (round-7): funnel, retention, SCD2,
  * multi-unit resample, z-score outliers and the rewritten heavyHitters
  * at ~20M-row inputs — the shapes whose prior evidence stopped at sf0.1
  * (~600k rows).
  *
  * Every shape carries a PLANTED pattern whose recovery is checked
  * EXACTLY (conversion rate, retention fractions, per-key interval
  * counts, LOCF values, outlier count, heavy-hitter share): the run
  * proves end-to-end correctness at scale, not just throughput.
  * A failed check prints CHECK FAIL and exits nonzero.
  *
  * Usage: SPARK_GRAFT_SMOKE_ROWS=20000000 sbt "runMain graft.ScaleSmokeAnalytics"
  */
object ScaleSmokeAnalytics {

  private var failures = 0
  private def check(name: String, cond: Boolean, detail: => String): Unit =
    if (cond) println(s"SCALE CHECK ok: $name ($detail)")
    else { failures += 1; println(s"SCALE CHECK FAIL: $name ($detail)") }

  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-analytics", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SCALE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- funnel + retention: one synthetic event stream, exact rates ----
    // Per user (nUsers ≈ target/2.85 → ~20M rows):
    //   view at cohort day 09:00, click at 10:00        (everyone)
    //   purchase at 11:00           iff user % 4 == 0   (25% conversion)
    //   click at cohort day + 1     iff user % 2 == 0   (50% day-1 retention)
    //   click at cohort day + 7     iff user % 10 == 0  (10% day-7 retention)
    // Cohort day = 2024-01-01 + user % 30 (30 cohorts).
    val nUsers = math.max(20L, target / 3L / 20L * 20L) // multiple of 20: rates exact
    val epoch0 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val u = spark.range(nUsers)
    val cohortSec = lit(epoch0) + pmod(col("user_id"), lit(30L)) * 86400L
    val ev = u.select(col("id").as("user_id"),
        explode(concat(
          array(struct(lit(9L * 3600).as("off"), lit("view").as("event_type")),
            struct(lit(10L * 3600).as("off"), lit("click").as("event_type"))),
          when(pmod(col("id"), lit(4L)) === 0,
            array(struct(lit(11L * 3600).as("off"), lit("purchase").as("event_type"))))
            .otherwise(array().cast("array<struct<off:bigint,event_type:string>>")),
          when(pmod(col("id"), lit(2L)) === 0,
            array(struct(lit(86400L + 12L * 3600).as("off"), lit("click").as("event_type"))))
            .otherwise(array().cast("array<struct<off:bigint,event_type:string>>")),
          when(pmod(col("id"), lit(10L)) === 0,
            array(struct(lit(7L * 86400 + 12L * 3600).as("off"), lit("click").as("event_type"))))
            .otherwise(array().cast("array<struct<off:bigint,event_type:string>>"))
        )).as("e"))
      .select(col("user_id"), timestamp_seconds(cohortSec + col("e.off")).as("ts"),
        col("e.event_type").as("event_type"))
    val evDir = graft.core.TempDirs.create("graft-scale-a") + "/events"
    ev.write.mode("overwrite").parquet(evDir)
    val events = spark.read.parquet(evDir)
    val nEvents = events.count()
    println(s"SCALE analytics events: $nEvents (users: $nUsers)")

    // funnel (a16 shape): planted conversion rate = exactly 25%
    val funnel = timed("funnel (a16 shape)") {
      val firstView = events.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view_ts"))
      val f = events.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"), "right")
        .groupBy(col("user_id"), col("first_view_ts"))
        .agg(min(when(col("ts") >= col("first_view_ts"), col("ts")))
          .as("first_purchase_ts"))
        .withColumn("converted", col("first_purchase_ts").isNotNull.cast("int"))
      val agg = f.agg(count(lit(1)).as("n"), sum(col("converted")).as("c")).collect()(0)
      (agg.getLong(0), agg.getLong(1))
    }
    check("funnel recovers planted 25% conversion",
      funnel == ((nUsers, nUsers / 4)),
      s"users=${funnel._1} converted=${funnel._2} expected=(${nUsers}, ${nUsers / 4})")

    // retention (a17 shape): planted day-1 = 50%, day-7 = 10%
    val ret = timed("retention (a17 shape)") {
      val cohort = events.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      events.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .groupBy(col("day_offset")).agg(sum(col("n_active")).as("n"))
        .orderBy(col("day_offset"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    check("retention recovers planted day-0/1/7 fractions",
      ret == Map(0 -> nUsers, 1 -> nUsers / 2, 7 -> nUsers / 10),
      s"got=$ret expected=Map(0 -> $nUsers, 1 -> ${nUsers / 2}, 7 -> ${nUsers / 10})")

    // ---- SCD2 history: K changes (+K planted no-ops) per key → K intervals
    val nKeys = math.max(5L, target / 6L / 5L * 5L) // multiple of 5: totals exact
    val ch = spark.range(nKeys).select(col("id").as("k"),
        explode(sequence(lit(0), pmod(col("id"), lit(5L)).cast("int"))).as("v"))
    val real = ch.select(col("k"), timestamp_seconds(lit(epoch0) + col("v") * 3600L).as("ts"),
      (col("v") * 2).as("tie"), concat(lit("s"), col("v")).as("value"))
    val noops = ch.select(col("k"), timestamp_seconds(lit(epoch0) + col("v") * 3600L + 1800L).as("ts"),
      (col("v") * 2 + 1).as("tie"), concat(lit("s"), col("v")).as("value"))
    val scdDir = graft.core.TempDirs.create("graft-scale-a") + "/changes"
    real.unionByName(noops).write.mode("overwrite").parquet(scdDir)
    val changes = spark.read.parquet(scdDir)
    println(s"SCALE scd2 change rows: ${changes.count()} (keys: $nKeys)")
    val (nIntervals, nCurrent, k4versions) = timed("scd2 history (k10 shape)") {
      val hist = Upsert.scd2History(changes, "k", "ts", "tie", "value").cache()
      val r = (hist.count(), hist.filter(col("is_current")).count(),
        hist.filter(col("k") === 4L).count())
      hist.unpersist()
      r
    }
    // key id has id%5+1 changes; avg 3 → 3·nKeys intervals, one current per key
    check("scd2 compacts planted no-ops to exactly K intervals per key",
      nIntervals == 3 * nKeys && nCurrent == nKeys && k4versions == 5,
      s"intervals=$nIntervals (exp ${3 * nKeys}) current=$nCurrent (exp $nKeys) key4=$k4versions (exp 5)")

    // ---- multi-unit resample: 15-minute LOCF grid over hourly series ----
    // 5000 keys × 720 hourly points (value = hour index) → 14.4M grid rows;
    // every grid value must equal its hour's observation (LOCF exact) and
    // gap count is exactly 3 interior quarters per hour.
    val nSeries = 5000L
    // NB: `/` on long columns is DOUBLE division in Spark — floor() it
    // back to the integer hour index or the grid lands off-hour
    val hourIdx = floor(col("id") / nSeries).cast("long")
    val pts = spark.range(nSeries * 720L).select(
      (col("id") % nSeries).as("k"),
      timestamp_seconds(lit(epoch0) + hourIdx * 3600L).as("ts"),
      hourIdx.cast("double").as("v"))
    val ptsDir = graft.core.TempDirs.create("graft-scale-a") + "/pts"
    pts.write.mode("overwrite").parquet(ptsDir)
    val points = spark.read.parquet(ptsDir)
    val (gridRows, gaps, wrongLocf) = timed("resample 15m LOCF (a15 shape)") {
      val g = TimeSeries.resample(points, col("k"), col("ts"), col("v"), "15 minutes").cache()
      val wrong = g.filter(col("value") =!=
        floor((col("ts_grid").cast("long") - epoch0) / 3600L).cast("double")).count()
      val r = (g.count(), g.filter(col("is_gap")).count(), wrong)
      g.unpersist()
      r
    }
    // per key: grid spans h=0..719 at 900s → 719*4+1 = 2877 rows, 719*3 gaps
    check("15-minute resample grid + LOCF values exact at 14.4M rows",
      gridRows == nSeries * 2877 && gaps == nSeries * 2157 && wrongLocf == 0,
      s"rows=$gridRows (exp ${nSeries * 2877}) gaps=$gaps (exp ${nSeries * 2157}) badLocf=$wrongLocf")

    // ---- z-score outliers: 20M rows, planted 1e6 spikes in one hot group
    val zDir = graft.core.TempDirs.create("graft-scale-a") + "/z"
    spark.range(target).select(col("id"),
        pmod(col("id"), lit(1000L)).as("g"),
        when(pmod(col("id"), lit(20000L)) === 0, lit(1e6))
          .otherwise((pmod(xxhash64(col("id")), lit(100L))).cast("double")).as("v"))
      .write.mode("overwrite").parquet(zDir)
    val zdf = spark.read.parquet(zDir)
    val nPlanted = target / 20000L
    val (zFlagged, zOnlyPlanted) = timed("zscore outliers (a18 shape)") {
      val z = Profile.zscoreOutliers(zdf, col("g"), col("v")).cache()
      val flagged = z.filter(col("is_outlier"))
      val r = (flagged.count(), flagged.filter(col("v") === 1e6).count())
      z.unpersist()
      r
    }
    check("zscore flags exactly the planted 1e6 spikes",
      zFlagged == nPlanted && zOnlyPlanted == nPlanted,
      s"flagged=$zFlagged planted=$nPlanted all-planted=${zFlagged == zOnlyPlanted}")

    // ---- heavyHitters: hot-skewed columns at 20M rows, exact share ----
    // 'hot' column: 40% one value (the skew the salted two-phase top-k is
    // for), remainder unique (12M distinct values); plus two mid-card
    // columns profiled off the SAME scan.
    val hhDir = graft.core.TempDirs.create("graft-scale-a") + "/hh"
    spark.range(target).select(
        when(pmod(col("id"), lit(5L)) < 2, lit("HOT"))
          .otherwise(concat(lit("u"), col("id"))).as("hot"),
        pmod(col("id"), lit(97L)).cast("string").as("code"),
        pmod(col("id"), lit(2L)).cast("string").as("flag"))
      .write.mode("overwrite").parquet(hhDir)
    val hhdf = spark.read.parquet(hhDir)
    val hh = timed("heavyHitters on 40%-hot column (prof_skew shape)") {
      Profile.heavyHitters(hhdf, Seq("hot", "code", "flag"), k = 5).collect()
    }
    val hotTop = hh.filter(_.getString(0) == "hot").head
    check("heavyHitters recovers planted 40% hitter exactly",
      hotTop.getString(1) == "HOT" && hotTop.getLong(2) == target * 2 / 5 &&
        hotTop.getDouble(3) == 0.4 &&
        hh.count(_.getString(0) == "flag") == 2 && hh.count(_.getString(0) == "code") == 5,
      s"top=${hotTop.getString(1)} n=${hotTop.getLong(2)} share=${hotTop.getDouble(3)}")

    println(if (failures == 0) "SCALE analytics: ALL CHECKS PASSED"
    else s"SCALE analytics: $failures CHECK(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("approx column profile agrees with exact within HLL tolerance") {
    val df = graft.core.Tables.table(spark, sf("sf0.01"), "orders")
    val cols = Seq("o_orderkey", "o_orderstatus")
    val exact = Profile.columnProfile(df, cols, approxDistinct = false)
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile.columnProfile(df, cols, approxDistinct = true)
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      // HLL++ default rsd is 5%; allow 2 sigma
      assert(math.abs(a - e) / e < 0.10, s"$c: approx $a vs exact $e")
    }
  }

  test("columnProfile default plans HLL (no Expand); only the exact opt-in pays it") {
    // pins the cost story the oracle entry depends on: prof_columns
    // pins approxDistinct=false ONLY so DuckDB can hash-match; the
    // operator DEFAULT must stay map-side HLL — if someone "optimizes"
    // the exact path away, the oracle breaks, and if someone defaults
    // to exact, the 100 TB profile shape silently inherits an Expand
    // that multiplies the scan by the column count. This spec fails
    // either way.
    val df = graft.core.Tables.table(spark, sf("sf0.001"), "orders")
    val cols = Seq("o_orderkey", "o_orderstatus")
    val defPlan = Profile.columnProfile(df, cols)
      .queryExecution.executedPlan.toString
    assert(defPlan.contains("approx_count_distinct"), defPlan)
    assert(!defPlan.contains("Expand"), defPlan)
    val exactPlan = Profile.columnProfile(df, cols, approxDistinct = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand") && !exactPlan.contains("approx_count_distinct"),
      exactPlan)
  }

  test("charNgramPairs refuses a candidate universe past maxDocs") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdefghik"), (3L, "zzzzzzzzzz"))
      .toDF("doc_id", "body")
    // within the cap: the exact baseline runs and finds the planted pair
    val ok = DedupSuite.charNgramPairs(docs, "doc_id", col("body"), n = 5,
      threshold = 0.3, maxDocs = 3)
    assert(ok.count() === 1)
    val e = intercept[IllegalArgumentException] {
      DedupSuite.charNgramPairs(docs, "doc_id", col("body"), n = 5,
        threshold = 0.3, maxDocs = 2)
    }
    assert(e.getMessage.contains("minhashNearDupPairs"))
  }

  test("skewedEquiJoin is bit-identical to the plain join for every supported type") {
    // 40%-hot key, null keys both sides, right-side duplicates, keys
    // present on only one side — every equi-join edge case at once
    val left = spark.range(2000).select(
      when(col("id") % 5 < 2, lit("HOT"))
        .when(col("id") % 97 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("k"), (col("id") % 60).cast("string"))).as("k"),
      col("id").as("lv"))
    val right = spark.range(120).select(
      when(col("id") === 0, lit("HOT"))
        .when(col("id") === 1, lit(null).cast("string"))
        .otherwise(concat(lit("k"), (col("id") % 45).cast("string"))).as("k"),
      col("id").as("rv")) // k0..k44 duplicated; k45..k59 left-only
    val hot = Seq("HOT", "k3").toDF("k")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val fast = Joins.skewedEquiJoin(left, right, Seq("k"), hot, jt,
        saltBuckets = 8)
      val plain = left.join(right, Seq("k"), jt)
      assert(fast.columns.toSeq.sorted == plain.columns.toSeq.sorted, jt)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.select(plain.columns.sorted.map(col).toIndexedSeq: _*)
          .collect().map(_.toString).toSeq.sorted
      assert(canon(fast) == canon(plain), s"join type $jt diverged")
    }
    // outer-right types are refused (replication would duplicate rows)
    intercept[IllegalArgumentException] {
      Joins.skewedEquiJoin(left, right, Seq("k"), hot, "full")
    }
  }

  test("skewedEquiJoinSampled detects the planted hot key and matches the plain join") {
    val left = spark.range(5000).select(
      when(col("id") % 5 < 2, lit("HOT"))
        .otherwise(concat(lit("k"), (col("id") % 40).cast("string"))).as("k"),
      col("id").as("lv"))
    val right = spark.range(41).select(
      when(col("id") === 40, lit("HOT"))
        .otherwise(concat(lit("k"), col("id").cast("string"))).as("k"),
      col("id").as("rv"))
    // full sample so detection is exact in the spec; production uses 0.001
    val fast = Joins.skewedEquiJoinSampled(left, right, Seq("k"),
      saltBuckets = 8, hotShare = 0.1, sampleFraction = 1.0)
    val plain = left.join(right, Seq("k"), "inner")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(plain.columns.sorted.map(col).toIndexedSeq: _*)
        .collect().map(_.toString).toSeq.sorted
    assert(canon(fast) == canon(plain))
    // the 40%-hot key must be salted: the plan carries the salt exchange
    assert(fast.queryExecution.executedPlan.toString.contains("_salt_"))
    // degenerate: nothing hot -> still identical to the plain join
    val uniform = spark.range(400).select(
      concat(lit("k"), (col("id") % 40).cast("string")).as("k"), col("id").as("lv"))
    val fastU = Joins.skewedEquiJoinSampled(uniform, right, Seq("k"),
      hotShare = 0.5, sampleFraction = 1.0)
    assert(canon(fastU) == canon(uniform.join(right, Seq("k"), "inner")))
  }

  test("skewedEquiJoinSampled tolerates a join key named _n (r8 review)") {
    val left = spark.range(200).select((col("id") % 3).cast("string").as("_n"),
      col("id").as("lv"))
    val right = spark.range(9).select((col("id") % 3).cast("string").as("_n"),
      col("id").as("rv"))
    val fast = Joins.skewedEquiJoinSampled(left, right, Seq("_n"),
      hotShare = 0.2, sampleFraction = 1.0)
    assert(fast.count() == left.join(right, Seq("_n"), "inner").count())
  }

  test("skewedEquiJoin plan: hot path shuffles on (key, salt)") {
    val left = spark.range(1000).select(
      (col("id") % 3).cast("string").as("k"), col("id").as("lv"))
    val right = spark.range(30).select(
      (col("id") % 3).cast("string").as("k"), col("id").as("rv"))
    val hot = Seq("0").toDF("k")
    val joined = Joins.skewedEquiJoin(left, right, Seq("k"), hot,
      "inner", saltBuckets = 8)
    val plan = joined.queryExecution.executedPlan.toString
    // the hot path's exchange must carry the salt column — that IS the
    // skew spread; without it the hot key still lands on one reducer
    assert(plan.contains("_salt_"), plan)
    assert(plan.contains("pmod"), plan)
  }

  test("scd2History compacts no-op changes and assigns validity intervals") {
    val changes = Seq(
      (1L, "2024-01-01", 1L, 10.0),
      (1L, "2024-01-02", 2L, 10.0), // no-op: same value -> compacted away
      (1L, "2024-01-03", 3L, 20.0),
      (2L, "2024-01-01", 4L, 5.0)
    ).toDF("k", "ts", "id", "v")
    val got = Upsert.scd2History(changes, "k", "ts", "id", "v")
      .orderBy("k", "version")
      .as[(Long, String, Long, Double, Option[String], Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01", 1L, 10.0, Some("2024-01-03"), 1L, false),
      (1L, "2024-01-03", 3L, 20.0, None, 2L, true),
      (2L, "2024-01-01", 4L, 5.0, None, 1L, true)))
  }

  test("scd2History keeps a null state as a real version") {
    val changes = Seq(
      (1L, "2024-01-01", 1L, Some(1.0)),
      (1L, "2024-01-02", 2L, None),       // transition to null = a change
      (1L, "2024-01-03", 3L, None)        // still null -> compacted
    ).toDF("k", "ts", "id", "v")
    val got = Upsert.scd2History(changes, "k", "ts", "id", "v")
    assert(got.count() == 2)
    assert(got.filter($"is_current").select("ts").as[String].head() == "2024-01-02")
  }

  test("resample fills gaps on a regular grid with LOCF and flags them") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val pts = Seq(
      ("a", t("2024-01-01 00:10:00"), 1.0),
      ("a", t("2024-01-01 03:20:00"), 4.0), // hours 1 and 2 are gaps
      ("b", t("2024-01-01 05:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.resample(pts, col("k"), col("ts"), col("v"), "1 hour")
      .orderBy("key", "ts_grid")
      .as[(String, java.sql.Timestamp, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", t("2024-01-01 00:00:00"), 1.0, false),
      ("a", t("2024-01-01 01:00:00"), 1.0, true),
      ("a", t("2024-01-01 02:00:00"), 1.0, true),
      ("a", t("2024-01-01 03:00:00"), 4.0, false),
      ("b", t("2024-01-01 05:00:00"), 9.0, false)))
    intercept[IllegalArgumentException] {
      TimeSeries.resample(pts, col("k"), col("ts"), col("v"), "7 weeks")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.resample(pts, col("k"), col("ts"), col("v"), "0 hours")
    }
  }

  test("resample supports multi-unit steps via epoch-floor snapping") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val pts = Seq(
      ("a", t("2024-01-01 00:10:00"), 1.0),
      ("a", t("2024-01-01 03:20:00"), 4.0),
      ("b", t("2024-01-01 05:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    // 2-hour grid: observations snap INTO their bucket, none dropped
    val got2h = TimeSeries.resample(pts, col("k"), col("ts"), col("v"), "2 hours")
      .orderBy("key", "ts_grid")
      .as[(String, java.sql.Timestamp, Double, Boolean)].collect().toSeq
    assert(got2h == Seq(
      ("a", t("2024-01-01 00:00:00"), 1.0, false),
      ("a", t("2024-01-01 02:00:00"), 4.0, false),
      ("b", t("2024-01-01 04:00:00"), 9.0, false)))
    // 15-minute grid: 00:00 .. 03:15 inclusive = 14 points for key a,
    // gaps carry the last observation forward
    val got15 = TimeSeries.resample(pts, col("k"), col("ts"), col("v"), "15 minutes")
      .filter(col("key") === "a").orderBy("ts_grid")
      .as[(String, java.sql.Timestamp, Double, Boolean)].collect().toSeq
    assert(got15.length == 14)
    assert(got15.head == (("a", t("2024-01-01 00:00:00"), 1.0, false)))
    assert(got15(1) == (("a", t("2024-01-01 00:15:00"), 1.0, true)))
    assert(got15.last == (("a", t("2024-01-01 03:15:00"), 4.0, false)))
    assert(got15.count(_._4 == false) == 2)
  }

  test("zscoreOutliers flags 3-sigma deviants, handles singleton groups") {
    val df = ((1 to 40).map(i => ("a", 100.0 + (i % 5))) ++
      Seq(("a", 500.0), ("b", 7.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Profile.zscoreOutliers(df, col("g"), col("v"))
    val flagged = got.filter(col("is_outlier")).select("v").as[Double].collect().toSeq
    assert(flagged == Seq(500.0))
    // singleton group: no sample stddev, never flagged
    val b = got.filter(col("g") === "b").select("stddev", "is_outlier").collect().head
    assert(b.isNullAt(0) && !b.getBoolean(1))
    intercept[IllegalArgumentException] {
      Profile.zscoreOutliers(df.withColumn("mean", lit(1)), col("g"), col("v"))
    }
  }

  test("zscoreOutliers survives near-constant groups and NULL values") {
    // 40 identical tiny values: decimal quantization makes the variance
    // formula slightly negative without the clamp -> NaN stddev
    val nearConst = (1 to 40).map(i => (i.toLong, "a", Some(0.0015)))
      .toDF("id", "g", "v")
    val g1 = Profile.zscoreOutliers(nearConst, col("g"), col("v"))
    assert(!g1.filter(isnan(col("stddev"))).limit(1).collect().nonEmpty)
    assert(g1.filter(col("is_outlier")).count() == 0)
    // a NULL value reads as NOT an outlier, never as NULL
    val withNull = ((1 to 10).map(i => (i.toLong, "a", Some(i.toDouble))) :+
      (99L, "a", None)).toDF("id", "g", "v")
    val row = Profile.zscoreOutliers(withNull, col("g"), col("v"))
      .filter(col("id") === 99L).select("is_outlier").collect().head
    assert(!row.isNullAt(0) && !row.getBoolean(0))
  }

  test("zscoreOutliers never flags NaN/Inf rows (excluded from moments AND gate)") {
    // Spark orders NaN above every numeric, so without the finite gate
    // |NaN - mean| > t*stddev reads TRUE and a non-finite row would be
    // flagged despite being excluded from the stats it is judged against
    val df = ((1 to 40).map(i => (i.toLong, "a", 100.0 + (i % 5))) ++ Seq(
      (97L, "a", Double.NaN), (98L, "a", Double.PositiveInfinity),
      (99L, "a", Double.NegativeInfinity), (96L, "a", 500.0)))
      .toDF("id", "g", "v")
    val got = Profile.zscoreOutliers(df, col("g"), col("v"))
    val flagged = got.filter(col("is_outlier")).select("id").as[Long].collect().toSeq
    assert(flagged == Seq(96L)) // the genuine deviant, never the non-finite rows
    // and the non-finite rows did not poison anyone's mean/stddev
    assert(got.filter(isnan(col("mean")) || isnan(col("stddev"))).count() == 0)
  }

  test("histogram excludes NaN instead of poisoning the bounds") {
    val df = Seq(1.0, 2.0, 3.0, Double.NaN).toDF("x")
    val got = Profile.histogram(df, col("x"), bins = 2)
      .orderBy("bucket").as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((0L, 1.0, 1L), (1L, 2.0, 2L))) // NaN row gone, bounds sane
  }

  test("histogram buckets equal-width with closed-right max and degenerate case") {
    val df = (0 to 10).map(_.toDouble).toDF("x")
    val got = Profile.histogram(df, col("x"), bins = 5)
      .orderBy("bucket").as[(Long, Double, Long)].collect().toSeq
    // width 2: buckets [0,2),[2,4),[4,6),[6,8),[8,10]; 10 joins the last
    assert(got == Seq((0L, 0.0, 2L), (1L, 2.0, 2L), (2L, 4.0, 2L),
      (3L, 6.0, 2L), (4L, 8.0, 3L)))
    val flat = Seq(5.0, 5.0, 5.0).toDF("x")
    val one = Profile.histogram(flat, col("x"), bins = 5)
      .as[(Long, Double, Long)].collect().toSeq
    assert(one == Seq((0L, 5.0, 3L)))
  }

  test("heavyHitters ranks values by count with share of all rows") {
    val df = Seq("a", "a", "a", "b", "b", "c").map(Tuple1(_)).toDF("k")
      .withColumn("other", lit(1))
    val got = Profile.heavyHitters(df, Seq("k"), k = 2)
      .orderBy(desc("n"), asc("value"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("k", "a", 3L, 0.5), ("k", "b", 2L, 2.0 / 6.0)))
    // NULLs: excluded from the report, counted in the share denominator
    val withNulls = Seq(Some("x"), Some("x"), None, None).map(Tuple1(_)).toDF("k")
    val nn = Profile.heavyHitters(withNulls, Seq("k"), k = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(nn == Seq(("k", "x", 2L, 0.5)))
  }

  test("heavyHitters emits report order without a caller sort") {
    // consumers read the report top-down: (column asc, n desc, value asc)
    // is part of the API, not an accident of the physical plan
    val df = (1 to 60).map(i => (s"u${i % 3}", s"e${i % 5}")).toDF("b_user", "a_event")
    val got = Profile.heavyHitters(df, Seq("b_user", "a_event"), k = 3)
      .as[(String, String, Long, Double)].collect().toSeq
    val expected = got.sortBy { case (c, v, n, _) => (c, -n, v) }
    assert(got == expected)
    assert(got.map(_._1).distinct == Seq("a_event", "b_user"))
  }

  test("heavyHitters profiles all columns off one input scan, <= 2 jobs") {
    val df = (1 to 200).map(i => (s"u${i % 7}", s"e${i % 3}", i % 11))
      .toDF("user_id", "event_type", "code")
    val cols = Seq("user_id", "event_type", "code")
    val hh = Profile.heavyHitters(df, cols, k = 3)
    // one unpivoted pairs scan + one broadcast-total scan — NOT a scan per
    // column (the old shape: |cols|+1 = 4 LocalTableScans here)
    val scans = "LocalTableScan".r
      .findAllIn(hh.queryExecution.executedPlan.toString).length
    assert(scans == 2, s"expected 2 input scans, plan has $scans")
    // job count: broadcast-total job + main action job (AQE off for the
    // measurement — adaptive execution materializes stages as extra jobs)
    val sc = spark.sparkContext
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      sc.setJobGroup("hh-jobs", "heavyHitters job count", interruptOnCancel = false)
      val rows = Profile.heavyHitters(df, cols, k = 3).collect()
      assert(rows.length == 3 * 3)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var ids = sc.statusTracker.getJobIdsForGroup("hh-jobs")
      while (ids.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); ids = sc.statusTracker.getJobIdsForGroup("hh-jobs")
      }
      Thread.sleep(300) // let any trailing job-start events land
      ids = sc.statusTracker.getJobIdsForGroup("hh-jobs")
      assert(ids.nonEmpty && ids.length <= 2,
        s"heavyHitters ran ${ids.length} jobs: ${ids.mkString(",")}")
    } finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("iqrOutliers flags values outside 1.5 IQR of their group") {
    // spread bulk (90..108 by 2) -> q1=93.5, q3=104.5, fence [77, 121]
    val df = ((90L to 108L by 2) ++ Seq(1000L, 1L))
      .zipWithIndex.map { case (v, i) => (i.toLong, "en", v) }
      .toDF("id", "lang", "n")
    val got = Profile.iqrOutliers(df, col("lang"), col("n"))
    val flagged = got.filter(col("is_outlier")).select("n").as[Long].collect().toSet
    assert(flagged == Set(1000L, 1L))
    assert(got.count() == 12) // gate flags, never drops
  }

  test("iqrOutliers keeps NULL-group rows as their own group") {
    val df = Seq((1L, Some("en"), 10L), (2L, None, 10L), (3L, None, 11L))
      .toDF("id", "lang", "n")
    val got = Profile.iqrOutliers(df, col("lang"), col("n"))
    assert(got.count() == 3) // null lang rows gated, not dropped
    intercept[IllegalArgumentException] {
      Profile.iqrOutliers(df.withColumn("q1", lit(0)), col("lang"), col("n"))
    }
  }

  test("bloom prefilter widens int keys and fails fast on strings") {
    val large = (1 to 100).map(i => (i, i)).toDF("k", "v") // IntegerType key
    val small = Seq(5L, 50L).toDF("sk")                    // LongType key
    val got = Joins.bloomPrefilterJoin(large, small, "k", "sk")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == Seq(5, 50))
    val e = intercept[IllegalArgumentException] {
      Joins.bloomPrefilterJoin(large.withColumn("s", lit("x")), small, "s", "sk")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("scd2History refuses input columns named like its outputs") {
    val df = Seq((1L, "2024-01-01", 1L, 1.0)).toDF("k", "version", "id", "v")
    intercept[IllegalArgumentException] {
      Upsert.scd2History(df, "k", "version", "id", "v")
    }
  }

  test("bloom prefilter join equals the plain join, and rejects outer joins") {
    val large = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
    val small = Seq(3L, 500L, 999L, 2000L).toDF("sk")
    val got = Joins.bloomPrefilterJoin(large, small, "k", "sk")
      .select("k", "v", "sk").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "v", "sk").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == plain && got.map(_._1) == Seq(3L, 500L, 999L))
    // left_semi keeps only large columns
    val semi = Joins.bloomPrefilterJoin(large, small, "k", "sk", "left_semi")
    assert(semi.columns.toSeq == Seq("k", "v") && semi.count() == 3)
    intercept[IllegalArgumentException] {
      Joins.bloomPrefilterJoin(large, small, "k", "sk", "left")
    }
  }

  test("bloom sketch never yields false negatives at tight fpp") {
    val large = (1L to 5000L).toDF("k")
    val small = (1L to 5000L by 50).map(Tuple1(_)).toDF("sk")
    val n = Joins.bloomPrefilterJoin(large, small, "k", "sk").count()
    assert(n == small.count()) // every true match survives the prefilter
  }

  test("trimStrings trims and nulls empty strings") {
    val df = Seq((1, "  a  "), (2, "   "), (3, "b")).toDF("id", "s")
    val got = Cleaners.trimStrings(df).orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, null), (3, "b")))
  }

  test("requireFields drops and rejects captures") {
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None))
      .toDF("id", "name")
    assert(Cleaners.requireFields(df, Seq("id", "name")).count() == 1)
    assert(Cleaners.rejects(df, Seq("id", "name")).count() == 2)
    intercept[IllegalArgumentException] {
      Cleaners.assertFields(df, Seq("id"))
    }
  }

  test("normalizeColumnNames snake_cases") {
    val df = Seq((1, 2)).toDF("User  Name", "AGE col")
    assert(Cleaners.normalizeColumnNames(df).columns.toSeq == Seq("user_name", "age_col"))
  }

  test("enrich adds record_count and processed_at") {
    val df = Seq(1, 2, 3).toDF("x")
    val got = Cleaners.enrich(df, java.time.Instant.parse("2026-01-01T00:00:00Z"))
    assert(got.select("record_count").distinct().as[Long].collect().toSeq == Seq(3L))
    assert(got.columns.contains("processed_at"))
  }

  test("keepLastBy keeps greatest order per key; keepFirstBy the least") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ord", "v")
    val last = Dedup.keepLastBy(df, Seq("k"), col("ord")).orderBy("k")
      .select("v").as[String].collect().toSeq
    assert(last == Seq("new", "only"))
    val first = Dedup.keepFirstBy(df, Seq("k"), col("ord")).orderBy("k")
      .select("v").as[String].collect().toSeq
    assert(first == Seq("old", "only"))
  }

  test("replaceByKey replaces matching keys and keeps the rest") {
    val existing = Seq(("a", 1), ("b", 1), ("c", 1)).toDF("k", "v")
    val fresh = Seq(("b", 2)).toDF("k", "v")
    val got = Upsert.replaceByKey(existing, fresh, Seq("k"))
      .orderBy("k").as[(String, Int)].collect().toSeq
    assert(got == Seq(("a", 1), ("b", 2), ("c", 1)))
  }

  test("replaceByKey is idempotent") {
    val existing = Seq(("a", 1), ("b", 1)).toDF("k", "v")
    val fresh = Seq(("b", 2)).toDF("k", "v")
    val once = Upsert.replaceByKey(existing, fresh, Seq("k"))
    val twice = Upsert.replaceByKey(once, fresh, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("appendDedup prefers fresh on collision") {
    val existing = Seq(("a", 1, 1), ("b", 1, 1)).toDF("k", "ord", "v")
    val fresh = Seq(("b", 1, 9), ("c", 1, 9)).toDF("k", "ord", "v")
    val got = Upsert.appendDedup(existing, fresh, Seq("k"), col("ord"))
      .orderBy("k").select("v").as[Int].collect().toSeq
    assert(got == Seq(1, 9, 9))
  }

  test("unionMerge aligns schemas with nulls") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, 9.5)).toDF("id", "score")
    val got = Joins.unionMerge(Seq(a, b))
    assert(got.columns.toSet == Set("id", "name", "score"))
    assert(got.count() == 2)
    assert(got.filter($"score".isNull).count() == 1)
  }

  test("topOnePerGroup picks by order with tiebreak") {
    val df = Seq(("g1", 1, 10), ("g1", 2, 10), ("g2", 3, 5)).toDF("g", "id", "n")
    val got = Windows.topOnePerGroup(df, Seq("g"), Seq($"n".desc, $"id".asc))
      .orderBy("g").select("id").as[Int].collect().toSeq
    assert(got == Seq(1, 3))
  }

  test("timeseries hourly/daily cascade golden") {
    val pts = Seq(
      ("2024-01-01 00:10:00", 10.0), ("2024-01-01 00:50:00", 20.0),
      ("2024-01-01 01:30:00", 40.0), ("2024-01-02 05:00:00", 8.0))
      .toDF("ts", "price").withColumn("ts", to_timestamp($"ts"))
    val hourly = TimeSeries.hourlyStats(pts, $"ts", $"price").orderBy("hour_start")
    val h = hourly.collect()
    assert(h.length == 3)
    val first = h(0)
    assert(first.getAs[Double]("avg_price") == 15.0)
    assert(first.getAs[Double]("first_price") == 10.0)
    assert(first.getAs[Double]("last_price") == 20.0)
    assert(first.getAs[Long]("data_points") == 2L)
    val daily = TimeSeries.dailyStats(hourly).orderBy("day_start").collect()
    assert(daily.length == 2)
    val d1 = daily(0)
    assert(d1.getAs[Double]("opening_price") == 10.0)
    assert(d1.getAs[Double]("closing_price") == 40.0)
    assert(d1.getAs[Long]("total_data_points") == 3L)
    assert(d1.getAs[Long]("hours_with_data") == 2L)
    assert(d1.getAs[Double]("price_change") == 30.0)
    assert(d1.getAs[Double]("price_change_pct") == 300.0)
  }

  test("minhash LSH finds an obvious near-dup pair and skips distinct docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (3L, "completely different content about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val pairs = DedupSuite.minhashNearDupPairs(docs, "doc_id", $"text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
    assert(DedupSuite.dropListFromPairs(
      pairs.toDF("id_a", "id_b")).as[Long].collect().toSeq == Seq(2L))
  }

  test("minhash bucket-cap truncation is auditable, not silent") {
    // degenerate corpus: 30 identical docs all land in the same buckets;
    // with bucketCap=10 the pair expansion drops pairs — the audit must
    // surface those buckets, and a healthy corpus must report zero.
    val dup = (1L to 30L).map(i => (i, "same exact text repeated in every document here"))
      .toDF("doc_id", "text")
    val truncated = DedupSuite.minhashBucketTruncation(dup, "doc_id", $"text",
      shingleSize = 3, numHashes = 64, bands = 16, bucketCap = 10)
    assert(truncated.count() > 0)
    assert(truncated.agg(max($"bucket_size")).as[Int].head() == 30)
    val healthy = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    assert(DedupSuite.minhashBucketTruncation(healthy, "doc_id", $"text",
      bucketCap = 10).count() == 0)
  }

  test("simhash of identical docs is identical, near docs are close") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sigs = df.select(DedupSuite.simhash64($"text")).as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhashTable (agg shape) agrees with the simhash64 column") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "spark catalyst tungsten"),
      (3L, "")).toDF("doc_id", "text")
    val fromCol = df.select($"doc_id",
      DedupSuite.simhash64($"text").as("s")).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    val fromTable = DedupSuite.simhashTable(df, "doc_id", $"text")
      .orderBy("_id").as[(Long, Long)].collect().toSeq
    assert(fromCol == fromTable)
  }

  test("exactDedupStats counts copies") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "diff")).toDF("doc_id", "text")
    val got = DedupSuite.exactDedupStats(df, $"text", $"doc_id")
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("dedupClusters resolves transitive chains the keep-first policy misses") {
    // chain: 1~2, 2~3, 3~4 (one component), plus isolated pair 10~11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = DedupSuite.dedupClusters(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // keep-first would keep 1 AND drop 2,3,4 — same here — but on a
    // reversed chain (4~3, 3~2, 2~1) keep-first keeps nothing extra while
    // clusters still yield ONE survivor (the min) per component
    val survivors = got.map(_._2).distinct
    assert(survivors == Seq(1L, 10L))
  }

  test("incrementalNearDup finds corpus and in-batch fuzzy matches") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearA = base.replace("w30", "zz")  // ~0.93 shingle-jaccard vs base
    val corpus = Seq((1L, base), (2L, "completely different text entirely here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, nearA),                       // near-dup of corpus doc 1
      (11L, "fresh unrelated content words abc def ghi jkl mno"),
      (12L, nearA.replace("w1 ", "w1b ")) // near-dup of batch doc 10
    ).toDF("doc_id", "text")
    val got = DedupSuite.incrementalNearDup(corpus, batch, "doc_id", $"text",
      threshold = 0.7)
      .select("batch_id", "match_id", "origin")
      .as[(Long, Long, String)].collect().toSet
    assert(got.contains((10L, 1L, "corpus")))
    assert(got.contains((12L, 10L, "batch")))
    assert(!got.exists(_._1 == 11L))
  }

  test("chunkDedup keeps the first occurrence of a repeated chunk and " +
    "reconstructs the survivors in order") {
    // 20-token chunks: doc 1 = [A][B-partial]; doc 2 repeats chunk A then
    // adds its own tail; doc 3 is chunk A alone (fully deduplicated away).
    val a = (1 to 20).map(i => s"tok$i").mkString(" ")
    val tail = "alpha beta gamma"
    val own = (1 to 20).map(i => s"own$i").mkString(" ")
    val df = Seq(
      (1L, s"$a $tail"), (2L, s"$a $own"), (3L, a))
      .toDF("doc_id", "text")
    val got = DedupSuite.chunkDedup(df, "doc_id", $"text", chunkTokens = 20)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, s"$a $tail"),
      (2L, 2L, 1L, own),
      (3L, 1L, 0L, "")))
  }

  test("withQualityCounters counts in the same pass as the materialization") {
    // run on a CHILD session: .observe() initializes the session's lazy
    // ObservationManager (non-serializable, non-transient in Spark 4.1),
    // and MLlib model closures capture their training session via
    // trainingSummary — observing on the shared session would break model
    // serialization in concurrently-running ML suites.
    val s2 = spark.newSession()
    val df = s2.createDataFrame(Seq(
      (1L, "ok", 10.0), (2L, null.asInstanceOf[String], -1.0),
      (3L, "ok", -5.0), (4L, "ok", 2.0))).toDF("id", "name", "v")
    val (observed, obs) = Cleaners.withQualityCounters(df, Map(
      "null_name" -> col("name").isNull,
      "negative_v" -> (col("v") < 0)))
    val landed = observed.filter(col("name").isNotNull).count() // one action
    assert(landed == 3)
    // counters reflect the observed frame (pre-filter), exactly once
    assert(obs.get == Map("null_name" -> 1L, "negative_v" -> 2L))
  }

  test("incrementalDedup classifies batch docs against the corpus index") {
    val corpus = Seq((1L, "indexed doc"), (2L, "other doc")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "indexed doc"),   // dup of corpus
      (11L, "fresh text"),    // new
      (12L, "fresh text"),    // dup of 11 within the batch
      (13L, "also fresh")     // new
    ).toDF("doc_id", "text")
    val got = DedupSuite.incrementalDedup(corpus, batch, "doc_id", $"text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (10L, "dup_of_corpus"), (11L, "new"),
      (12L, "dup_in_batch"), (13L, "new")))
  }

  test("incrementalDedup keeps null-text batch docs (one status row per doc)") {
    val corpus = Seq((1L, "indexed doc"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, null.asInstanceOf[String]),  // no content -> new, NOT dropped
      (11L, null.asInstanceOf[String]),  // second null is not its dup
      (12L, "indexed doc"))
      .toDF("doc_id", "text")
    val got = DedupSuite.incrementalDedup(corpus, batch, "doc_id", $"text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "new"), (11L, "new"), (12L, "dup_of_corpus")))
  }

  test("semanticDedup drops within-cell near-dups, keeps cross-cell ones") {
    // two well-separated centroids; 1 & 2 are near-dups in cell 0, vector
    // 3 lands in cell 1 so it survives even though it duplicates nothing.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.001f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.3f, 0.8f))) // cos(3,4)≈0.94 < 0.99
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val got = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.99)
      .orderBy("vec_id").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 1), (2L, 0L, 0), (3L, 1L, 1), (4L, 1L, 1)))
  }

  test("pq encode maps a seed vector to its own codes; ADC ranks it first") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val seeds = e.filter($"vec_id" < 16).select($"vec_id", $"embedding")
    val cb = Ann.pqCodebook(seeds, "vec_id", "embedding", m = 8, dim = 64)
    // a seed vector's nearest codeword in every subspace is itself
    val own = Ann.pqEncode(seeds, "vec_id", "embedding", cb, m = 8, dim = 64)
      .filter($"vid" =!= $"code").count()
    assert(own == 0)
    // plant a near-clone of query 0 in the corpus: it encodes to query 0's
    // own codes, so its ADC distance is ~the quantization floor -> rank 1
    val clone = e.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"),
        $"label")
    val q = e.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val top1 = Ann.pqTopK(e.union(clone), "vec_id", "embedding", cb, q,
      k = 1, m = 8, dim = 64)
      .select("neighbor_id").as[Long].head()
    assert(top1 == 9999L)
  }

  test("semanticDedup multi-probe catches the cell-boundary pair single-probe misses") {
    // u/w are near-identical but straddle the c0/c1 boundary: nearest
    // cells differ, second-nearest cells overlap.
    val vecs = Seq(
      (1L, Array(0.72f, 0.70f)), (2L, Array(0.70f, 0.72f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val single = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.99)
      .orderBy("vec_id").as[(Long, Long, Int)].collect().toSeq
    assert(single == Seq((1L, 0L, 1), (2L, 1L, 1))) // both kept: pair unseen
    val probed = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.99,
      probeCells = 2)
      .orderBy("vec_id").as[(Long, Long, Int)].collect().toSeq
    assert(probed == Seq((1L, 0L, 1), (2L, 1L, 0))) // boundary dup caught
  }

  test("semanticDedup's salted pair stage is bit-identical to the unsalted join on a skewed corpus") {
    // a point-mass blob (SemDeDup's own target input: heavy near-dup
    // mass collapses into ONE cell k-means cannot split) plus spread
    // rows. With the cap forced low the hot cell splits into many salt
    // blocks; the drop/keep output must equal the unsalted join's
    // exactly — every unordered within-cell pair meets in exactly one
    // block-pair bucket.
    val blob = (0 until 120).map(i =>
      (i.toLong, Array(1.0f, (i % 7) * 1e-4f, 0.0f)))
    val spread = (0 until 60).map(i =>
      (1000L + i, Array((i % 5) * 0.1f - 0.3f, 1.0f, (i % 11) * 0.05f)))
    val vecs = (blob ++ spread).toDF("vec_id", "embedding")
      .union(Seq((2000L, None: Option[Array[Float]])).toDF("vec_id", "embedding"))
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.6f, 0.8f))).toDF("cell_id", "embedding")
    def run(): Seq[(Long, Option[Long], Int)] =
      Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999)
        .orderBy("vec_id")
        .as[(Long, Option[Long], Int)].collect().toSeq
    val unsalted = withConf(Ann.PairSaltRowsKey -> "0")(run())
    val salted = withConf(Ann.PairSaltRowsKey -> "16")(run())
    assert(salted == unsalted, "salted pair stage changed the drop set")
    // sanity: the skew actually exercised salting (blob cell >> cap)
    // and near-dups in the blob were dropped
    assert(unsalted.count { case (id, _, kept) => id < 120 && kept == 0 } > 100)
    // default cap leaves small corpora on the single-bucket plan
    assert(run() == unsalted)
  }

  test("semanticDedup corpusRows hint at/below the cap takes the unsalted plan, identical output") {
    // the hint is a plan-time PROOF (corpus <= cap -> no cell can exceed
    // the cap -> every _s = 1): the pair stage must skip the per-cell
    // count window and the two explicit salt exchanges while producing
    // the bit-identical drop set; above the cap the hint must NOT
    // disable salting.
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array(1.0f, (i % 7) * 1e-4f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cell_id", "embedding")
    def repartitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      }.size
    val unhinted = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999)
    val hinted = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999,
      corpusRows = 50L)
    assert(repartitions(unhinted) == 2, "unhinted: salted plan expected (2 salt exchanges)")
    assert(repartitions(hinted) == 0, "hinted at/below cap: unsalted plan expected")
    assert(hinted.orderBy("vec_id").collect().toSeq ==
      unhinted.orderBy("vec_id").collect().toSeq)
    // a corpus above the cap keeps the salted plan even when hinted
    val big = withConf(Ann.PairSaltRowsKey -> "16") {
      repartitions(Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999,
        corpusRows = 50L))
    }
    assert(big == 2, "hint above the cap must keep the salted plan")
  }

  test("semanticDedup with salting disabled keeps per-cell parallelism (explicit repartition, no count window)") {
    // cap <= 0 (salting explicitly off) takes the unsalted join but NOT
    // the bare plan: with no plan-time proof the corpus is small, the
    // pair join's quadratic OUTPUT hides behind a tiny shuffle INPUT and
    // AQE's byte-based coalescing would fold the per-cell buckets into
    // one straggler task (the measured 718s-vs-840s pathology the salted
    // branch's explicit repartition defuses) — so the disabled path
    // keeps an AQE-exempt repartition on cell_id while dropping the
    // per-cell count window, and the proven-small hinted path keeps the
    // bare plan (r19 ADVICE pin).
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array(1.0f, (i % 7) * 1e-4f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cell_id", "embedding")
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.optimizedPlan
      (p.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      }.size,
        p.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }.size)
    }
    val hinted = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999,
      corpusRows = 50L)
    assert(shape(hinted) == ((0, 0)), "proven-small: bare unsalted plan")
    val (disabledShape, disabledRows) = withConf(Ann.PairSaltRowsKey -> "0") {
      val df = Ann.semanticDedup(vecs, "vec_id", "embedding", cents, 0.999)
      (shape(df), df.orderBy("vec_id").collect().toSeq)
    }
    assert(disabledShape == ((2, 0)),
      "salting disabled: explicit per-cell repartition, no count window")
    assert(disabledRows == hinted.orderBy("vec_id").collect().toSeq,
      "branch choice must never change the drop set")
  }

  test("adaptiveCellCount defaults to the Θ(n^1.5) optimum (cellSize ≈ √n)") {
    // auto mode: cellSize = ⌈√n⌉, k = ⌈n/cellSize⌉ ≈ √n — BOTH stages
    // (n·k assignment, n·cellSize pair scan) grow as n^1.5. A fixed
    // default cell size was itself a scale bug: k ∝ n/128 keeps n·k
    // quadratic (measured 43.4× at a 10× step, SCALE_SMOKE r15).
    assert(Ann.adaptiveCellCount(500) == 22)   // cell = ⌈√500⌉ = 23
    assert(Ann.adaptiveCellCount(0) == 8)      // floor
    assert(Ann.adaptiveCellCount(64) == 8)     // cell = 8, k = 8
    assert(Ann.adaptiveCellCount(2000) == 45)  // cell = 45
    assert(Ann.adaptiveCellCount(20000) == 141)
    // √ law: a 100× corpus gets ~10× the cells (and ~10× the cell size)
    assert(Ann.adaptiveCellCount(1000000L) == 1000)
    assert(Ann.adaptiveCellCount(100000000L) == 10000)
    // the explicit fixed-cell knob survives for deliberate bias (e.g. a
    // persisted cell layout reused across runs)
    assert(Ann.adaptiveCellCount(20000, targetCellSize = 256) == 79)
    // parity: auto k equals the same k passed as an explicit fixed cell
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    val k = Ann.adaptiveCellCount(e.count())
    assert(k == 22)
    val adaptive = Ann.semanticDedup(e, "vec_id", "embedding",
      e.filter($"vec_id" < k), threshold = 0.43, probeCells = 2)
      .orderBy("vec_id").collect().toSeq
    val explicit = Ann.semanticDedup(e, "vec_id", "embedding",
      e.filter($"vec_id" < Ann.adaptiveCellCount(e.count(), targetCellSize = 23)),
      threshold = 0.43, probeCells = 2)
      .orderBy("vec_id").collect().toSeq
    assert(adaptive == explicit)
  }

  test("two-level assignment with exhaustive coarse probes equals the flat pass bit-for-bit") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    val cents = e.filter($"vec_id" < 16)
    val coarse = Ann.trainCentroids(cents, "embedding", 4)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select($"vid", $"cell_id", $"cell_rank")
      .orderBy($"vid", $"cell_rank")
      .as[(Long, Long, Int)].collect().toSeq
    val flat = proj(Ann.assignCellsFlatTopN(e, "vec_id", "embedding", cents, 2))
    // probing ALL 4 coarse cells makes every fine centroid reachable →
    // identical distances, ordering and tiebreaks (same accumulation)
    val two = proj(Ann.assignCellsTwoLevelTopN(e, "vec_id", "embedding",
      cents, 2, coarse, coarseProbes = 4))
    assert(flat.nonEmpty && two == flat)
  }

  test("assignCellsTopN auto-routes above the centroid-payload bound and stays exact") {
    // pure routing pins: the bound is k·dim·8 bytes against the conf
    assert(Ann.flatAssignmentFits(16, 64, Ann.FlatCentroidMaxBytesDefault))
    assert(Ann.flatAssignmentFits(8192, 1024, 64L << 20))  // exactly at bound
    assert(!Ann.flatAssignmentFits(8193, 1024, 64L << 20)) // one over
    // √n SemDeDup regime at dim 64: k=√n — flat is fine at n=10⁸
    // (10⁴ centroids, ~5 MB), not at n=10¹² (10⁶ centroids, ~512 MB)
    assert(Ann.flatAssignmentFits(10000, 64, Ann.FlatCentroidMaxBytesDefault))
    assert(!Ann.flatAssignmentFits(1000000, 64, Ann.FlatCentroidMaxBytesDefault))
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    val cents = e.filter($"vec_id" < 16)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select($"vid", $"cell_id", $"cell_rank")
      .orderBy($"vid", $"cell_rank")
      .as[(Long, Long, Int)].collect().toSeq
    val flat = proj(Ann.assignCellsTopN(e, "vec_id", "embedding", cents, 2))
    spark.conf.set(Ann.FlatCentroidMaxBytesKey, "64")
    try {
      // 16×64×8 = 8 KiB payload > 64 B bound → the router MUST take the
      // two-level path (visible in the plan: the merge aggregate), and
      // with ⌈√16⌉=4 coarse cells under the default 8 probes the probe
      // set is exhaustive → the answer is still the flat one, exactly
      val routed = Ann.assignCellsTopN(e, "vec_id", "embedding", cents, 2)
      assert(routed.queryExecution.optimizedPlan.toString.contains("collect_list"),
        "payload above the bound must reroute through the two-level merge")
      assert(proj(routed) == flat)
    } finally spark.conf.unset(Ann.FlatCentroidMaxBytesKey)
    // default bound: same call plans FLAT (no merge aggregate)
    val direct = Ann.assignCellsTopN(e, "vec_id", "embedding", cents, 2)
    assert(!direct.queryExecution.optimizedPlan.toString.contains("collect_list"))
  }

  test("two-level assignment keeps the per-row contract: null embeddings and duplicate ids") {
    val corpus = Seq(
      (1L, Some(Array(1.0f, 0.1f))),
      (1L, Some(Array(1.0f, 0.1f))),       // duplicate id: one row each
      (2L, None: Option[Array[Float]]))    // null embedding: survives
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val coarse = Ann.trainCentroids(cents, "embedding", 2)
    val out = Ann.assignCellsTwoLevelTopN(corpus, "vec_id", "embedding",
      cents, 1, coarse, coarseProbes = 2)
      .select($"vid", $"cell_id", $"cell_rank")
      .orderBy($"vid")
      .as[(Long, Option[Long], Option[Int])].collect().toSeq
    assert(out == Seq((1L, Some(10L), Some(1)), (1L, Some(10L), Some(1)),
      (2L, None, None)))
  }

  test("two-level assignment is retry-deterministic: content key, order-independent") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    val cents = e.filter($"vec_id" < 16)
    val coarse = Ann.trainCentroids(cents, "embedding", 4)
    val out = Ann.assignCellsTwoLevelTopN(e, "vec_id", "embedding",
      cents, 2, coarse, coarseProbes = 2)
    // the r17 hazard, closed: the row key is (id, xxhash64(vec)) — no
    // monotonically_increasing_id, no nondeterministic expression
    // anywhere in the plan, so a task retry over an order-
    // nondeterministic upstream re-derives the same key per row and
    // can never split or merge a row's probe groups
    val nondet = out.queryExecution.analyzed.collect {
      case p => p.expressions.filter(e => e.find(!_.deterministic).isDefined)
    }.flatten
    assert(nondet.isEmpty, s"nondeterministic expressions in the plan: $nondet")
    // order-independence, behaviorally: a reshuffled corpus (different
    // partitioning AND row order) produces the identical assignment
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select($"vid", $"cell_id", $"cell_rank")
      .orderBy($"vid", $"cell_rank", $"cell_id")
      .as[(Long, Option[Long], Option[Int])].collect().toSeq
    val reshuffled = Ann.assignCellsTwoLevelTopN(
      e.repartition(7, $"embedding"), "vec_id", "embedding",
      cents, 2, coarse, coarseProbes = 2)
    assert(proj(out).nonEmpty && proj(out) == proj(reshuffled))
  }

  test("two-level assignment: duplicate ids with distinct vecs stay distinct rows") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // same id, different content: two keys,
      (1L, Array(0.0f, 1.0f)),   // two independent assignments
      (2L, Array(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val coarse = Ann.trainCentroids(cents, "embedding", 2)
    val out = Ann.assignCellsTwoLevelTopN(corpus, "vec_id", "embedding",
      cents, 1, coarse, coarseProbes = 2)
      .select($"vid", $"cell_id", $"cell_rank")
      .orderBy($"vid", $"cell_id")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 10L, 1), (1L, 11L, 1), (2L, 10L, 1)))
  }

  test("two-level assignment refuses a duplicate multiplicity above the cap — loudly") {
    // the r18 documented-only degeneracy, now ENFORCED: re-expanding m
    // identical (id, vec) copies emits m·n rows from one task, so a
    // multiplicity above spark.graft.ann.maxDupMultiplicity must raise
    // with the exact-dedup-first pointer, never silently straggle (or,
    // worse, wrap the int cast and silently DROP the key's rows)
    val cents = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val coarse = Ann.trainCentroids(cents, "embedding", 2)
    def corpusOf(copies: Int) =
      (Seq.fill(copies)((1L, Array(1.0f, 0.1f))) :+ (2L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding")
    spark.conf.set(Ann.MaxDupMultiplicityKey, "2")
    try {
      // at the cap: expands one-for-one, the per-row contract intact
      val ok = Ann.assignCellsTwoLevelTopN(corpusOf(2), "vec_id", "embedding",
        cents, 1, coarse, coarseProbes = 2)
        .select($"vid", $"cell_id").orderBy($"vid")
        .as[(Long, Long)].collect().toSeq
      assert(ok == Seq((1L, 10L), (1L, 10L), (2L, 11L)))
      // above it: a loud refusal naming the conf and the reroute
      val err = intercept[Exception] {
        Ann.assignCellsTwoLevelTopN(corpusOf(3), "vec_id", "embedding",
          cents, 1, coarse, coarseProbes = 2).collect()
      }
      val msg = Option(err.getMessage).getOrElse("") +
        Option(err.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains(Ann.MaxDupMultiplicityKey) &&
        msg.contains("exact-dedup"), s"unhelpful refusal: $err")
    } finally spark.conf.unset(Ann.MaxDupMultiplicityKey)
  }

  test("two-level assignment never probes an empty coarse cell") {
    // fine centroids all home to coarse cell 0; coarse cell 1 is EMPTY.
    // A vector NEAREST the empty cell with coarseProbes = 1 would have
    // probed only emptiness and come back null (r17 advisory) — the
    // non-empty filter redirects its single probe to the best REACHABLE
    // cell instead, so non-null embeddings are always assigned.
    val corpus = Seq((1L, Array(0.1f, 0.9f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.1f)))
      .toDF("cell_id", "embedding")
    val coarse = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cell_id", "embedding")
    val out = Ann.assignCellsTwoLevelTopN(corpus, "vec_id", "embedding",
      cents, 1, coarse, coarseProbes = 1)
      .select($"vid", $"cell_id")
      .orderBy($"vid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((1L, Some(11L)), (2L, Some(10L))))
  }

  test("defaultCoarseProbes covers a stable fraction of the coarse set") {
    // never below the classic 8, never a smaller fraction than 1/8:
    // a fixed probe count would cover 8/67 at 20M vectors but 8/670 at
    // 2G — recall silently decaying with corpus size
    assert(Ann.defaultCoarseProbes(1) == 8)
    assert(Ann.defaultCoarseProbes(64) == 8)
    assert(Ann.defaultCoarseProbes(67) == 9)   // ceil(67/8)
    assert(Ann.defaultCoarseProbes(640) == 80)
    assert(Ann.defaultCoarseProbes(10000) == 1250)
    // semanticDedup deliberately does NOT ride the auto rule: pair
    // co-location (its recall metric) is 99.7% at the classic 8 probes,
    // and a c/8 probe count would make its routed assignment stage
    // n^1.5/8 instead of n^1.25 — paid for recall dedup doesn't need
    assert(Ann.SemDedupCoarseProbes == 8)
  }

  test("cosineNearDupPairs refuses a universe beyond maxDocs, pointing at the scale paths") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val err = intercept[IllegalArgumentException] {
      Ann.cosineNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.9, maxDocs = 100).count()
    }
    assert(err.getMessage.contains("lshNearDupPairs"))
    // a deliberately-raised bound admits the same call
    assert(Ann.cosineNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.9999, maxDocs = 1000).count() >= 0)
  }

  test("trained PQ codebook beats the seed codebook on quantization error") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val seedCb = Ann.pqCodebook(
      e.filter($"vec_id" < 16).select($"vec_id", $"embedding"),
      "vec_id", "embedding", m = 8, dim = 64)
    val trainedCb = Ann.pqTrainCodebook(e, "embedding", m = 8, dim = 64,
      codesPerSubspace = 16)
    assert(trainedCb.count() == 8 * 16)
    // mean squared quantization error over (vector, subspace): the
    // k-means codebook must beat arbitrary seed subvectors
    def qErr(cb: org.apache.spark.sql.DataFrame): Double = {
      val subDim = 8
      val sub = e.select($"vec_id".as("vid"),
        graft.functions.VectorFunctions.asDouble($"embedding").as("_v"))
        .select($"vid", explode(sequence(lit(0), lit(7))).as("j"), $"_v")
        .select($"vid", $"j", slice($"_v", $"j" * subDim + 1, lit(subDim)).as("sub"))
      val enc = Ann.pqEncode(e, "vec_id", "embedding", cb, m = 8, dim = 64)
      enc.join(cb.toDF("j", "code", "csub"), Seq("j", "code"))
        .join(sub, Seq("vid", "j"))
        .select(graft.functions.VectorFunctions.sqL2($"sub", $"csub").as("d"))
        .agg(avg($"d")).as[Double].head()
    }
    val (seedErr, trainedErr) = (qErr(seedCb), qErr(trainedCb))
    assert(trainedErr < seedErr,
      s"trained codebook MSE $trainedErr !< seed MSE $seedErr")
  }

  test("ann brute force ranks the exact duplicate first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.01f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val got = Ann.bruteForceTopK(vecs, "vec_id", "embedding", q, 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("pq operators raise on vectors whose length != dim (ADVICE r4)") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val seeds = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .filter($"vec_id" < 16).select($"vec_id", $"embedding")
    val cb = Ann.pqCodebook(seeds, "vec_id", "embedding", m = 8, dim = 64)
    val ragged = Seq((1L, Array(0.1f, 0.2f, 0.3f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Ann.pqEncode(ragged, "vec_id", "embedding", cb, m = 8, dim = 64).collect()
    }
    assert(msgs(ex).contains("pqEncode"), msgs(ex))
    val exQ = intercept[Exception] {
      Ann.pqTopK(seeds, "vec_id", "embedding", cb,
        ragged, k = 1, m = 8, dim = 64).collect()
    }
    assert(msgs(exQ).contains("pqTopK"), msgs(exQ))
  }

  test("incrementalNearDup caps hot corpus buckets; the audit reports them") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    // 5 identical corpus docs: every corpus band bucket has 5 members
    val corpus = (1L to 5L).map(i => (i, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base.replace("w30", "zz"))).toDF("doc_id", "text")
    val audit = DedupSuite.incrementalBucketTruncation(
      corpus, "doc_id", $"text", bucketCap = 3)
    assert(audit.count() > 0)
    assert(audit.filter($"bucket_size" =!= 5).count() == 0)
    // cap 3 keeps the 3 smallest ids per bucket (sorted lists, so the
    // truncation is deterministic) -> exactly 3 corpus matches survive
    val capped = DedupSuite.incrementalNearDup(corpus, batch, "doc_id",
      $"text", threshold = 0.7, bucketCap = 3)
      .filter($"origin" === "corpus")
      .select("match_id").as[Long].collect().toSet
    assert(capped == Set(1L, 2L, 3L))
    val full = DedupSuite.incrementalNearDup(corpus, batch, "doc_id",
      $"text", threshold = 0.7)
      .filter($"origin" === "corpus").count()
    assert(full == 5)
  }

  test("dedupClusters frees superseded round checkpoints (ADVICE r4)") {
    val before = spark.sparkContext.getRDDStorageInfo.length
    // chain of 5 -> >= 3 propagation rounds; without freeing, the edge
    // list + every round's labels table would all stay cached
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = DedupSuite.dedupClusters(pairs)
    assert(out.count() == 7)
    val after = spark.sparkContext.getRDDStorageInfo.length
    assert(after - before <= 1, s"cached RDDs grew $before -> $after")
  }

  test("dedupClusters reliable mode (HDFS-backed checkpoints) agrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = DedupSuite.dedupClusters(pairs, reliable = true)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }
}

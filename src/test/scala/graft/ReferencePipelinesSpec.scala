package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{MissingKeyLlmClient, MockLlmClient}
import graft.pipelines.ReferencePipelines
import graft.plans.{Pipeline, RunContext, Schedule}

class ReferencePipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-e2e").toString

  test("events-stats pipeline: interval filter + per-user counts + csv per ds") {
    val out = tmp()
    val ctx = RunContext(java.time.LocalDate.of(2024, 1, 5),
      java.time.LocalDateTime.of(2024, 1, 5, 0, 0),
      java.time.LocalDateTime.of(2024, 1, 6, 0, 0))
    val stats = ReferencePipelines.eventsStats(spark, sf(), out, ctx)
    assert(stats.count() > 0)
    assert(stats.select(countDistinct($"date")).as[Long].head() == 1L)
    val written = spark.read.option("header", "true").csv(s"$out/2024-01-05")
    assert(written.columns.toSeq == Seq("date", "user_id", "event_count"))
    assert(written.count() == stats.count())
  }

  test("binance cascade: golden csv formats match the reference headers") {
    val out = tmp()
    val points = Seq(
      ("2024-01-15 00:10:00", 68000.0), ("2024-01-15 00:20:00", 68200.0),
      ("2024-01-15 01:00:00", 68100.0), ("2024-01-15 01:30:00", 68150.0))
      .toDF("ts", "price").withColumn("ts", to_timestamp($"ts"))
    ReferencePipelines.binance(spark, points, out,
      java.time.Instant.parse("2024-01-15 23:59:59Z".replace(" ", "T")))
    val hourly = spark.read.option("header", "true").csv(s"$out/hourly")
      .orderBy("hour").collect()
    // exact reference header (sample_output_hourly_avg.csv:1)
    assert(spark.read.option("header", "true").csv(s"$out/hourly").columns.toSeq ==
      Seq("date", "hour", "avg_price", "min_price", "max_price",
        "first_price", "last_price", "data_points", "calculated_at"))
    assert(hourly(0).getAs[String]("date") == "2024-01-15")
    assert(hourly(0).getAs[String]("hour") == "00")
    assert(hourly(0).getAs[String]("avg_price") == "68100.00")
    assert(hourly(0).getAs[String]("first_price") == "68000.00")
    assert(hourly(0).getAs[String]("last_price") == "68200.00")
    val daily = spark.read.option("header", "true").csv(s"$out/daily")
    assert(daily.columns.toSeq ==
      Seq("date", "avg_price", "min_price", "max_price", "opening_price",
        "closing_price", "price_change", "price_change_pct",
        "total_data_points", "hours_with_data", "calculated_at"))
    val d = daily.head()
    assert(d.getAs[String]("opening_price") == "68000.00")
    assert(d.getAs[String]("closing_price") == "68150.00")
    assert(d.getAs[String]("price_change") == "150.00")
    assert(d.getAs[String]("total_data_points") == "4")
    assert(d.getAs[String]("hours_with_data") == "2")
  }

  test("stocksense: space-delimited scan, last-wins counts, reference W1 SQL") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/pageviews"),
      """en Google 400 0
        |en Google 451 0
        |de Google 999 0
        |en Amazon 9 0
        |en Facebook 123 0
        |""".stripMargin)
    val got = ReferencePipelines.stocksense(spark, s"$dir/pageviews",
      Seq("Google", "Amazon", "Facebook", "Apple", "Microsoft"),
      java.time.LocalDateTime.of(2024, 1, 15, 10, 0))
      .orderBy("pagename")
      .collect()
    assert(got.map(_.getAs[String]("pagename")).toSeq ==
      Seq("Amazon", "Facebook", "Google"))
    // last-wins semantics (A8): Google keeps 451, not 400 or the de row
    val google = got.find(_.getAs[String]("pagename") == "Google").get
    assert(google.getAs[Double]("average") == 451.0)
    assert(google.getAs[Int]("hr") == 10)
  }

  test("supermarket: sensor-delivered csv to promotion counts") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/promos.csv"),
      "promo_id,product_id,discount\n1,apple,0.1\n2,apple,0.2\n3,pear,0.3\n")
    val schema = StructType(Seq(StructField("promo_id", IntegerType),
      StructField("product_id", StringType), StructField("discount", DoubleType)))
    val got = ReferencePipelines.supermarket(spark, s"$dir/promos.csv", schema)
      .orderBy("product_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("apple", 2L), ("pear", 1L)))
  }

  test("rocket launches: nested results[] explode + download side-effect") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/launches.json"),
      """{"count": 2, "results": [
        |  {"name": "L1", "image": "https://example.org/a.png",
        |   "status": {"name": "Go"}},
        |  {"name": "L2", "image": "https://example.org/b.png",
        |   "status": {"name": "TBD"}},
        |  {"name": "L3", "image": null, "status": {"name": "Go"}}
        |]}""".stripMargin)
    // the download side effect lands on the shared filesystem — closures
    // are serialized to executors, so in-memory captures would mutate a copy
    val dlDir: String = java.nio.file.Files.createTempDirectory("downloads").toString
    val n = ReferencePipelines.rocketLaunchImages(spark, s"$dir/launches.json",
      url => {
        val name = java.lang.Integer.toHexString(url.hashCode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dlDir, name), url); ()
      })
    assert(n == 2)
    assert(new java.io.File(dlDir).list().length == 2)
  }

  test("gold-war ML pipeline: sentiment merge + RF accuracy") {
    val gold = (1 to 60).map { i =>
      (f"2024-01-$i%02d".take(10), 2000.0 + (i % 7) * 3 - (i % 3) * 5)
    }.map { case (d, c) => (java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays((d.takeRight(2).toInt - 1) % 28)), c)
    }.toDF("Date", "Close").dropDuplicates("Date")
    val news = Seq(
      (java.sql.Date.valueOf("2024-01-02"), "war conflict begins", "crisis attack"),
      (java.sql.Date.valueOf("2024-01-03"), "peace growth", "calm good"),
      (java.sql.Date.valueOf("2024-01-05"), "war error", "bad loss"))
      .toDF("date", "title", "summary")
    val (training, acc) = ReferencePipelines.goldWar(spark, gold, news)
    assert(training.columns.contains("sentiment_mean"))
    assert(training.filter($"news_count" > 0).count() >= 2)
    // fillna(0) semantics for no-news days (F12)
    assert(training.filter($"sentiment_mean" === 0.0).count() > 0)
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("weather-LLM: mock extraction validates the 7-key contract") {
    val out = tmp() + "/weather"
    val obs = Seq(
      (1L, "berlin", "2026-08-01", """{"temperature_2m": 21.5}"""),
      (2L, "tokyo", "2026-08-02", """{"temperature_2m": 30.1}"""))
      .toDF("obs_id", "city", "date", "payload")
    val got = ReferencePipelines.weatherLlm(spark, obs,
      () => new MockLlmClient, out).orderBy("obs_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("city_label") == "berlin")
    assert(got(1).getAs[String]("observation_date") == "2026-08-02")
    assert(got.forall(r =>
      r.getAs[Double]("temp_c_max") > r.getAs[Double]("temp_c_min")))
    // determinism: same prompt, same output
    val again = ReferencePipelines.weatherLlm(spark, obs,
      () => new MockLlmClient, tmp() + "/w2").orderBy("obs_id").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("weather-LLM fail-fast on contract violation (F10)") {
    val obs = Seq((1L, "berlin", "2026-08-01", "{}"))
      .toDF("obs_id", "city", "date", "payload")
    intercept[IllegalArgumentException] {
      ReferencePipelines.weatherLlm(spark, obs,
        () => new MissingKeyLlmClient, tmp() + "/bad")
    }
  }

  test("pipeline runner drives events-stats over a catchup range") {
    val out = tmp()
    val seen = collection.mutable.Buffer[String]()
    val p = Pipeline("events_stats", Schedule.parse("@daily"),
      start = java.time.LocalDate.of(2024, 1, 3), catchup = true)
    val stage = graft.plans.Stage("stats") { ctx =>
      ReferencePipelines.eventsStats(spark, sf(), out, ctx)
      seen += ctx.ds
    }
    p.run(Seq(stage), java.time.LocalDate.of(2024, 1, 5), _ => ())
    assert(seen.toSeq == Seq("2024-01-03", "2024-01-04", "2024-01-05"))
    assert(new java.io.File(s"$out/2024-01-04").exists())
  }
}

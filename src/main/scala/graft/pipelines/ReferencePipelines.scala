package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.{LlmClient, LlmExtract, Sentiment}
import graft.ml.RfPipeline
import graft.operators.{Cleaners, TimeSeries, Windows}
import graft.plans.RunContext
import graft.sources.{Readers, Writers}

/** The reference's pipelines re-implemented as engine programs
  * (SURVEY.md §3, §7.1 item 5). Each is a pure function from sources to a
  * written/returned result, parameterized by [[RunContext]] where the
  * original used Jinja logical dates. These double as the e2e test
  * surface.
  */
object ReferencePipelines {

  // --- §3.2 events-stats (lecture3/05..11) -------------------------------

  /** fetch → aggregate → report: half-open interval filter, per-(date,user)
    * counts, headered CSV per logical date. */
  def eventsStats(spark: SparkSession, sfDir: String, outDir: String,
                  ctx: RunContext): DataFrame = {
    val start = java.sql.Timestamp.valueOf(ctx.intervalStart)
    val end = java.sql.Timestamp.valueOf(ctx.intervalEnd)
    val stats = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit(start) && col("ts") < lit(end))
      .groupBy(to_date(col("ts")).as("date"), col("user_id"))
      .agg(count(lit(1)).as("event_count"))
    Writers.csv(stats, s"$outDir/${ctx.ds}", singleFile = true)
    stats
  }

  // --- §3.1 binance raw→hourly→daily -------------------------------------

  /** Golden hourly format (ref: lecture3/sample_output_hourly_avg.csv:1):
    * date,hour,avg_price,min_price,max_price,first_price,last_price,
    * data_points,calculated_at. */
  def hourlyGolden(hourly: DataFrame, calculatedAt: java.time.Instant): DataFrame =
    hourly.select(
      date_format(col("hour_start"), "yyyy-MM-dd").as("date"),
      date_format(col("hour_start"), "HH").as("hour"),
      fmt2(col("avg_price")).as("avg_price"),
      fmt2(col("min_price")).as("min_price"),
      fmt2(col("max_price")).as("max_price"),
      fmt2(col("first_price")).as("first_price"),
      fmt2(col("last_price")).as("last_price"),
      col("data_points"),
      lit(tsString(calculatedAt)).as("calculated_at"))

  /** Golden daily format (ref: sample_output_daily_avg.csv:1). */
  def dailyGolden(daily: DataFrame, calculatedAt: java.time.Instant): DataFrame =
    daily.select(
      date_format(col("day_start"), "yyyy-MM-dd").as("date"),
      fmt2(col("avg_price")).as("avg_price"),
      fmt2(col("min_price")).as("min_price"),
      fmt2(col("max_price")).as("max_price"),
      fmt2(col("opening_price")).as("opening_price"),
      fmt2(col("closing_price")).as("closing_price"),
      fmt2(col("price_change")).as("price_change"),
      fmt2(col("price_change_pct")).as("price_change_pct"),
      col("total_data_points"),
      col("hours_with_data"),
      lit(tsString(calculatedAt)).as("calculated_at"))

  /** The 3-DAG cascade as one program: points → date-partitioned raw →
    * hourly/daily golden CSVs. Returns (hourly, daily). */
  def binance(spark: SparkSession, points: DataFrame, outDir: String,
              calculatedAt: java.time.Instant): (DataFrame, DataFrame) = {
    val raw = points.withColumn("date", to_date(col("ts")))
    Writers.partitionedParquet(raw, s"$outDir/raw", Seq("date"))
    val hourly = TimeSeries.hourlyStats(
      spark.read.parquet(s"$outDir/raw"), col("ts"), col("price"))
    Writers.csv(hourlyGolden(hourly, calculatedAt), s"$outDir/hourly", singleFile = true)
    val daily = TimeSeries.dailyStats(hourly)
    Writers.csv(dailyGolden(daily, calculatedAt), s"$outDir/daily", singleFile = true)
    (hourly, daily)
  }

  // --- §3.3-adjacent stocksense (lecture4 + chapter04) --------------------

  /** get_data → fetch_pageviews → table → the W1 SQL: last-wins counts for
    * tracked pages, then busiest hour per page via the reference's own SQL
    * text (select_pageview_counts.sql) on a temp view. */
  def stocksense(spark: SparkSession, pageviewsPath: String, pages: Seq[String],
                 datetime: java.time.LocalDateTime): DataFrame = {
    // A8 semantics note (SURVEY.md §7.4): the reference's dict loop keeps
    // the LAST occurrence per title in file order; Spark has no row order,
    // and en-domain titles are unique per wikimedia dump, so max() is
    // equivalent on real data (divergence documented; int cast chosen per
    // lecture4/06 over listing_4_20's string).
    val counts = Readers.spaceDelimited(spark, pageviewsPath,
      Seq("domain_code", "page_title", "view_counts", "response_size"))
      .filter(col("domain_code") === "en" && col("page_title").isin(pages: _*))
      .groupBy(col("page_title").as("pagename"))
      .agg(max(col("view_counts").cast("int")).as("pageviewcount"))
      .withColumn("datetime", lit(java.sql.Timestamp.valueOf(datetime)))
    counts.createOrReplaceTempView("pageview_counts")
    // ref: Solutions/chapter04/scripts/select_pageview_counts.sql:1-11
    spark.sql(
      """SELECT pagename, hr, average
        |FROM (
        |  SELECT pagename, hour(datetime) AS hr, AVG(pageviewcount) AS average,
        |         ROW_NUMBER() OVER (PARTITION BY pagename ORDER BY AVG(pageviewcount) DESC) AS row_number
        |  FROM pageview_counts
        |  GROUP BY pagename, hour(datetime)
        |) AS x
        |WHERE row_number = 1""".stripMargin)
  }

  // --- lecture5 supermarket (A7 + T6) -------------------------------------

  /** promotions-per-product counts from delivered CSV (the FileSensor wait
    * happens in the runner via Sensors.await). */
  def supermarket(spark: SparkSession, promoCsvPath: String, schema: StructType): DataFrame =
    Readers.csv(spark, promoCsvPath, schema)
      .groupBy(col("product_id"))
      .agg(count(lit(1)).as("promotion_count"))

  // --- chapter02 rocket launches (S12) ------------------------------------

  /** nested launches JSON → explode results[] → image URL list; the
    * download step is a foreachPartition side-effect writer (X5). */
  def rocketLaunchImages(spark: SparkSession, launchesJsonPath: String,
                         download: String => Unit): Long = {
    val urls = spark.read.option("multiLine", "true").json(launchesJsonPath)
      .select(explode(col("results")).as("launch"))
      .select(col("launch.image").as("url"))
      .filter(col("url").isNotNull)
    // count with an accumulator inside the same pass — a separate
    // urls.count() would re-read and re-explode the JSON.
    val n = spark.sparkContext.longAccumulator("downloaded_urls")
    urls.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach { r => download(r.getString(0)); n.add(1L) }
    }
    n.value
  }

  // --- gold × war-news ML (§3.3) ------------------------------------------

  /** [fetch_gold, fetch_news] >> sentiment+merge >> train. Sources arrive
    * as DataFrames (fixture CSVs in tests — the reference's yfinance/RSS
    * fetches are Fetcher-pluggable). Returns (trainingData, accuracy). */
  def goldWar(spark: SparkSession, gold: DataFrame, news: DataFrame)
      : (DataFrame, Double) = {
    val cleanGold = Cleaners.normalizeColumnNames(gold)
    val scored = news
      .withColumn("text", concat_ws(" ", col("title"), col("summary")))
      .withColumn("sentiment", Sentiment.polarity(col("text")))
    val dailySentiment = scored.groupBy(col("date")).agg(
      avg(col("sentiment")).as("sentiment_mean"),
      count(lit(1)).as("news_count"))
    val training = RfPipeline.withTarget(cleanGold, "close", "date")
      .join(broadcast(dailySentiment), Seq("date"), "left")
      .na.fill(0.0, Seq("sentiment_mean")).na.fill(0L, Seq("news_count"))
      .withColumn("news_count", col("news_count").cast("double"))
    val (_, accuracy) = RfPipeline.train(
      training.select(col("close"), col("sentiment_mean"), col("news_count"), col("label")),
      Seq("close", "sentiment_mean", "news_count"))
    (training, accuracy)
  }

  // --- lecture2 tutorial1 record normalizer (X4) --------------------------

  /** X4 (ref: lecture2/tutorial1_basic_etl.py:134-163): the composite
    * clean → validate → enrich normalizer — trim strings (empty→null),
    * drop records missing id/name, stamp processed_at + record_count. */
  def tutorial1Normalize(records: DataFrame,
                         processedAt: java.time.Instant): DataFrame =
    Cleaners.enrich(
      Cleaners.requireFields(Cleaners.trimStrings(records), Seq("id", "name")),
      processedAt)

  /** The intended demo2 CSV→JSON ETL (ref: tutorial1_basic_etl.py:242-305):
    * headered CSV (values stay strings — csv.DictReader semantics) →
    * trim / require id / lowercase keys → processed_at + record_count.
    *
    * Parity note: the reference's shipped demo2_output_products.json does
    * NOT contain this transform's output. Its transform_csv task
    * xcom-pulls from task_ids='extract' — the demo1 JSON extract in the
    * same DAG — so the artifact it wrote is the transformed demo1 USER
    * records. GoldenParitySpec byte-matches that artifact through the
    * cross-wired input and checks the intended CSV path against literal
    * expectations here. */
  def tutorial1CsvProducts(spark: SparkSession, csvPath: String,
                           processedAt: java.time.Instant): DataFrame =
    Cleaners.enrich(
      Cleaners.requireFields(
        Cleaners.trimStrings(Cleaners.normalizeColumnNames(
          Readers.csvRaw(spark, csvPath))), Seq("id")),
      processedAt)

  // --- lecture11 weather-LLM (X2) -----------------------------------------

  /** Open-Meteo payload rows → prompt → LLM structured extraction →
    * validated 7-key table → CSV. */
  def weatherLlm(spark: SparkSession, observations: DataFrame,
                 clientFactory: () => LlmClient, outDir: String): DataFrame = {
    val prompts = observations.withColumn("prompt",
      concat_ws(";",
        concat(lit("city="), col("city")),
        concat(lit("date="), col("date")),
        concat(lit("payload="), col("payload"))))
    val extracted = LlmExtract.extract(prompts, "obs_id", "prompt",
      clientFactory, LlmExtract.weatherSchema, LlmExtract.weatherSystemPrompt)
    Writers.csv(extracted, outDir, singleFile = true)
    extracted
  }

  private def fmt2(c: Column): Column = format_string("%.2f", c)
  private def tsString(i: java.time.Instant): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(i)
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.core.GraftSession
import graft.streaming.Streams

/** Streaming state-size smoke (round-7): drives `trendingTerms` and
  * `attributionJoin` with ~20M event-time-ordered rows through a file
  * source (slices land sequentially, each `processAllAvailable` is one
  * deterministic micro-batch wave) and records PEAK state rows against
  * the watermark bound — the evidence that state stays bounded by the
  * watermark horizon, not by stream length.
  *
  * Both shapes also carry planted-recovery checks (exact token totals
  * behind the final emitted window; exact 90% attribution match rate),
  * so the run proves correctness at scale, not just survival.
  *
  * Usage: SPARK_GRAFT_SMOKE_ROWS=20000000 sbt "runMain graft.ScaleSmokeStreaming"
  */
object ScaleSmokeStreaming {

  private var failures = 0
  private def check(name: String, cond: Boolean, detail: => String): Unit =
    if (cond) println(s"SCALE CHECK ok: $name ($detail)")
    else { failures += 1; println(s"SCALE CHECK FAIL: $name ($detail)") }

  private def peakState(q: StreamingQuery): Long =
    q.recentProgress.map(p => p.stateOperators.map(_.numRowsTotal).sum)
      .foldLeft(0L)(math.max)

  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-streaming", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = graft.core.TempDirs.create("graft-scale-s")
    val epoch0 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond

    // ---- trendingTerms: 20 slices × 10 min of event time ----------------
    // 8 same-vocab tokens per doc; 30-word vocab (all len ≥ 3, so the
    // minTokenLen filter drops nothing and counts stay exact).
    val vocab = typedLit((0 until 30).map(i => f"term$i%02d"))
    val slices = 20
    val docsPerSlice = math.max(1000L, target / 8L / slices)
    def docSlice(s: Int): DataFrame =
      spark.range(docsPerSlice).select(
        timestamp_seconds(lit(epoch0) + lit(s * 600L) + pmod(col("id"), lit(600L))).as("ts"),
        concat_ws(" ", transform(sequence(lit(0), lit(7)), p =>
          element_at(vocab, (pmod(col("id") * 8 + p, lit(30L)) + 1).cast("int")))).as("text"))
    val docDir = s"$base/docs"
    docSlice(0).limit(0).write.parquet(docDir) // seed schema for the file source
    val docSchema = spark.read.parquet(docDir).schema
    val trendsQ = Streams.trendingTerms(
        spark.readStream.schema(docSchema).parquet(docDir), "ts", "text",
        window_ = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("trends")
      .option("checkpointLocation", s"$base/ckpt-trends").outputMode("append").start()
    var peakTrends = 0L
    val t0 = System.nanoTime()
    (0 until slices).foreach { s =>
      docSlice(s).write.mode("append").parquet(docDir)
      trendsQ.processAllAvailable()
      peakTrends = math.max(peakTrends, peakState(trendsQ))
    }
    trendsQ.processAllAvailable() // no-data batch: emit windows behind watermark
    peakTrends = math.max(peakTrends, peakState(trendsQ))
    trendsQ.stop()
    val nDocs = slices * docsPerSlice
    println(f"SCALE trendingTerms: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"($nDocs docs, ${nDocs * 8} tokens, peak state rows = $peakTrends)")
    val sink = spark.table("trends").cache()
    val emitted = sink.agg(coalesce(sum(col("n")), lit(0L)),
      coalesce(max(col("window_start").cast("long")), lit(0L))).collect()(0)
    val (tokSum, lastWinStart) = (emitted.getLong(0), emitted.getLong(1))
    // exact recovery: every token behind the final emitted window arrived
    // exactly once in the sink totals
    val expectedToks = 8L * (0 until slices).map(docSlice)
      .reduce(_.unionByName(_))
      .filter(col("ts").cast("long") < lastWinStart + 60).count()
    check("trendingTerms emitted exactly the planted token totals",
      tokSum == expectedToks, s"sink=$tokSum expected=$expectedToks")
    // bound: vocab × (slice span + watermark + margin) windows, NOT the
    // run's 200 windows × 30 = 6000 unbounded state rows
    val trendBound = 30L * (10 + 2 + 4)
    check("trendingTerms state bounded by watermark horizon",
      peakTrends > 0 && peakTrends <= trendBound,
      s"peak=$peakTrends bound=$trendBound unbounded=${slices * 10 * 30}")
    sink.unpersist()

    // ---- attributionJoin: 10 slices × 1 hour of event time --------------
    // Every user id occurs ONCE (view at t, purchase at t+5min); users
    // with id%10==9 get no view → planted match rate is exactly 90%.
    val jSlices = 10
    val usersPerSlice = math.max(1000L, target / 2L / jSlices)
    def viewSlice(s: Int): DataFrame =
      spark.range(usersPerSlice)
        .select((lit(s * usersPerSlice) + col("id")).as("user_id"),
          timestamp_seconds(lit(epoch0) + lit(s * 3600L) +
            pmod(col("id"), lit(3000L))).as("view_ts"),
          concat(lit("v"), col("id")).as("creative"))
        .filter(pmod(col("user_id"), lit(10L)) =!= 9)
    def purchaseSlice(s: Int): DataFrame =
      spark.range(usersPerSlice)
        .select((lit(s * usersPerSlice) + col("id")).as("user_id"),
          timestamp_seconds(lit(epoch0) + lit(s * 3600L) +
            pmod(col("id"), lit(3000L)) + 300L).as("buy_ts"))
    val (viewDir, buyDir) = (s"$base/views", s"$base/buys")
    viewSlice(0).limit(0).write.parquet(viewDir)
    purchaseSlice(0).limit(0).write.parquet(buyDir)
    val joined = Streams.attributionJoin(
      spark.readStream.schema(spark.read.parquet(buyDir).schema).parquet(buyDir),
      spark.readStream.schema(spark.read.parquet(viewDir).schema).parquet(viewDir),
      "user_id", "buy_ts", "view_ts", Seq("creative"),
      horizon = "30 minutes", watermark = "1 hour")
    val joinQ = joined.writeStream.format("memory").queryName("attrib")
      .option("checkpointLocation", s"$base/ckpt-attrib").outputMode("append").start()
    var peakJoin = 0L
    val t1 = System.nanoTime()
    (0 until jSlices).foreach { s =>
      viewSlice(s).write.mode("append").parquet(viewDir)
      purchaseSlice(s).write.mode("append").parquet(buyDir)
      joinQ.processAllAvailable()
      peakJoin = math.max(peakJoin, peakState(joinQ))
    }
    joinQ.processAllAvailable()
    peakJoin = math.max(peakJoin, peakState(joinQ))
    joinQ.stop()
    val totalRows = jSlices * usersPerSlice * 19L / 10L
    println(f"SCALE attributionJoin: ${(System.nanoTime() - t1) / 1e9}%.1f s " +
      f"($totalRows input rows, peak state rows = $peakJoin)")
    val matches = spark.table("attrib").count()
    check("attributionJoin recovers exactly the planted 90% match rate",
      matches == jSlices * usersPerSlice * 9L / 10L,
      s"matches=$matches expected=${jSlices * usersPerSlice * 9L / 10L}")
    // bound: both sides buffer ≲ watermark(1h) + horizon(30m) of input =
    // at most ~2 slices of rows, NOT the 10-slice run
    val joinBound = 3L * usersPerSlice * 19L / 10L
    check("attributionJoin state bounded by watermark+horizon",
      peakJoin > 0 && peakJoin <= joinBound,
      s"peak=$peakJoin bound=$joinBound total=$totalRows")

    println(if (failures == 0) "SCALE streaming: ALL CHECKS PASSED"
    else s"SCALE streaming: $failures CHECK(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

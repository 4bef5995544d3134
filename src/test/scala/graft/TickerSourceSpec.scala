package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

class TickerSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ticker(totalRows: Long, rowsPerBatch: Long = 60) =
    spark.readStream.format("graft.sources.v2.TickerTableProvider")
      .option("rowsperbatch", rowsPerBatch)
      .option("totalrows", totalRows)
      .option("startepochms", 1704067200000L)
      .option("intervalms", 60000L)
      .load()

  test("custom DSv2 micro-batch source streams deterministic ticks") {
    val q = ticker(totalRows = 180).writeStream
      .format("memory").queryName("ticks").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ticks")
    assert(rows.count() == 180)
    assert(rows.select(countDistinct($"ts")).as[Long].head() == 180)
    // deterministic: a second run yields identical content
    val q2 = ticker(totalRows = 180).writeStream
      .format("memory").queryName("ticks2").outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    val d1 = spark.table("ticks").agg(expr("bit_xor(xxhash64(ts, price))")).as[Long].head()
    val d2 = spark.table("ticks2").agg(expr("bit_xor(xxhash64(ts, price))")).as[Long].head()
    assert(d1 == d2)
  }

  test("ticker feeds the windowed-stats cascade end to end (T1 -> T2)") {
    val agg = Streams.windowedStats(ticker(totalRows = 240), "ts", "price",
      "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("tick_hourly")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val hourly = spark.table("tick_hourly").orderBy("window_start")
    // 240 minute-ticks = 4 hours; append mode emits watermark-closed windows
    val rows = hourly.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("data_points") == 60L))
    assert(rows.forall { r =>
      val min = r.getAs[Double]("min_price"); val max = r.getAs[Double]("max_price")
      min >= 90.0 && max <= 110.0 && min <= max
    })
  }
}

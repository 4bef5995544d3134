package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Table registry over the driver testdata layout: one parquet per table
  * under a scale-factor directory (/root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's column pruning
  * and parquet filter pushdown apply; callers `.select`/`.filter` early and
  * the scan narrows (check `PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 cannot read natively. We read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession/Verify) and
    * truncate to microseconds — the same truncation DuckDB applies when it
    * casts TIMESTAMP_NS to TIMESTAMP, keeping oracle parity. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw
    }
  }

  /** Register every testdata table as a temp view so `spark.sql` works
    * against the star schema directly (the engine's SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** Per-(session, file) schema memo ([[SchemaMemo]], shared with
    * ManifestTable's generation memo — one bound, one keying rule): the
    * testdata files are immutable, yet `spark.read.parquet` re-infers
    * the schema — a footer-reading Spark job plus a hadoop-conf
    * broadcast — on EVERY DataFrame construction, and the bench
    * re-invokes each query builder per rep (~20-60 ms × tables ×
    * queries × reps of pure metadata re-derivation, measured r20). A
    * hit passes the memoized schema explicitly, which skips inference
    * entirely; only schema METADATA is cached — every action still
    * scans the parquet bytes. */
  private def readMemo(spark: SparkSession, path: String): DataFrame = {
    val cached = SchemaMemo.get(spark, path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      SchemaMemo.put(spark, path, df.schema)
      df
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else normalizeNtz(readMemo(spark, s"$dir/$name.parquet"))

  /** Driver-generated parquet writes TIMESTAMP(MICROS) without the
    * isAdjustedToUTC flag, which Spark 4 surfaces as TIMESTAMP_NTZ — but the
    * DuckDB oracle reads the same files as plain TIMESTAMP, and several
    * engine functions (`unix_micros`, `unix_millis`) reject NTZ input at
    * analysis time. The session TZ is pinned to UTC, so casting NTZ→LTZ is a
    * wall-clock identity; normalize at the registry seam so every query sees
    * one timestamp posture regardless of testdata-generation drift. */
  private def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.fields.collect { case f if f.dataType == TimestampNTZType => f.name }
      .foldLeft(df)((d, c) => d.withColumn(c, d(c).cast("timestamp")))

  /** The events table's `ts` encoding has drifted across testdata
    * generations; absorb every variant here so queries always see a plain
    * session-TZ TIMESTAMP:
    *
    *   - TIMESTAMP(NANOS): Spark 4 cannot read natively — read nanos as long
    *     (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession/Verify)
    *     and truncate to micros, the same truncation DuckDB applies casting
    *     TIMESTAMP_NS to TIMESTAMP, keeping oracle parity.
    *   - TIMESTAMP(MICROS) without isAdjustedToUTC: Spark reads
    *     TIMESTAMP_NTZ — cast to TIMESTAMP. The session TZ is pinned to UTC,
    *     so the NTZ→LTZ cast is a wall-clock identity and DuckDB (which reads
    *     the same file as plain TIMESTAMP) stays in parity.
    *   - TIMESTAMP(MICROS) adjusted to UTC: already TimestampType, pass
    *     through. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readMemo(spark, s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => normalizeNtz(raw)
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

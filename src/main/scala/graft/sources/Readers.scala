package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY.md §2.1): schema-explicit readers with the
  * reference's validation modes, plus the text formats the reference parses
  * by hand.
  *
  * All readers return lazy DataFrames backed by Spark file sources, so
  * column pruning / filter pushdown / partition pruning apply; none of the
  * reference's line-by-line driver loops survive.
  */
object Readers {

  /** S1 (ref: tutorial1_basic_etl.py:94-102): JSON records file. multiLine
    * handles pretty-printed fixtures; explicit schema avoids an extra
    * inference pass over 100 TB. */
  def json(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema).option("multiLine", multiLine).json(path)

  /** S2 (ref: tutorial1:263-268): headered CSV, all strings (caller casts). */
  def csvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** S3 (ref: tutorial2_data_ingestion.py:146-159): CSV with type coercion.
    * dropMalformed=true reproduces the reference's skip-bad-rows-with-
    * warning; false keeps them as nulls in `_corrupt_record`.
    *
    * Caveat: DROPMALFORMED only drops rows whose columns are materialized —
    * a count-only plan skips parsing and sees every line. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          dropMalformed: Boolean = true): DataFrame = {
    val mode = if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE"
    spark.read.option("header", "true").option("mode", mode)
      .schema(schema).csv(path)
  }

  /** S11 (ref: lecture4/06_stocksense_complete.py:38-50): space-delimited
    * text (wikipageviews `domain page count size`). Reads .gz transparently
    * (S10 gunzip stage is dropped — Spark decompresses on scan). */
  def spaceDelimited(spark: SparkSession, path: String,
                     colNames: Seq[String]): DataFrame = {
    val parts = split(col("value"), " ")
    val cols = colNames.zipWithIndex.map { case (n, i) => parts.getItem(i).as(n) }
    spark.read.text(path).select(cols.toIndexedSeq: _*)
  }

  /** S16 (ref: download_rocket_launches.py:25-44 read side): binary files
    * (images/audio/video) as opaque content + metadata. */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** S18: JDBC scan with partitioned parallel read — the scan splits into
    * `numPartitions` range queries on `partitionColumn` so a 100 TB-adjacent
    * dimension load doesn't serialize through one connection. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties,
           partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((c, lo, hi, n)) => spark.read.jdbc(url, table, c, lo, hi, n, props)
      case None                 => spark.read.jdbc(url, table, props)
    }
}

/** S6-S9/S13-S15: the reference's HTTP-ish sources re-expressed as a
  * pluggable fetcher. The production implementation is [[HttpFetcher]]
  * (java.net.http with the reference's timeout + retries=3 schedule);
  * tests and the zero-egress environment use fixtures or scripted
  * transports. Mirrors the reference's own mock-mode precedent
  * (weather_ollama_dag.py:59-70). */
trait Fetcher extends Serializable {
  /** Fetch one logical page/payload; returns raw text (JSON/CSV body).
    * Serializable so fetchers ride executor-side closures
    * ([[HttpSources.paginatedParallel]]'s distributed backfill). */
  def fetch(params: Map[String, String]): String
}

final class FixtureFetcher(payloads: Map[String, String], keyParam: String = "key")
    extends Fetcher {
  def fetch(params: Map[String, String]): String =
    payloads(params(keyParam))
}

object HttpSources {

  /** S6 (ref: 12_binance_fetch_minute.py:35-51): single-payload JSON poll →
    * 1-row DataFrame with fetch timestamp enrichment. */
  def pollJson(spark: SparkSession, fetcher: Fetcher, params: Map[String, String],
               schema: StructType, fetchedAt: java.time.Instant): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(Seq(fetcher.fetch(params)).toDS())
      .withColumn("fetched_at", lit(java.sql.Timestamp.from(fetchedAt)))
  }

  /** S7 (ref: 15_binance_backfill_last_month.py:29-55): paginated range
    * fetch — driver iterates pages until exhausted (the reference's
    * while-loop), each page parsed distributed, batches unioned lazily. */
  def paginated(spark: SparkSession, fetcher: Fetcher, schema: StructType,
                pages: Iterator[Map[String, String]]): DataFrame = {
    import spark.implicits._
    val dfs = pages.map { p =>
      spark.read.schema(schema).json(Seq(fetcher.fetch(p)).toDS())
    }.toSeq
    dfs.reduceOption(_.unionByName(_)).getOrElse(spark.emptyDataFrame)
  }

  /** S7 at scale: the DISTRIBUTED backfill. [[paginated]] is faithful to
    * the reference's driver while-loop — correct, but a month-long
    * minute-granularity backfill is thousands of sequential round trips
    * through one machine. When the page parameter list is enumerable up
    * front (offset/date ranges — the reference's own shape), the pages
    * parallelize over executors instead: each task fetches its slice of
    * pages through the same [[Fetcher]] seam and emits raw payloads,
    * which parse distributed exactly as before. Results are identical to
    * [[paginated]] over the same pages (parity-spec'd).
    *
    * `maxConcurrency` bounds simultaneous fetch tasks — the politeness
    * knob: on a 1000-executor cluster an unbounded fan-out against one
    * API is a denial-of-service, not a backfill. Each task fetches its
    * pages sequentially, so total in-flight requests ≤ maxConcurrency,
    * and per-page retry/backoff stays inside the fetcher
    * ([[HttpFetcher]]'s schedule) exactly as in the serial path.
    *
    * Lazy like every Spark source: each ACTION (and each extra pass a
    * plan needs — a range sort's sampling, a multi-stage consumer)
    * re-invokes the fetches. A backfill's natural shape is one pass
    * straight into a sink (`ManifestTable.write` / parquet); persist
    * the frame first if you must consume it repeatedly. */
  def paginatedParallel(spark: SparkSession, fetcher: Fetcher, schema: StructType,
                        pages: Seq[Map[String, String]],
                        maxConcurrency: Int = 16): DataFrame = {
    require(maxConcurrency >= 1,
      s"paginatedParallel: maxConcurrency must be >= 1, got $maxConcurrency")
    if (pages.isEmpty) return spark.emptyDataFrame
    import org.apache.spark.sql.Encoders
    val slices = math.min(maxConcurrency, pages.size)
    val payloads = spark.createDataset(
      spark.sparkContext.parallelize(pages, slices)
        .map(fetcher.fetch))(Encoders.STRING)
    spark.read.schema(schema).json(payloads)
  }
}

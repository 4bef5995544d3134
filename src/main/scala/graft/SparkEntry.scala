package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by [[QueryPack]]s (one per operator family);
  * this object is the merged registry the verify/bench drivers consume.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    FilterScalarQueries,
    AggWindowQueries,
    TrainingDataQueries,
    CurationQueries,
    CorpusStatsQueries,
    BenchQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    queries("q1_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}

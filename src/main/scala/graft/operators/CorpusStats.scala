package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TextNative

/** Corpus-level text statistics for training-data curation: top n-grams,
  * token document frequency, and per-slice vocabulary measures.
  *
  * Scale posture: every operator is explode → partial-aggregated groupBy
  * on small keys (an n-gram string / a token / a slice key) — the classic
  * word-count shape that map-side combine keeps linear in corpus size and
  * immune to hot tokens ("the" is pre-summed inside each partition before
  * it ever shuffles). Top-k finishes with orderBy+limit, which Spark
  * plans as TakeOrderedAndProject (per-partition heaps + driver merge of
  * k rows), never a global sort of the full aggregate.
  */
object CorpusStats {

  /** Top-`k` word n-grams across the corpus with occurrence and
    * containing-document counts — the inter-document repetition profile
    * (boilerplate n-grams float to the top of a crawl corpus).
    * Deterministic ties: (count desc, ngram asc). */
  def topNgrams(docs: DataFrame, id: String, text: Column,
                n: Int = 2, k: Int = 25): DataFrame = {
    val s = docs.sparkSession
    docs
      .select(col(id).as("_id"),
        explode(TextNative.chunks(s, text, n, 1)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Token document frequency: for the `k` most document-frequent tokens,
    * (token, df, df_ratio). Tokens are deduplicated WITHIN each document
    * before the explode (array_distinct in the same projection), so the
    * shuffle carries one row per (doc, distinct token) and the aggregate
    * is a plain count — no (token, doc)-grained distinct aggregation.
    * The corpus total rides in on a broadcast single-row count. */
  def docFrequency(docs: DataFrame, id: String, text: Column,
                   k: Int = 25): DataFrame = {
    val s = docs.sparkSession
    val df = docs
      .select(explode(array_distinct(TextNative.tokens(s, text))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    df.crossJoin(broadcast(total))
      .select(col("token"), col("df"),
        (col("df").cast("double") / col("n_total").cast("double")).as("df_ratio"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)
  }

  /** Per-slice vocabulary measures: document count, token mass, distinct
    * vocabulary, and type-token ratio for every combination of the
    * `slices` columns (e.g. lang × source). Spark plans the mixed
    * count/countDistinct as a two-phase expand aggregate with map-side
    * partials, so a dominant slice ("en", the norm) never funnels raw
    * token rows to one reducer. */
  def vocabStats(docs: DataFrame, id: String, text: Column,
                 slices: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    docs
      .select(col(id).as("_id") +: slices.map(col) :+
        explode(TextNative.tokens(s, text)).as("token"): _*)
      .groupBy(slices.map(col): _*)
      .agg(
        countDistinct(col("_id")).as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct(col("token")).as("distinct_tokens"))
      .withColumn("type_token_ratio",
        col("distinct_tokens").cast("double") / col("total_tokens").cast("double"))
  }
}

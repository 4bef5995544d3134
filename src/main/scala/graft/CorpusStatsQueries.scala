package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{CorpusStats, Relevance, Sampling}

/** Corpus-statistics queries over the `documents` table: top n-grams,
  * token document frequency, and per-slice vocabulary measures — the
  * corpus-profiling tier of a training-data pipeline (what boilerplate
  * dominates, which tokens are ubiquitous, how slice vocabulary differs).
  *
  * All three are fully oracle-checked: tokenization is the shared
  * portable contract (maximal [a-z0-9] runs of the lowercased text,
  * reproduced by `toksSql` in DuckDB), counts are engine longs, and
  * ratios are raw double quotients (never rounded).
  */
object CorpusStatsQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_top_ngrams" -> ((s, d) =>
      // the inter-document repetition profile: top-25 word bigrams by
      // occurrence with containing-doc counts
      CorpusStats.topNgrams(docs(s, d), "doc_id", col("text"), n = 2, k = 25)),
    "t_doc_frequency" -> ((s, d) =>
      // stopword discovery: the 25 most document-frequent tokens
      CorpusStats.docFrequency(docs(s, d), "doc_id", col("text"), k = 25)),
    "t_vocab_stats" -> ((s, d) =>
      // per (lang x source) slice: doc count, token mass, vocabulary,
      // type-token ratio
      CorpusStats.vocabStats(docs(s, d), "doc_id", col("text"),
        Seq("lang", "source"))),
    "t_bm25" -> ((s, d) =>
      // topic retrieval: top-25 docs by BM25 for a 3-term query.
      // rational idf mode — ln() is not bit-reproducible across engines
      // (see Relevance scaladoc); the default lucene mode is spec-checked.
      Relevance.bm25TopK(docs(s, d), "doc_id", col("text"),
        Seq("spark", "join", "vector"), idfMode = "rational")),
    "t_inverted_index" -> ((s, d) =>
      // retrieval index build: per token, df / total tf / top-100
      // posting list (tf desc, id asc), hot tokens salt-capped.
      CorpusStats.invertedIndex(docs(s, d), "doc_id", col("text"),
        maxPostings = 100, saltBuckets = 16)),
    "s_weighted" -> ((s, d) =>
      // exactly-200 PPS sample by document length, 8 hash-shards.
      Sampling.systematicWeightedSample(docs(s, d), col("doc_id"),
        col("n_chars"), n = 200, shards = 8)
        .select(col("doc_id"), col("n_chars"), col("n_picks"))),
    "t_bigram_lm" -> ((s, d) =>
      // the perplexity-filter step: per-doc smoothed bigram LM score +
      // novelty ratio against a model trained on the corpus itself —
      // pinned on the EXPLICIT exact mode (minCount = 1, every bigram in
      // the model); the engine default is the scale-safe floored model
      CorpusStats.bigramLmQuality(docs(s, d), "doc_id", col("text"),
        minCount = 1L)),
    "t_lm_floor" -> ((s, d) =>
      // the 100 TB posture: the model keeps only bigrams with corpus
      // count >= 3 (zipf head — orders of magnitude smaller, broadcast
      // at any scale); below-floor bigrams score as unseen under the
      // same smoothing
      CorpusStats.bigramLmQuality(docs(s, d), "doc_id", col("text"),
        minCount = 3L))
  )

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  val oracle: Map[String, String] = Map(
    "t_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS ngram
         |      FROM t)
         |SELECT ngram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
         |FROM g GROUP BY 1
         |ORDER BY n_occurrences DESC, ngram ASC LIMIT 25""".stripMargin,
    "t_doc_frequency" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT DISTINCT doc_id, token
         |      FROM (SELECT doc_id, unnest(toks) AS token FROM t)),
         |f AS (SELECT token, COUNT(*) AS df FROM d GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_total FROM documents)
         |SELECT token, df, CAST(df AS DOUBLE) / CAST(n_total AS DOUBLE) AS df_ratio
         |FROM f, n
         |ORDER BY df DESC, token ASC LIMIT 25""".stripMargin,
    "t_vocab_stats" ->
      s"""WITH t AS (SELECT doc_id, lang, source, unnest($toksSql) AS token
         |           FROM documents)
         |SELECT lang, source,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  COUNT(*) AS total_tokens,
         |  COUNT(DISTINCT token) AS distinct_tokens,
         |  CAST(COUNT(DISTINCT token) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS type_token_ratio
         |FROM t GROUP BY 1, 2""".stripMargin,
    // mirrors Relevance.bm25TopK term by term: same expression tree, same
    // fixed left-to-right contribution order, rational idf (no ln)
    "t_bm25" -> {
      val terms = Seq("spark", "join", "vector")
      val avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
      val norm = s"1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / $avgdl))"
      def idf(i: Int) =
        s"(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / " +
          s"(CAST(df_$i AS DOUBLE) + 0.5))"
      val contribs = terms.indices.map(i =>
        s"(CASE WHEN tf_$i IS NULL THEN 0.0 ELSE ${idf(i)} * " +
          s"((CAST(tf_$i AS DOUBLE) * (1.2 + 1.0)) / " +
          s"(CAST(tf_$i AS DOUBLE) + $norm)) END)")
      val score = contribs.reduceLeft((a, b) => s"($a + $b)")
      val matched = terms.indices
        .map(i => s"(CASE WHEN tf_$i IS NULL THEN 0 ELSE 1 END)")
        .reduceLeft((a, b) => s"($a + $b)")
      val inList = terms.map(t => s"'$t'").mkString(", ")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"MAX(CASE WHEN tok = '$t' THEN tf END) AS tf_$i" }.mkString(",\n  ")
      val dfCols = terms.zipWithIndex.map { case (t, i) =>
        s"COALESCE(MAX(CASE WHEN tok = '$t' THEN df END), 0) AS df_$i" }
        .mkString(",\n  ")
      s"""WITH b AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl, $toksSql AS toks
         |  FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM b),
         |tokr AS (SELECT doc_id, dl, unnest(toks) AS tok FROM b),
         |tf AS (SELECT doc_id, dl, tok, COUNT(*) AS tf FROM tokr
         |       WHERE tok IN ($inList) GROUP BY 1, 2, 3),
         |dfr AS (SELECT
         |  $dfCols
         |  FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1)),
         |wide AS (SELECT doc_id, dl,
         |  $tfCols
         |  FROM tf GROUP BY 1, 2)
         |SELECT doc_id, CAST($matched AS BIGINT) AS n_matched, dl,
         |  $score AS score
         |FROM wide, dfr, stats
         |ORDER BY score DESC, doc_id ASC LIMIT 25""".stripMargin
    },
    "t_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |agg AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
         |  list_slice(list(CAST(doc_id AS VARCHAR) ORDER BY tf DESC, doc_id ASC),
         |             1, 100) AS post
         |  FROM tf GROUP BY 1)
         |SELECT token, df, total_tf,
         |  array_to_string(post, ',') AS postings,
         |  df > 100 AS truncated
         |FROM agg""".stripMargin,
    // mirrors Sampling.systematicWeightedSample: shard by the 60-bit
    // md5-prefix bucket, order by (md5 hex, id, weight) inside the shard,
    // exact DECIMAL running weights, n/shards half-stride-centered picks
    "s_weighted" ->
      s"""WITH b AS (
         |  SELECT doc_id, n_chars,
         |    md5(CAST(doc_id AS VARCHAR)) AS h,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8) AS shard,
         |    CAST(n_chars AS DECIMAL(27,6)) AS w
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_chars, w, shard,
         |    SUM(w) OVER (PARTITION BY shard ORDER BY h, doc_id, w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(w) OVER (PARTITION BY shard) AS tot
         |  FROM b),
         |p AS (
         |  SELECT doc_id, n_chars,
         |    CAST(FLOOR(CAST(cum AS DOUBLE) / (CAST(tot AS DOUBLE) / 25.0) - 0.5)
         |       - FLOOR(CAST(cum - w AS DOUBLE) / (CAST(tot AS DOUBLE) / 25.0) - 0.5)
         |      AS BIGINT) AS n_picks
         |  FROM c)
         |SELECT doc_id, n_chars, n_picks FROM p WHERE n_picks > 0""".stripMargin,
    // mirrors CorpusStats.bigramLmQuality term by term: add-half
    // smoothing over the corpus-constant denominator keeps Σ(2c₂+1)
    // an exact integer; the division chain is spelled with the same
    // left-associative parenthesization Spark evaluates
    "t_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bigram
         |      FROM t),
         |c2 AS (SELECT bigram, COUNT(*) AS c2 FROM g GROUP BY 1),
         |consts AS (
         |  SELECT (SELECT COUNT(DISTINCT token)
         |          FROM (SELECT unnest(toks) AS token FROM t)) AS vsize,
         |         (SELECT COUNT(*) FROM g) AS n2),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |    SUM(c2.c2 * 2 + 1) AS sum_num,
         |    SUM(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS n_unique
         |  FROM g JOIN c2 USING (bigram) GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  (CAST(sum_num AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         |    / CAST(n2 * 2 + vsize * vsize AS DOUBLE) AS lm_score,
         |  CAST(n_unique AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS novelty_ratio
         |FROM agg CROSS JOIN consts""".stripMargin,
    // the floored model: LEFT join against the c2 >= 3 head, unseen
    // bigrams take numerator 1 (coalesce(c2, 0) * 2 + 1); novelty counts
    // occurrences with effective count <= 1. tf-grained like the engine.
    "t_lm_floor" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bigram
         |      FROM t),
         |tf AS (SELECT doc_id, bigram, COUNT(*) AS tf FROM g GROUP BY 1, 2),
         |c2 AS (SELECT bigram, SUM(tf) AS c2 FROM tf GROUP BY 1 HAVING SUM(tf) >= 3),
         |consts AS (
         |  SELECT (SELECT COUNT(DISTINCT token)
         |          FROM (SELECT unnest(toks) AS token FROM t)) AS vsize,
         |         (SELECT COUNT(*) FROM g) AS n2),
         |agg AS (
         |  -- CAST: DuckDB SUM(int) is HUGEINT, Spark's is BIGINT
         |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         |    SUM(tf * (COALESCE(c2.c2, 0) * 2 + 1)) AS sum_num,
         |    SUM(CASE WHEN COALESCE(c2.c2, 0) <= 1 THEN tf ELSE 0 END) AS n_unique
         |  FROM tf LEFT JOIN c2 USING (bigram) GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  (CAST(sum_num AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         |    / CAST(n2 * 2 + vsize * vsize AS DOUBLE) AS lm_score,
         |  CAST(n_unique AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS novelty_ratio
         |FROM agg CROSS JOIN consts""".stripMargin
  )
}

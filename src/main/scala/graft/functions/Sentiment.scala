package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexicon-based sentiment polarity (SURVEY.md §2.12 X1; ref:
  * Solutions/gold_war_etl_dag.py:134-139 applies TextBlob polarity per row).
  *
  * Re-expressed as a pure Catalyst projection: tokenize, sum AFINN-style
  * word valences, normalize by token count to [-1, 1]. No UDF — a map
  * literal + `aggregate` keeps this inside codegen, which matters when the
  * scorer runs over billions of documents.
  */
object Sentiment {

  /** Small AFINN-style valence lexicon (public-domain scoring scheme);
    * includes the engine-domain words that occur in the synthetic
    * `documents` fixture so the operator is exercised end-to-end. */
  val lexicon: Map[String, Double] = Map(
    "good" -> 3.0, "great" -> 3.0, "excellent" -> 4.0, "win" -> 2.0,
    "peace" -> 2.0, "growth" -> 2.0, "calm" -> 1.0, "fast" -> 2.0,
    "bad" -> -3.0, "terrible" -> -4.0, "war" -> -3.0, "conflict" -> -2.0,
    "crisis" -> -3.0, "attack" -> -3.0, "loss" -> -2.0, "slow" -> -2.0,
    "error" -> -3.0, "big" -> 1.0, "small" -> -1.0)

  /** Polarity in [-1,1]: mean valence per token, null/blank text → 0.0
    * (matches the reference's null guard). NOT rounded: integer-valued
    * valence sums divided by (n*4) are bit-identical across engines,
    * while round-half of dyadic ratios is not. */
  def polarity(text: Column): Column = {
    val toks = TextFunctions.tokens(coalesce(text, lit("")))
    val score = aggregate(toks, lit(0.0), (acc, t) => acc + wordValence(t))
    when(size(toks) > 0, score / (size(toks) * 4.0)).otherwise(lit(0.0))
  }

  /** Per-word valence as a chained CASE (codegen-friendly; lexicon is tiny). */
  private def wordValence(t: Column): Column =
    lexicon.foldLeft(lit(0.0)) { case (acc, (w, v)) =>
      when(t === w, lit(v)).otherwise(acc)
    }
}

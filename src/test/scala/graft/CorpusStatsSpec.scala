package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Relevance}

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat", "en", "src0"),
    (2L, "the cat ran", "en", "src0"),
    (3L, "the dog sat on the mat", "en", "src1"),
    (4L, "ein hund", "de", "src0"),
    (5L, "", "en", "src1")
  ).toDF("doc_id", "text", "lang", "source")

  test("topNgrams counts bigram occurrences and containing docs") {
    val got = CorpusStats.topNgrams(docs, "doc_id", col("text"), n = 2, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // "the cat": docs 1,2 (2 occ); "the mat"/"on the"/"sat on": docs 1,3;
    // ties break ngram-ascending
    assert(got.head == ("on the", 2L, 2L))
    assert(got.toSet == Set(("on the", 2L, 2L), ("sat on", 2L, 2L), ("the cat", 2L, 2L)))
  }

  test("bigramLmQuality: hand-computed smoothed scores and novelty on a fixture") {
    // corpus: doc1 "a b a b", doc2 "a b c". bigrams: doc1 [a b, b a, a b],
    // doc2 [a b, b c]. counts: c2("a b")=4? no — within-doc only:
    // doc1 contributes (a b),(b a),(a b); doc2 (a b),(b c).
    // c2: "a b"->3, "b a"->1, "b c"->1. V=3 (a,b,c), N2=5.
    // denom = 2*5 + 9 = 19.
    // doc1: n=3, sum_num = (2*3+1)+(2*1+1)+(2*3+1) = 7+3+7 = 17,
    //       n_unique = 1 ("b a"); score = (17/3)/19.
    // doc2: n=2, sum_num = 7 + 3 = 10, n_unique = 1 ("b c");
    //       score = (10/2)/19.
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = CorpusStats.bigramLmQuality(d, "doc_id", col("text"), minCount = 1L)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, (17.0 / 3.0) / 19.0, 1.0 / 3.0),
      (2L, 2L, (10.0 / 2.0) / 19.0, 1.0 / 2.0)))
    // junk ranks below fluent text on a corpus with repeated phrasing
    val corpus = (1 to 8).map(i => (i.toLong, "the quick brown fox jumps")) :+
      (9L, "zq xv qqj kpw zzv")
    val scored = CorpusStats.bigramLmQuality(
      corpus.toDF("doc_id", "text"), "doc_id", col("text"), minCount = 1L)
      .orderBy(col("lm_score").asc).select("doc_id").as[Long].collect()
    assert(scored.head == 9L, "the junk doc must score lowest")
    // the 100 TB knob: a frequency floor drops tail bigrams from the
    // MODEL; they score as unseen (numerator 1). Corpus "a b a b"/"a b c":
    // floor 2 keeps only "a b" (c2=3). doc1: sum = 7+1+7 = 15 (b a unseen),
    // novelty counts the unseen occurrence. denom unchanged (19).
    val floored = CorpusStats.bigramLmQuality(
      Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", col("text"), minCount = 2L)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(floored == Seq(
      (1L, 3L, (15.0 / 3.0) / 19.0, 1.0 / 3.0),
      (2L, 2L, (8.0 / 2.0) / 19.0, 1.0 / 2.0)))
    // the DEFAULT is the scale-safe floored model (floor 3), not the
    // exact model: on this corpus floor 3 keeps only "a b" (c2=3) —
    // identical to floor 2 above — so calling with no minCount must
    // match the floored fixture, not the exact one
    val defaulted = CorpusStats.bigramLmQuality(
      Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(defaulted == floored,
      "bigramLmQuality must default to the floored (broadcastable) model")
  }

  test("topNgrams occurrence count keeps within-doc duplicates") {
    val d = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = CorpusStats.topNgrams(d, "doc_id", col("text"), n = 2, k = 1)
      .as[(String, Long, Long)].collect().head
    // sliding bigrams: "a b", "b a", "a b" -> "a b" occurs twice in ONE doc
    assert(got == ("a b", 2L, 1L))
  }

  test("docFrequency dedups tokens within a doc and ratios over all docs") {
    val got = CorpusStats.docFrequency(docs, "doc_id", col("text"), k = 2)
      .as[(String, Long, Double)].collect().toSeq
    // "the" appears in docs 1,2,3 (df 3, not 6 — within-doc dup collapsed);
    // ratio denominator is ALL 5 docs including the empty one
    assert(got.head == ("the", 3L, 3.0 / 5.0))
    assert(got(1)._2 == 2L) // cat/mat/on/sat all df=2; token-asc tie-break
    assert(got(1)._1 == "cat")
  }

  test("vocabStats aggregates per slice with type-token ratio") {
    val got = CorpusStats.vocabStats(docs, "doc_id", col("text"),
        Seq("lang", "source"))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // en/src0: docs 1,2 -> 9 tokens, distinct {the,cat,sat,on,mat,ran}=6
    assert(got(("en", "src0")) == ("en", "src0", 2L, 9L, 6L, 6.0 / 9.0))
    // de/src0: doc 4 -> 2 tokens, 2 distinct
    assert(got(("de", "src0")) == ("de", "src0", 1L, 2L, 2L, 1.0))
    // the zero-token doc 5 contributes no slice row for (en, src1) beyond doc 3
    assert(got(("en", "src1"))._3 == 1L)
  }

  test("invertedIndex orders postings tf-desc id-asc with exact df/tf") {
    val d = Seq(
      (1L, "a a a b"), (2L, "a b b"), (3L, "a"), (4L, "b c")
    ).toDF("doc_id", "text")
    val got = CorpusStats.invertedIndex(d, "doc_id", col("text"),
        maxPostings = 2, saltBuckets = 4)
      .as[(String, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // a: df=3, tf=5, top-2 by (tf desc, id asc) = doc1(3), doc2(1)|doc3(1) -> id asc -> doc2
    assert(got("a") == ("a", 3L, 5L, "1,2", true))
    // b: df=3, tf=4, top-2 = doc2(2), doc1(1)
    assert(got("b") == ("b", 3L, 4L, "2,1", true))
    assert(got("c") == ("c", 1L, 1L, "4", false))
  }

  test("invertedIndex salt-capped merge equals the single-phase result") {
    val d = sf("sf0.001")
    val docs = graft.core.Tables.documents(spark, d)
    val twoPhase = CorpusStats.invertedIndex(docs, "doc_id", col("text"),
      maxPostings = 10, saltBuckets = 16).orderBy("token")
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    val onePhase = CorpusStats.invertedIndex(docs, "doc_id", col("text"),
      maxPostings = 10, saltBuckets = 1).orderBy("token")
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    assert(twoPhase == onePhase) // per-salt top-k then merge is exact
  }

  private def bm25Docs = Seq(
    (1L, "spark join spark"), (2L, "join vector"),
    (3L, "the cat"), (4L, "spark")
  ).toDF("doc_id", "text")

  test("bm25TopK lucene mode matches the hand-computed formula") {
    // N=4, avgdl=2.0; df: spark=2, join=2, vector=1
    def idf(df: Double) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def norm(dl: Double) = 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 2.0))
    def c(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.2 / (tf + norm(dl)))
    val expect = Map(
      1L -> (c(2, 2, 3) + c(1, 2, 3)),          // spark*2, join
      2L -> (c(1, 2, 2) + c(1, 1, 2)),          // join, vector
      4L -> c(1, 2, 1))                         // spark
    val got = Relevance.bm25TopK(bm25Docs, "doc_id", col("text"),
        Seq("spark", "join", "vector"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L)) // rank by score desc
    got.foreach { case (id, _, _, s) =>
      assert(math.abs(s - expect(id)) < 1e-12, s"doc $id: $s vs ${expect(id)}")
    }
    assert(got.map(r => r._1 -> r._2).toMap == Map(1L -> 2L, 2L -> 2L, 4L -> 1L))
  }

  test("bm25TopK rational mode ranks identically on the fixture") {
    val rat = Relevance.bm25TopK(bm25Docs, "doc_id", col("text"),
      Seq("spark", "join", "vector"), idfMode = "rational")
      .as[(Long, Long, Long, Double)].collect()
    assert(rat.map(_._1).toSeq == Seq(2L, 1L, 4L))
    // doc 2: join contributes idf=2.0 exactly (2.2/2.2 cancels), vector 10/3
    assert(math.abs(rat.head._4 - (2.0 + 10.0 / 3.0)) < 1e-12)
  }

  test("bm25TopK aggregate path is bit-identical to the pivot path") {
    // force the sorted-fold aggregate path with pivotMaxTerms = 1 and
    // compare against the default pivot path: the fold order matches the
    // pivot's left-to-right reduceLeft, so doubles must be EXACTLY equal
    val terms = Seq("spark", "join", "vector")
    val pivot = Relevance.bm25TopK(bm25Docs, "doc_id", col("text"), terms)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val agg = Relevance.bm25TopK(bm25Docs, "doc_id", col("text"), terms,
        pivotMaxTerms = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(agg == pivot)
    // and past the boundary: a 70-term seed list (would be a 70-column
    // pivot + reduceLeft tree) runs through the aggregate path
    val wide = (1 to 67).map(i => s"nomatch$i") ++ terms
    val wideGot = Relevance.bm25TopK(bm25Docs, "doc_id", col("text"), wide)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(wideGot == pivot) // unmatched terms contribute nothing
  }

  test("registered driver queries run on testdata with matching columns") {
    val d = sf("sf0.001")
    val tn = SparkEntry.queries("t_top_ngrams")(spark, d)
    assert(tn.columns.toSeq == Seq("ngram", "n_occurrences", "n_docs"))
    assert(tn.count() == 25)
    val df = SparkEntry.queries("t_doc_frequency")(spark, d)
    assert(df.columns.toSeq == Seq("token", "df", "df_ratio"))
    assert(df.count() == 25)
    val vs = SparkEntry.queries("t_vocab_stats")(spark, d)
    assert(vs.columns.toSeq == Seq("lang", "source", "n_docs", "total_tokens",
      "distinct_tokens", "type_token_ratio"))
    assert(vs.count() > 0)
    val bm = SparkEntry.queries("t_bm25")(spark, d)
    assert(bm.columns.toSeq == Seq("doc_id", "n_matched", "dl", "score"))
    assert(bm.count() == 25)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats flags copy-paste structure and leaves clean text alone") {
    val tenA = (1 to 10).map(i => s"a$i").mkString(" ")
    val tenB = (1 to 10).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$tenA $tenA $tenA"),        // same 10-chunk 3x, "aN a1" bigram seam
      (2L, s"$tenA $tenB"),              // two distinct chunks, all bigrams unique
      (3L, "word word word word"),       // one bigram repeated
      (4L, "")                           // no tokens at all
    ).toDF("doc_id", "text")
    val got = graft.operators.Curation.repetitionStats(df, "doc_id", $"text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Long, Double)].collect().toSeq
    // doc 1: 3 chunks, 2 duplicates -> dup_chunk_frac = 2/3
    assert(got(0)._5 == 3L && math.abs(got(0)._6 - 2.0 / 3.0) < 1e-12)
    assert(got(0)._3 > 0.5) // 29 bigrams, mostly repeats
    // doc 2: no repetition anywhere
    assert(got(1) == ((2L, 19L, 0.0, 1.0 / 19.0, 2L, 0.0)))
    // doc 3: "word word" x3 -> dup frac 2/3, top ratio 1
    assert(got(2) == ((3L, 3L, 2.0 / 3.0, 1.0, 1L, 0.0)))
    // doc 4: all guards -> zeros
    assert(got(3) == ((4L, 0L, 0.0, 0.0, 0L, 0.0)))
  }

  test("packSequences lays docs head-to-tail with straddling offsets") {
    // one shard (ids all ≡ 1 mod 8): 3 docs of 5/3/4 tokens into seqLen 6
    val df = Seq(
      (1L, "a b c d e"), (9L, "f g h"), (17L, "i j k l"))
      .toDF("doc_id", "text")
    val got = graft.operators.Curation.packSequences(df, "doc_id", $"text",
      seqLen = 6, shards = 8)
      .orderBy("doc_id")
      .select("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 5L, 0L, 0L),   // starts seq 0 offset 0
      (9L, 1L, 3L, 0L, 5L),   // starts at offset 5, straddles into seq 1
      (17L, 1L, 4L, 1L, 2L))) // cumulative 8 -> seq 1 offset 2
  }

  test("decontamination flags docs overlapping the eval set") {
    val ev = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tomorrow"), // near-copy
      (2L, "completely different words about catalyst optimizer rules"),
      (3L, "no")) // under shingle size -> zero overlap, still present
      .toDF("doc_id", "text")
    val got = Curation.overlapWithEval(corpus, ev, "doc_id", $"text",
      shingleSize = 3, minOverlap = 3)
      .orderBy("doc_id")
      .select($"doc_id", $"n_overlap", $"contaminated")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._2 >= 6 && got(0)._3 == 1) // shares 3-grams up to "lazy dog"
    assert(got(1) == ((2L, 0L, 0)))
    assert(got(2) == ((3L, 0L, 0)))
  }

  test("pii redaction replaces emails, phones, ips and counts them") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, call 555-123-4567, host 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val counts = Curation.piiCounts($"text").map { case (n, c) => c.as(n) }
    val got = df.select(Seq($"doc_id") ++ counts :+
      Curation.redactPii($"text").as("r"): _*).orderBy("doc_id").collect()
    assert(got(0).getInt(1) == 2 && got(0).getInt(2) == 1 && got(0).getInt(3) == 1)
    assert(got(0).getString(4) ==
      "mail [EMAIL] and [EMAIL], call [PHONE], host [IP]")
    assert(got(1).getInt(1) == 0 && got(1).getString(4) == "nothing sensitive here")
  }

  test("quality rules measure and gate on count, mean length, repetition") {
    val longOk = (1 to 30).map(i => s"word$i").mkString(" ")      // varied, len>=5
    val repetitive = Seq.fill(30)("spam").mkString(" ")           // ratio 1.0
    val df = Seq((1L, longOk), (2L, repetitive), (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val got = Curation.qualityRules(df, "doc_id", $"text")
      .orderBy("doc_id")
      .select($"doc_id", $"token_count", $"passes").as[(Long, Int, Int)]
      .collect().toSeq
    assert(got == Seq((1L, 30, 1), (2L, 30, 0), (3L, 2, 0)))
  }

  test("hash split is deterministic, exhaustive, and ~90/5/5") {
    val df = (1L to 2000L).toDF("id")
      .withColumn("split", Curation.hashSplit($"id"))
    val counts = df.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1650 && counts("train") < 1950)
    assert(counts.values.sum == 2000L)
    // deterministic: same assignment on recompute
    val again = (1L to 2000L).toDF("id")
      .withColumn("split2", Curation.hashSplit($"id"))
    assert(df.join(again, "id").filter($"split" =!= $"split2").count() == 0)
  }
}

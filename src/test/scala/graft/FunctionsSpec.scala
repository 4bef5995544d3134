package graft

import org.apache.spark.sql.functions._

import graft.functions.{Sentiment, TextFunctions, VectorFunctions}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercase and strip punctuation/empties") {
    val got = Seq("Hello, World!  foo_bar 42").toDF("t")
      .select(TextFunctions.tokens($"t")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("shingles slide over tokens; short docs degrade to one shingle") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("charNgrams") {
    val got = Seq("abcdef").toDF("t")
      .select(TextFunctions.charNgrams($"t", 5)).as[Seq[String]].head()
    assert(got == Seq("abcde", "bcdef"))
  }

  test("token/subword counts") {
    val got = Seq("one twotwo threethree").toDF("t")
      .select(TextFunctions.tokenCount($"t"), TextFunctions.subwordCount($"t"))
      .as[(Int, Long)].head()
    assert(got == ((3, 1 + 2 + 3)))  // ceil(3/4)+ceil(6/4)+ceil(11/4)
  }

  test("detectLang votes by stopwords with en priority, zh by codepoint") {
    val rows = Seq(
      ("the cat is on the mat",       "en"),
      ("der hund ist nicht ein vogel", "de"),
      ("el gato es un animal",         "es"),
      ("le chat est dans la maison",   "fr"),
      ("你好世界",     "zh"),
      ("zzz qqq xxx",                  "und"))
    val got = rows.map(_._1).toDF("t")
      .select(TextFunctions.detectLang($"t")).as[String].collect().toSeq
    assert(got == rows.map(_._2))
  }

  test("quality score bounded and ordering sane") {
    val got = Seq(
      "the quick brown fox jumps over the lazy dog and runs through the field for a while longer here",
      "!!!! ???? ;;;; ....")
      .toDF("t").select(TextFunctions.qualityScore($"t")).as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }

  test("sentiment polarity sign and null guard") {
    val got = Seq("good great win", "bad terrible war", "neutral words only", "")
      .toDF("t").select(Sentiment.polarity($"t")).as[Double].collect()
    assert(got(0) > 0); assert(got(1) < 0); assert(got(2) == 0.0); assert(got(3) == 0.0)
  }

  test("vector math: dot, norm, cosine, l2") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val (d, na, c, l2) = df.select(
      VectorFunctions.dot($"a", $"b"), VectorFunctions.norm($"a"),
      VectorFunctions.cosine($"a", $"b"), VectorFunctions.l2Distance($"a", $"b"))
      .as[(Double, Double, Double, Double)].head()
    assert(d == 24.0)
    assert(na == 5.0)
    assert(math.abs(c - 24.0 / 25.0) < 1e-12)
    assert(math.abs(l2 - math.sqrt(2.0)) < 1e-12)
  }

  test("cosine zero-norm guard and normalized") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine($"a", $"b")).as[Double].head()
    assert(c == 0.0)
    val n = df.select(VectorFunctions.normalized($"b")).as[Seq[Double]].head()
    assert(n == Seq(1.0, 0.0))
  }

  test("fingerprint is order-sensitive and stable") {
    val fps = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[Long].collect()
    assert(fps(0) != fps(1))
    assert(fps(0) == fps(2))
  }
}

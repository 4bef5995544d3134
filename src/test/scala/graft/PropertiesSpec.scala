package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.operators.{Dedup, Joins, Sessionize, Upsert}

/** ScalaCheck algebraic properties for the merge/dedup/upsert operators
  * (SURVEY.md §5 test plan item 4). Checked with raw ScalaCheck driven
  * from ScalaTest (no scalatestplus bridge in the offline cache). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val kvGen: Gen[List[(String, Int)]] =
    Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      v <- Gen.choose(0, 100)
    } yield (k, v))

  test("replaceByKey: fresh keys replaced, others kept, idempotent") {
    check(Prop.forAll(kvGen, kvGen) { (ex, fr) =>
      val existing = Dedup.keepLastBy(ex.toDF("k", "v"), Seq("k"), col("v"))
      val fresh = Dedup.keepLastBy(fr.toDF("k", "v"), Seq("k"), col("v"))
      val once = Upsert.replaceByKey(existing, fresh, Seq("k"))
        .orderBy("k", "v").collect().toSeq
      val twice = Upsert.replaceByKey(
        Upsert.replaceByKey(existing, fresh, Seq("k")), fresh, Seq("k"))
        .orderBy("k", "v").collect().toSeq
      val freshKeys = fr.map(_._1).toSet
      val expectKeys = (ex.map(_._1).toSet ++ freshKeys)
      once == twice &&
        once.map(_.getString(0)).toSet == expectKeys &&
        once.filter(r => freshKeys(r.getString(0)))
          .forall(r => fresh.filter(col("k") === r.getString(0))
            .select("v").as[Int].head() == r.getInt(1))
    })
  }

  test("appendDedup: one row per key, fresh wins on collision") {
    check(Prop.forAll(kvGen, kvGen) { (ex, fr) =>
      val existing = Dedup.keepLastBy(ex.toDF("k", "v"), Seq("k"), col("v"))
      val fresh = Dedup.keepLastBy(fr.toDF("k", "v"), Seq("k"), col("v"))
      val merged = Upsert.appendDedup(existing, fresh, Seq("k"), lit(0))
        .collect()
      val freshMap = fr.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      merged.map(_.getString(0)).distinct.length == merged.length &&
        merged.filter(r => freshMap.contains(r.getString(0)))
          .forall(r => r.getInt(1) == freshMap(r.getString(0)))
    })
  }

  test("keepLastBy: exactly the max-order row survives per key") {
    check(Prop.forAll(kvGen) { kv =>
      kv.isEmpty || {
        val got = Dedup.keepLastBy(kv.toDF("k", "v"), Seq("k"),
          col("v")).collect()
        val expect = kv.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        got.length == expect.size &&
          got.forall(r => expect(r.getString(0)) == r.getInt(1))
      }
    })
  }

  test("unionMerge: column union, row-count sum, null-filled misses") {
    check(Prop.forAll(Gen.listOfN(5, Gen.posNum[Int]),
      Gen.listOfN(7, Gen.alphaStr.map(_.take(4)))) { (xs, ys) =>
      val a = xs.toDF("n")
      val b = ys.toDF("s")
      val m = Joins.unionMerge(Seq(a, b))
      m.columns.toSet == Set("n", "s") &&
        m.count() == xs.length + ys.length &&
        m.filter(col("s").isNull).count() == xs.length
    })
  }

  test("sessionize preserves events and respects the gap invariant") {
    val evGen = Gen.listOfN(15, for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 7200L)
    } yield (k, t))
    check(Prop.forAll(evGen) { evs =>
      val distinct = evs.distinct
      val df = distinct
        .map { case (k, t) => (k, new java.sql.Timestamp(1704067200000L + t * 1000)) }
        .toDF("user_id", "ts")
      val sessions = Sessionize.sessions(df, "user_id", "ts",
        java.time.Duration.ofMinutes(10)).collect()
      val totalEvents = sessions.map(_.getAs[Long]("n_events")).sum
      // every session fits inside [start, end] and starts/ends at real events
      totalEvents == distinct.length &&
        sessions.forall { s =>
          !s.getAs[java.sql.Timestamp]("session_start")
            .after(s.getAs[java.sql.Timestamp]("session_end"))
        }
    })
  }

  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOfN(8, for {
      id <- Gen.choose(0L, 1000L)
      words <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    } yield (id, words.mkString(" "))).map(_.distinctBy(_._1))

  test("chunkDedup: chunk counts conserved, kept set = distinct chunk set, " +
    "kept_text is a subsequence reconstruction") {
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.DedupSuite
        .chunkDedup(df, "doc_id", col("text"), chunkTokens = 3).collect()
      def chunksOf(t: String): Seq[String] =
        t.split("\\s+").filter(_.nonEmpty).grouped(3).map(_.mkString(" ")).toSeq
      val all = docs.flatMap { case (_, t) => chunksOf(t) }
      val gotByDoc = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
      // per-doc totals match an independent chunker; global kept count
      // equals the number of DISTINCT chunks; every kept_text is made of
      // that doc's own chunks in order
      docs.forall { case (id, t) =>
        gotByDoc(id).getAs[Long]("n_chunks") == chunksOf(t).length
      } &&
        got.map(_.getAs[Long]("n_kept")).sum == all.distinct.length &&
        docs.forall { case (id, t) =>
          val kept = gotByDoc(id).getAs[String]("kept_text")
          kept.isEmpty || {
            val keptChunks = chunksOf(kept) // 3-token chunks re-split cleanly
            val own = chunksOf(t)
            // subsequence check
            keptChunks.foldLeft(own) { (rest, c) =>
              val i = rest.indexOf(c); if (i < 0) Seq("⊥") else rest.drop(i + 1)
            } != Seq("⊥")
          }
        }
    })
  }

  test("stratifiedSample: rate-1 identity, rate-0 empty, threshold nesting") {
    val idsGen = Gen.listOfN(20, Gen.choose(0L, 10000L)).map(_.distinct)
    check(Prop.forAll(idsGen) { ids =>
      val df = ids.map(i => (i, s"s${i % 3}")).toDF("id", "grp")
      def sample(r: Double) = graft.operators.Sampling
        .stratifiedSample(df, col("id"), col("grp"), Map(), defaultRate = r)
        .select("id").as[Long].collect().toSet
      val full = sample(1.0); val none = sample(0.0)
      val half = sample(0.5); val fifth = sample(0.2)
      full == ids.toSet && none.isEmpty && fifth.subsetOf(half) &&
        half.subsetOf(full)
    })
  }

  test("sourceMix: per-row multiplicity is floor(w) or ceil(w), determined " +
    "by the row's bucket") {
    val wGen = Gen.oneOf(0.0, 0.25, 1.0, 1.5, 2.0, 2.75)
    val idsGen = Gen.listOfN(15, Gen.choose(0L, 10000L)).map(_.distinct)
    check(Prop.forAll(idsGen, wGen) { (ids, w) =>
      val df = ids.map(i => (i, "src")).toDF("id", "source")
      val out = graft.operators.Sampling.sourceMix(df, col("id"),
        col("source"), Map("src" -> w))
      val counts = out.groupBy("id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.forall { i =>
        val n = counts.getOrElse(i, 0L)
        n == math.floor(w).toLong || n == math.ceil(w).toLong
      }
    })
  }

  test("systematicWeightedSample: total picks == n whenever weight exists") {
    val wGen = Gen.listOfN(25, Gen.choose(0L, 1000L))
    check(Prop.forAll(wGen) { ws =>
      ws.exists(_ > 0) ==> {
        val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("id", "w")
        val got = graft.operators.Sampling
          .systematicWeightedSample(df, col("id"), col("w"), n = 8, shards = 2)
        val total = got.agg(sum(col("n_picks"))).as[Long].head()
        // every shard holding weight contributes exactly n/shards picks;
        // a shard that happens to hold ONLY zero-weight rows contributes 0
        val shardsWithWeight = df
          .filter(col("w") > 0)
          .select(graft.operators.Sampling.bucket(col("id"), 2).as("s"))
          .distinct().count()
        total == 4L * shardsWithWeight
      }
    })
  }

  test("scd2History: per key, intervals chain and values always change") {
    val chGen = Gen.listOfN(15, for {
      k <- Gen.oneOf(1L, 2L, 3L)
      d <- Gen.choose(1, 28)
      v <- Gen.choose(0, 3)
    } yield (k, f"2024-01-$d%02d", v.toDouble))
    check(Prop.forAll(chGen) { ch =>
      ch.nonEmpty ==> {
        val df = ch.zipWithIndex
          .map { case ((k, d, v), i) => (k, d, i.toLong, v) }
          .toDF("k", "ts", "id", "v")
        val hist = Upsert.scd2History(df, "k", "ts", "id", "v")
          .orderBy("k", "version")
          .as[(Long, String, Long, Double, Option[String], Long, Boolean)]
          .collect().toSeq
        hist.groupBy(_._1).values.forall { versions =>
          val ordered = versions.sortBy(_._6)
          // versions are 1..n, exactly one current (the last), each
          // valid_to equals the next version's valid_from, and
          // consecutive values always differ (compaction held)
          ordered.map(_._6) == (1L to ordered.size).toSeq &&
            ordered.count(_._7) == 1 && ordered.last._7 &&
            ordered.zip(ordered.tail).forall { case (a, b) =>
              a._5.contains(b._2) && a._4 != b._4
            }
        }
      }
    })
  }

  test("histogram: counts conserved, buckets within range, low bounds ordered") {
    val vGen = Gen.listOfN(30, Gen.choose(-1000.0, 1000.0))
    check(Prop.forAll(vGen) { vs =>
      vs.nonEmpty ==> {
        val df = vs.toDF("x")
        val got = graft.operators.Profile.histogram(df, col("x"), bins = 7)
          .orderBy("bucket").as[(Long, Double, Long)].collect().toSeq
        got.map(_._3).sum == vs.size &&
          got.forall(b => b._1 >= 0 && b._1 < 7) &&
          got.map(_._2) == got.map(_._2).sorted
      }
    })
  }
}

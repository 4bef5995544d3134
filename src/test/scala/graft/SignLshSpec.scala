package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Ann

class SignLshSpec extends SparkSpec {
  import spark.implicits._

  test("sign-LSH finds planted near-duplicates (recall on close vectors)") {
    // planted cluster: base vector + tiny perturbations, plus noise vectors
    val rnd = new scala.util.Random(7)
    def vec(f: Int => Float) = Array.tabulate(64)(f)
    val base = vec(_ => rnd.nextFloat() - 0.5f)
    val rows =
      Seq((0L, base)) ++
        (1 to 3).map(i => (i.toLong, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))) ++
        (4 to 60).map(i => (i.toLong, vec(_ => rnd.nextFloat() - 0.5f)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val got = Ann.signLshTopK(corpus, "vec_id", "embedding", queries,
      k = 3, numPlanes = 12, probeHamming = 1)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got.toSet == Set(1L, 2L, 3L))   // exactly the perturbed copies
  }

  test("sign-LSH scores strictly fewer vectors than brute force") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val q = e.filter($"vec_id" < 3).select($"vec_id", $"embedding")
    val lsh = Ann.signLshTopK(e, "vec_id", "embedding", q, k = 5)
    assert(lsh.count() <= 15)
    // candidate fraction: buckets partition 500 vectors across 2^12 sigs;
    // with h<=1 probing a query touches 13 of 4096 buckets
    val bucketSizes = e.select(Ann.signLshSignature($"embedding", 12, 64, 42L).as("b"))
      .groupBy("b").count()
    assert(bucketSizes.agg(max("count")).as[Long].head() < 50)
  }

  test("LSH near-dup pairs find planted dups and are a subset of brute force") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.tabulate(64)(_ => rnd.nextFloat() - 0.5f)
    val base = vec()
    val rows =
      Seq((0L, base)) ++
        (1 to 2).map(i => (i.toLong, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))) ++
        (3 to 80).map(i => (i.toLong, vec()))
    val corpus = rows.toDF("vec_id", "embedding")
    val lsh = Ann.lshNearDupPairs(corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Ann.cosineNearDupPairs(corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))                       // precision exact
    assert(Set((0L, 1L), (0L, 2L), (1L, 2L)).subsetOf(lsh)) // planted recall
  }

  test("sign-LSH accepts double-array queries against a float corpus") {
    val rnd = new scala.util.Random(3)
    val corpus = (0 to 20).map(i =>
      (i.toLong, Array.tabulate(64)(_ => rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    // queries as array<double> — the native float-only expressions must
    // not be forced onto this side
    val q = corpus.filter($"vec_id" < 2)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val res = Ann.signLshTopK(corpus, "vec_id", "embedding", q, k = 3)
    assert(res.count() <= 6) // resolves and runs; k per query caps rows
  }

  test("k-means centroids separate planted clusters and drive IVF") {
    val rnd = new scala.util.Random(5)
    def around(center: Float) =
      Array.tabulate(64)(_ => center + (rnd.nextFloat() - 0.5f) * 0.1f)
    val rows = (0 until 30).map(i => (i.toLong, around(1.0f))) ++
      (30 until 60).map(i => (i.toLong, around(-1.0f)))
    val corpus = rows.toDF("vec_id", "embedding")
    val centroids = Ann.trainCentroids(corpus, "embedding", k = 2, seed = 7L)
    assert(centroids.count() == 2)
    // the two centers sit near +1 and -1 per dim
    val means = centroids.select(explode($"embedding").as("x"))
      .groupBy().agg(min($"x"), max($"x")).as[(Float, Float)].head()
    assert(means._1 < -0.8f && means._2 > 0.8f)
    // IVF with trained centroids returns sane neighbors for a cluster member
    val q = corpus.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val res = Ann.ivfTopK(corpus, "vec_id", "embedding", centroids, q,
      k = 5, nProbe = 1)
    val ids = res.select("neighbor_id").as[Long].collect().toSet
    assert(ids.size == 5 && ids.forall(_ < 30)) // same planted cluster
  }

  test("registerAll exposes the star schema to spark.sql") {
    Tables.registerAll(spark, sf())
    assert(spark.sql("SELECT COUNT(*) FROM lineitem").as[Long].head() > 0)
    assert(spark.sql(
      "SELECT COUNT(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      .as[Long].head() > 0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** One 10× scale step (VERDICT r9 #5): synthesize an sf1-equivalent
  * dataset from sf0.1 by key-offset replication, run the most expensive
  * queries at BOTH scales, and report per-query scaling ratios — a
  * superlinear shape (the Σ df(gram)² class) is invisible at one scale
  * point and ~linear ratios are the 100 TB evidence.
  *
  * Replication preserves each query's workload SHAPE instead of
  * inflating it artificially:
  *  - relational tables replicate with consistent key offsets (join
  *    fan-outs and per-key group sizes stay exactly sf0.1's; only the
  *    number of keys scales — the TPC-H SF model);
  *  - document text is Caesar-shifted per replica (a bijection on
  *    letters: within-replica shingle/ngram/near-dup structure is
  *    preserved EXACTLY, cross-replica overlap collapses to ~0 — naive
  *    copying would hand the dedup suite 10 exact copies of every doc
  *    and quadratically inflate every candidate bucket);
  *  - embeddings sign-flip a per-replica subset of dimensions (an
  *    isometry: within-replica dot products and therefore ANN/semantic
  *    dedup structure are bit-preserved; cross-replica vectors decohere).
  *
  * Run: `sbt "runMain graft.ScaleStep"`; results in SCALE_SMOKE.md.
  */
object ScaleStep {

  private val Mult = 10

  /** Seeded letter PERMUTATION (not a Caesar shift): still a bijection —
    * within-replica shingle/ngram/near-dup structure is preserved
    * exactly — but unlike shifts it COMPOSES safely: stacking two decades
    * (sf1 → sf10) applies permutation∘permutation, and with distinct
    * seeds no two (inner, outer) replica pairs collapse to the same
    * total mapping (Caesar shifts compose additively mod 26, so a
    * 100-pair stack would hand the dedup suite ~4 exact copies of every
    * document per shift class and quadratically inflate its buckets). */
  private def permLower(seed: Int): String = {
    val r = new scala.util.Random(0x9E3779B9L * (seed + 1))
    r.shuffle(('a' to 'z').toList).mkString
  }

  /** Replicate `df` `Mult`× with per-replica transforms; `seedBase`
    * makes replica seeds globally unique across stacked decades. */
  private def replicate(df: DataFrame, perReplica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Mult).map(i => perReplica(df, i)).reduce(_.unionByName(_))

  def build(spark: SparkSession, src: String, out: String, seedBase: Int = 0): Unit = {
    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    // fixed dims copy through (TPC-H scaling: nations/regions don't grow)
    write(t("region"), "region")
    write(t("nation"), "nation")

    val maxCust = t("customer").agg(max("c_custkey")).head.getLong(0)
    val maxSupp = t("supplier").agg(max("s_suppkey")).head.getLong(0)
    val maxPart = t("part").agg(max("p_partkey")).head.getLong(0)
    val maxOrder = t("orders").agg(max("o_orderkey")).head.getLong(0)
    val maxEvent = t("events").agg(max("event_id")).head.getLong(0)
    val maxUser = t("events").agg(max("user_id")).head.getLong(0)
    val maxDoc = t("documents").agg(max("doc_id")).head.getLong(0)
    val maxVec = t("embeddings").agg(max("vec_id")).head.getLong(0)

    def off(c: String, m: Long, i: Int) = col(c) + lit(m * i)

    write(replicate(t("customer"), (d, i) =>
      d.withColumn("c_custkey", off("c_custkey", maxCust, i))), "customer")
    write(replicate(t("supplier"), (d, i) =>
      d.withColumn("s_suppkey", off("s_suppkey", maxSupp, i))), "supplier")
    write(replicate(t("part"), (d, i) =>
      d.withColumn("p_partkey", off("p_partkey", maxPart, i))), "part")
    write(replicate(t("orders"), (d, i) => d
      .withColumn("o_orderkey", off("o_orderkey", maxOrder, i))
      .withColumn("o_custkey", off("o_custkey", maxCust, i))), "orders")
    write(replicate(t("lineitem"), (d, i) => d
      .withColumn("l_orderkey", off("l_orderkey", maxOrder, i))
      .withColumn("l_partkey", off("l_partkey", maxPart, i))
      .withColumn("l_suppkey", off("l_suppkey", maxSupp, i))), "lineitem")
    // ts jitter of +i seconds keeps hourly/session bucketing identical
    // per replica while avoiding 10-way timestamp collisions
    write(replicate(t("events"), (d, i) => d
      .withColumn("event_id", off("event_id", maxEvent, i))
      .withColumn("user_id", off("user_id", maxUser, i))
      .withColumn("ts", col("ts") + expr(s"make_interval(0,0,0,0,0,0,$i)"))), "events")
    val abc = ('a' to 'z').mkString
    write(replicate(t("documents"), (d, i) => d
      .withColumn("doc_id", off("doc_id", maxDoc, i))
      .withColumn("text", {
        val p = permLower(seedBase * Mult + i)
        translate(col("text"), abc + abc.toUpperCase, p + p.toUpperCase)
      })), "documents")
    write(replicate(t("embeddings"), (d, i) => d
      .withColumn("vec_id", off("vec_id", maxVec, i))
      .withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> x * CAST(CASE WHEN " +
          s"pmod(hash(j, ${seedBase * Mult + i + 1}), 2) = 0 " +
          "THEN 1.0 ELSE -1.0 END AS FLOAT))"))), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-scale-step",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    // second decade: set SPARK_GRAFT_SF10_DIR to stack another 10× on
    // top of the sf1-equivalent (seedBase 1 keeps every composed text
    // permutation / embedding sign-mask globally unique) and measure
    // sf1 → sf10 ratios instead of sf0.1 → sf1.
    val out10 = sys.env.get("SPARK_GRAFT_SF10_DIR")
    // third decade: sf10 → sf100-equivalent (~15 GB); seedBase 2 keeps
    // every composed permutation / sign-mask unique across all three
    // stacked decades
    val out100 = sys.env.get("SPARK_GRAFT_SF100_DIR")
    require(out100.isEmpty || out10.nonEmpty,
      "SPARK_GRAFT_SF100_DIR needs SPARK_GRAFT_SF10_DIR (decades stack)")

    def ensure(from: String, to: String, seedBase: Int, label: String): Unit =
      if (!new java.io.File(s"$to/lineitem.parquet").exists()) {
        println(s"SCALE step: building $label dataset at $to from $from")
        val t0 = System.nanoTime()
        build(spark, from, to, seedBase)
        println(f"SCALE step: build took ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }

    ensure(src, out, 0, s"${Mult}x")
    out10.foreach(ensure(out, _, 1, s"${Mult}x-of-${Mult}x"))
    out100.foreach(o => ensure(out10.get, o, 2, s"${Mult}^3"))
    val (smallDir, bigDir) = (out10, out100) match {
      case (Some(o10), Some(o100)) => (o10, o100) // third decade: sf10 vs sf100
      case (Some(o10), None)       => (out, o10)  // second decade: sf1 vs sf10
      case _                       => (src, out)
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("d_char_ngram", "d_dedup_clusters", "d_dedup_apply", "prof_columns",
        "d_incr_neardup", "a12_rollup", "d_embed_neardup", "d_minhash_lsh",
        "q21_last_shipper", "q18_large_orders", "agg_corr", "q1_agg",
        "q5_local_supplier", "d_semantic", "ann_pq")

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-22s ${"small"}%8s ${"10x"}%8s ${"ratio"}%6s")
    for (n <- names) {
      val small = (1 to 2).map(_ => run(n, smallDir)).min
      val big = (1 to 2).map(_ => run(n, bigDir)).min
      println(f"SCALE ratio: $n%-22s $small%8.2f $big%8.2f ${big / small}%6.1f")
    }
    spark.stop()
  }
}

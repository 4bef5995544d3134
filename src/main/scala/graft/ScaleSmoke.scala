package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{Sessionize, TimeSeries}
import graft.sources.Synthetic

/** Scale smoke: runs the core operator shapes on a synthetic event stream
  * 100-1000x larger than the sf0.1 testdata (driver testdata caps at
  * ~100k events; a 100 TB design claim deserves evidence at millions of
  * rows). Prints one timing line per shape.
  *
  * Usage: SPARK_GRAFT_SMOKE_ROWS=20000000 sbt "runMain graft.ScaleSmoke"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val targetRows = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-smoke", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~2k users/day x 100 days x ~avg 100 events -> tune usersPerDay to hit target
    val days = 100
    val maxPerUserDay = 19 // avg 10
    val usersPerDay = math.max(1L, targetRows / (days * 10L)).toInt
    val events = Synthetic.events(spark, java.time.LocalDate.of(2024, 1, 1),
      days, usersPerDay, maxPerUserDay, seed = 42L)
      .withColumn("ts", timestamp_seconds(
        col("date").cast("timestamp").cast("long") +
          pmod(xxhash64(col("user_id"), col("value")), lit(86400L))))
      .withColumn("user_id", col("user_id") + col("date").cast("timestamp").cast("long") % 7)

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"SCALE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val n = events.count()
    println(s"SCALE rows: $n")
    time("group_count (a1 shape)") {
      events.groupBy(col("date"), col("user_id")).agg(count(lit(1)).as("n"))
    }
    time("hourly_stats (a2 shape)") {
      TimeSeries.hourlyStats(events, col("ts"), col("value"))
    }
    time("keep_last dedup (u2 shape)") {
      graft.operators.Dedup.keepLastBy(events, Seq("user_id"), col("ts"))
    }
    time("sessionize (w6 shape)") {
      Sessionize.sessions(events.select(col("user_id"), col("ts")), "user_id", "ts",
        java.time.Duration.ofMinutes(30))
    }

    // document shapes: synthetic corpus from a small vocab (deterministic),
    // sized so the dedup paths run at ~100-1000x the sf0.1 doc count
    val vocab = typedLit(Seq("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "spark", "window",
      "order", "data", "column", "join", "small", "line", "customer", "query",
      "big", "stream", "filter", "sort", "group", "vector", "the", "a"))
    val nDocs = math.max(100000L, targetRows / 20L)
    // every id ending in 01 is a near-copy of the preceding id (59 of 60
    // token positions shared) — ~1% planted near-dup pairs, so the dedup
    // smoke proves end-to-end DISCOVERY, not just throughput on noise
    val baseId = when(pmod(col("id"), lit(100L)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val gen = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(59)),
        i => element_at(vocab,
          (pmod(xxhash64(when(i === 59, col("id")).otherwise(baseId), i),
            lit(30L)) + 1).cast("int")))).as("text"))
    // land the synthetic corpus in parquet first: real pipelines rescan
    // columnar storage, not a 60-HOF generator, when a plan re-reads its
    // source — measuring from the generator quadruple-counts generation.
    val pq = graft.core.TempDirs.create("graft-scale") + "/docs"
    gen.write.mode("overwrite").parquet(pq)
    val docs = spark.read.parquet(pq)
    println(s"SCALE docs: $nDocs")
    time("simhash60 table (scalar, no shuffle)") {
      graft.operators.DedupSuite.simhashTable(docs, "doc_id", col("text"),
        portable = true)
    }
    val t0 = System.nanoTime()
    val nPairs = graft.operators.DedupSuite.minhashNearDupPairs(
      docs, "doc_id", col("text"), shingleSize = 3, numHashes = 64,
      bands = 16, threshold = 0.8).count()
    println(f"SCALE minhash near-dup pairs (sig+band+verify): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s ($nPairs pairs found)")
    time("quality rules (curation shape)") {
      graft.operators.Curation.qualityRules(docs, "doc_id", col("text"))
    }
    // round-4 shapes over the same corpus -------------------------------
    val t1 = System.nanoTime()
    val kept = graft.operators.DedupSuite.chunkDedup(docs, "doc_id",
      col("text"), chunkTokens = 20)
    val chunkAgg = kept.agg(sum(col("n_chunks")).as("nc"),
      sum(col("n_kept")).as("nk")).collect()(0)
    println(f"SCALE chunk dedup (winner-per-hash groupBy): " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s " +
      f"(${chunkAgg.getLong(0)} chunks -> ${chunkAgg.getLong(1)} kept)")
    time("incremental dedup (batch vs corpus index)") {
      graft.operators.DedupSuite.incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(10L)) === 0), "doc_id", col("text"))
    }
    // planted near-copies sit on id pairs (100k, 100k+1): a pmod-10 split
    // puts every such pair across batch/corpus -> all matches are 'corpus'
    val t1b = System.nanoTime()
    val incrMatches = graft.operators.DedupSuite.incrementalNearDup(
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 1),
      docs.filter(pmod(col("doc_id"), lit(10L)) === 1), "doc_id", col("text"),
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8).count()
    println(f"SCALE incremental near-dup (100k batch vs 900k corpus bands): " +
      f"${(System.nanoTime() - t1b) / 1e9}%.1f s ($incrMatches matches)")
    val t1c = System.nanoTime()
    val pairs = graft.operators.DedupSuite.minhashNearDupPairs(
      docs, "doc_id", col("text"), 3, 64, 16, 0.8)
    val clusters = graft.operators.DedupSuite.dedupClusters(pairs)
    val nClusters = clusters.select(col("cluster_id")).distinct().count()
    println(f"SCALE dedup clusters (components over the pair graph): " +
      f"${(System.nanoTime() - t1c) / 1e9}%.1f s ($nClusters clusters)")
    time("source mix (epoch generator, no shuffle)") {
      graft.operators.Sampling.sourceMix(
        docs.withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20L)))),
        col("doc_id"), col("source"),
        Map("src0" -> 2.5, "src1" -> 0.3), defaultWeight = 1.0)
    }
    time("repetition stats (scalar projection)") {
      graft.operators.Curation.repetitionStats(docs, "doc_id", col("text"))
    }

    // round-5 shapes over the same corpus ------------------------------
    time("bm25 top-k (3 terms, broadcast stats + fixed-order scoring)") {
      graft.operators.Relevance.bm25TopK(docs, "doc_id", col("text"),
        Seq("spark", "join", "vector"), k = 100)
    }
    // 30-token vocab over the full corpus = EVERY token is ultra-hot:
    // worst case for the posting-list build (each (token, salt) sub-group
    // carries ~nDocs/saltBuckets rows through the spillable rank window)
    val t3b = System.nanoTime()
    val inv = graft.operators.CorpusStats.invertedIndex(docs, "doc_id",
      col("text"), maxPostings = 1000, saltBuckets = 64)
    val nTok = inv.count()
    println(f"SCALE inverted index (all-hot vocab, salt-capped): " +
      f"${(System.nanoTime() - t3b) / 1e9}%.1f s ($nTok tokens)")
    time("top bigrams (word-count shape)") {
      graft.operators.CorpusStats.topNgrams(docs, "doc_id", col("text"),
        n = 2, k = 100)
    }
    time("systematic weighted sample (exact-n PPS, 32 shards)") {
      graft.operators.Sampling.systematicWeightedSample(
        docs.withColumn("w", length(col("text")).cast("long")),
        col("doc_id"), col("w"), n = 32000, shards = 32)
    }
    // bloom prefilter: selective semi-join of the event stream against a
    // 1%-of-users key set — the probe prunes at the scan, pre-shuffle
    val t3c = System.nanoTime()
    // alias the key column: both sides derive from `events`, and a
    // same-name same-lineage join condition trips ambiguous-self-join
    val keys = events.select(col("user_id").as("k_user"))
      .filter(pmod(col("k_user"), lit(100L)) === 0).distinct()
    val nPruned = graft.operators.Joins.bloomPrefilterJoin(
      events.select(col("user_id"), col("value")), keys,
      "user_id", "k_user", "left_semi").count()
    println(f"SCALE bloom prefilter join (1%% selectivity): " +
      f"${(System.nanoTime() - t3c) / 1e9}%.1f s ($nPruned rows kept)")

    // embedding shapes: synthetic 64-dim float vectors. Like the doc
    // corpus, ~1% are planted near-copies (63/64 dims shared with the
    // preceding id, cos ≈ 0.98) so the semantic-dedup smoke proves
    // end-to-end DISCOVERY, not just throughput over noise.
    val nVecs = math.max(100000L, targetRows / 200L)
    val vBase = when(pmod(col("id"), lit(100L)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(when(i === lit(63), col("id")).otherwise(vBase), i),
          lit(1000L)) - 500L) / 500.0)
          .cast("float")).as("embedding"))
    val vpq = graft.core.TempDirs.create("graft-scale") + "/vecs"
    vecs.write.mode("overwrite").parquet(vpq)
    val v = spark.read.parquet(vpq)
    println(s"SCALE vecs: $nVecs")
    time("pq encode (native ADC inner loop)") {
      val cb = graft.operators.Ann.pqCodebook(
        v.filter(col("vec_id") < 16).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", m = 8, dim = 64)
      graft.operators.Ann.pqEncode(v, "vec_id", "embedding", cb, m = 8, dim = 64)
    }
    // 256 cells ~ sqrt-ish of 100k: assignment is |v| x 256 native sqL2,
    // the per-cell pair scan ~ |v|^2/256 candidate grain. probe=1 is
    // classic SemDeDup (misses cell-boundary pairs); probe=2 is the
    // multi-probe recall fix at ~2x pair-stage cost.
    for (probe <- Seq(1, 2)) {
      val t2 = System.nanoTime()
      val sem = graft.operators.Ann.semanticDedup(v, "vec_id", "embedding",
        v.filter(col("vec_id") < 256).select(col("vec_id"), col("embedding")),
        threshold = 0.9, probeCells = probe)
      val semDropped = sem.filter(col("kept") === 0).count()
      println(f"SCALE semantic dedup (256 cells, probe=$probe): " +
        f"${(System.nanoTime() - t2) / 1e9}%.1f s ($semDropped dropped)")
    }
    // the other recall lever: representative (k-means) centroids instead
    // of arbitrary seed vectors
    val t3 = System.nanoTime()
    val trained = graft.operators.Ann.trainCentroids(
      v.sample(withReplacement = false, 0.2, seed = 42L), "embedding",
      k = 256, seed = 42L, maxIter = 10)
    val semT = graft.operators.Ann.semanticDedup(v, "vec_id", "embedding",
      trained.toDF("vec_id", "embedding"), threshold = 0.9, probeCells = 1)
    val semTDropped = semT.filter(col("kept") === 0).count()
    println(f"SCALE semantic dedup (256 k-means cells, probe=1, " +
      f"incl. training on a 20%% sample): " +
      f"${(System.nanoTime() - t3) / 1e9}%.1f s ($semTDropped dropped)")
    spark.stop()
  }
}

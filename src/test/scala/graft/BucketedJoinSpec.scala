package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Storage-partitioned (co-bucketed) joins: two catalog tables created
  * PARTITIONED BY (bucket(n, k)) report KeyGroupedPartitioning from
  * their DSv2 scans, so a join carrying the bucket column equality runs
  * with ZERO Exchange — at 100 TB the fact-fact shuffle this removes is
  * the single largest cost in the engine. Deletion vectors, renamed/
  * dropped columns, evolved specs and shallow-clone chains stay NATIVE
  * (permanent metadata states must not forfeit the optimizer tier); the
  * remaining fallback pin: over-bound DVs silently revert to the mature
  * V1 bridge, trading the optimization for unchanged semantics. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkTables(ns: String, buckets: Int): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns")
    spark.sql(s"CREATE TABLE graft_lake.$ns.a (k BIGINT, v DOUBLE) " +
      s"PARTITIONED BY (bucket($buckets, k))")
    spark.sql(s"CREATE TABLE graft_lake.$ns.b (k BIGINT, w DOUBLE) " +
      s"PARTITIONED BY (bucket($buckets, k))")
    // the generated k_bucket derives at the write boundary (NULL → the
    // defining expression), so INSERT never spells the layout
    spark.sql(s"INSERT INTO graft_lake.$ns.a " +
      "SELECT id AS k, CAST(id AS DOUBLE) * 1.5 AS v, NULL FROM range(0, 500)")
    // b covers only part of the key space: some buckets are thinner or
    // missing on one side — pushPartValues alignment territory
    spark.sql(s"INSERT INTO graft_lake.$ns.b " +
      "SELECT id * 3 AS k, CAST(id AS DOUBLE) AS w, NULL FROM range(0, 150)")
  }

  private def dropTables(ns: String): Unit = {
    spark.sql(s"DROP TABLE graft_lake.$ns.a")
    spark.sql(s"DROP TABLE graft_lake.$ns.b")
    spark.sql(s"DROP NAMESPACE graft_lake.$ns")
  }

  private val joinSql =
    (ns: String) => s"""SELECT a.k, a.v, b.w
                       |FROM graft_lake.$ns.a a JOIN graft_lake.$ns.b b
                       |  ON a.k = b.k AND a.k_bucket = b.k_bucket""".stripMargin

  test("co-bucketed tables join with ZERO Exchange and match the shuffled result") {
    mkTables("spj", buckets = 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(joinSql("spj"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      assert(p.contains("BatchScan"), s"expected the DSv2 bucketed scan:\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      // the same query through the V1 bridge (bucketed scan disabled):
      // identical rows, shuffled plan — the optimization changes the
      // plan, never the answer
      val (ref, refPlan) = withConf(GraftBucketedScanConf -> "false") {
        val r = spark.sql(joinSql("spj"))
        (r.as[(Long, Double, Double)].collect().toSeq.sorted,
          r.queryExecution.executedPlan.toString)
      }
      assert(refPlan.contains("Exchange"),
        s"the fallback path should shuffle (sanity):\n$refPlan")
      assert(got == ref)
      assert(got.size == 150 && got.head == ((0L, 0.0, 0.0)))
    } finally dropTables("spj")
  }

  test("aggregation over the bucket key reuses the reported partitioning") {
    mkTables("spjagg", buckets = 4)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // per-bucket aggregate: grouping on the partition key needs no
      // exchange either — the scan's KeyGroupedPartitioning satisfies
      // the aggregate's distribution
      val agg = spark.sql("SELECT k_bucket, count(*) AS n, sum(v) AS sv " +
        "FROM graft_lake.spjagg.a GROUP BY k_bucket")
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"group-by on the bucket column must not shuffle:\n$p")
      assert(agg.as[(String, Long, Double)].collect().map(_._2).sum == 500L)
      // the SOURCE key too: bucket(n, k) partitioning is a function of
      // k, so GROUP BY k needs no exchange either under the transform
      // reporting — the natural aggregation shape, no generated column
      // spelled anywhere
      val aggK = spark.sql(
        "SELECT k, sum(v) AS sv FROM graft_lake.spjagg.a GROUP BY k")
      val pk = aggK.queryExecution.executedPlan.toString
      assert(!pk.contains("Exchange"),
        s"group-by on the bucket SOURCE key must not shuffle:\n$pk")
      assert(aggK.count() == 500L)
    } finally dropTables("spjagg")
  }

  test("the NATURAL join shape (ON a.k = b.k) gets the conjunct injected: zero Exchange") {
    mkTables("spjnat", buckets = 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // no bucket column spelled anywhere — the optimizer rule injects
      // the implied equality and SPJ fires
      val df = spark.sql(
        s"""SELECT a.k, a.v, b.w FROM graft_lake.spjnat.a a
           |JOIN graft_lake.spjnat.b b ON a.k = b.k""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"natural-shape co-bucketed join must not shuffle:\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      assert(got.size == 150 && got.head == ((0L, 0.0, 0.0)))
      // the injected conjunct must not leak into the join's output
      assert(df.columns.toSeq == Seq("k", "v", "w"))
      // with the conjunct rule disabled the natural shape STILL runs
      // zero-Exchange: the scan reports the bucket TRANSFORM over the
      // source column (resolved via the catalog's FunctionCatalog), so
      // `ON a.k = b.k` co-partitions without any generated-column
      // equality — the rule is defense in depth for single-column
      // layouts, the co-partitioning vehicle for multi-column ones
      val ruleless = withConf("spark.graft.autoBucketJoin.enabled" -> "false") {
        val r = spark.sql(
          s"""SELECT a.k, a.v, b.w FROM graft_lake.spjnat.a a
             |JOIN graft_lake.spjnat.b b ON a.k = b.k""".stripMargin)
        assert(!r.queryExecution.executedPlan.toString.contains("Exchange"),
          "transform-reported clustering must co-partition the natural shape on its own")
        r.as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ruleless)
      // the V1 bridge is the shuffled reference (and still agrees)
      val ref = withConf(GraftBucketedScanConf -> "false") {
        val r = spark.sql(
          s"""SELECT a.k, a.v, b.w FROM graft_lake.spjnat.a a
             |JOIN graft_lake.spjnat.b b ON a.k = b.k""".stripMargin)
        assert(r.queryExecution.executedPlan.toString.contains("Exchange"))
        r.as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ref)
    } finally dropTables("spjnat")
  }

  test("an ALIASED join key (other column renamed to the source name) must NOT inject") {
    mkTables("spjalias", buckets = 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // the left leg's `k` is NOT the stored source column — it is
      // floor(v) renamed to k. The stored k_bucket hashed the REAL k,
      // so injecting `a.k_bucket = b.k_bucket` here would silently drop
      // rows where hash(floor(v)) lands in a different bucket than
      // hash(k). The rule must match join keys by attribute IDENTITY
      // (exprId against the relation's own source column), not name.
      val q =
        s"""SELECT x.k, b.w FROM
           |  (SELECT CAST(v AS BIGINT) AS k FROM graft_lake.spjalias.a) x
           |JOIN graft_lake.spjalias.b b ON x.k = b.k""".stripMargin
      val got = spark.sql(q).as[(Long, Double)].collect().toSeq.sorted
      val ref = withConf("spark.graft.autoBucketJoin.enabled" -> "false") {
        spark.sql(q).as[(Long, Double)].collect().toSeq.sorted
      }
      assert(got == ref, "aliased-key join must agree with the rule disabled")
      assert(got.nonEmpty)
      // sanity: the legitimate pass-through Project shape still injects
      val nat = spark.sql(
        s"""SELECT x.k, b.w FROM (SELECT k FROM graft_lake.spjalias.a) x
           |JOIN graft_lake.spjalias.b b ON x.k = b.k""".stripMargin)
      assert(!nat.queryExecution.executedPlan.toString.contains("Exchange"),
        "pass-through projection must still get the conjunct injected")
    } finally dropTables("spjalias")
  }

  test("bucket layouts default to optimized writes: O(buckets) files per commit") {
    mkTables("spjow", buckets = 4)
    try {
      val root = sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_warehouse/spjow/a"
      val st = graft.sources.ManifestTable.current(spark, root).get
      assert(st.tags.get("write.optimized").contains("true"),
        s"bucket layout should default write.optimized, tags: ${st.tags}")
      // the 500-row multi-task INSERT landed ~one file per live bucket,
      // not tasks × buckets splinters
      assert(st.files.size <= 8, s"expected O(buckets) files, got ${st.files.size}")
    } finally dropTables("spjow")
  }

  test("runtime filters (DPP) re-prune fact files through the batch scan") {
    val ns0 = "spjdpp"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.fact (day STRING, v BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.dim (day STRING, flag BIGINT)")
    spark.sql(s"INSERT INTO graft_lake.$ns0.fact " +
      "SELECT concat('2026-01-0', CAST(1 + id % 5 AS STRING)), id FROM range(0, 500)")
    spark.sql(s"INSERT INTO graft_lake.$ns0.dim VALUES " +
      "('2026-01-01', 1), ('2026-01-02', 0), ('2026-01-03', 0), " +
      "('2026-01-04', 0), ('2026-01-05', 0)")
    try {
      val df = spark.sql(
        s"""SELECT sum(f.v) AS sv FROM graft_lake.$ns0.fact f
           |JOIN graft_lake.$ns0.dim d ON f.day = d.day
           |WHERE d.flag = 1""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("RuntimeFilters: [dynamicpruning"),
        s"expected a dynamic-pruning runtime filter on the fact scan:\n$p")
      // sum over day 2026-01-01 = ids with id % 5 == 0: 0+5+...+495
      assert(df.as[Long].head() == (0L until 500L by 5).sum)
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.fact")
      spark.sql(s"DROP TABLE graft_lake.$ns0.dim")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("runtime filtering under the key-grouped shape keeps the frozen bucket-key set") {
    // a star-shaped runtime filter may drop a bucketed fact's files
    // wholesale (I/O win), but the reported partition-value set must
    // not move under the planner: a fully-pruned bucket plans an EMPTY
    // partition under its key instead of vanishing.
    val ns0 = "spjrf"
    val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.f (k BIGINT, day STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    // two commits with file-constant day values → per-file min=max
    // bounds make day exactly prunable at file grain
    spark.sql(s"INSERT INTO graft_lake.$ns0.f " +
      "SELECT id, 'a', NULL FROM range(0, 100)")
    spark.sql(s"INSERT INTO graft_lake.$ns0.f " +
      "SELECT id, 'b', NULL FROM range(100, 200)")
    try {
      val root = s"$wh/$ns0/f"
      val st = ManifestTable.current(spark, root).get
      val schema = graft.sources.ManifestTable.read(spark, root).schema
      def freshScan() = graft.sources.v2.GraftBatchScan.tryBuild(root, None, st,
        Array.empty, schema, schema).get.toBatch
        .asInstanceOf[graft.sources.v2.GraftBatchScan]
      def keysOf(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
        parts.map(_.asInstanceOf[graft.sources.v2.GraftBucketPartition].bucket)
          .distinct.sorted.toSeq
      val full = freshScan()
      val allParts = full.planInputPartitions()
      val allKeys = keysOf(allParts)
      assert(allKeys.size == 4 && allParts.forall(
        _.asInstanceOf[graft.sources.v2.GraftBucketPartition].files.nonEmpty))
      // a filter that halves the files: every bucket keeps its key
      val half = freshScan()
      half.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.EqualTo("day", "a")))
      val halfParts = half.planInputPartitions()
      assert(keysOf(halfParts) == allKeys, "pruning must not move the key set")
      assert(halfParts.length < allParts.length,
        "the runtime filter should have dropped the day='b' files")
      // a filter matching NOTHING: all buckets plan empty, keys intact
      val none = freshScan()
      none.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.EqualTo("day", "zzz")))
      val noneParts = none.planInputPartitions()
      assert(keysOf(noneParts) == allKeys)
      assert(noneParts.forall(
        _.asInstanceOf[graft.sources.v2.GraftBucketPartition].files.isEmpty))
      // end to end: a broadcast star join's DPP filter reaches the
      // bucketed fact and the answer is exact
      spark.sql(s"CREATE TABLE graft_lake.$ns0.d (day STRING, flag BIGINT)")
      spark.sql(s"INSERT INTO graft_lake.$ns0.d VALUES ('a', 1), ('b', 0)")
      val q = spark.sql(
        s"""SELECT sum(f.k) AS sk FROM graft_lake.$ns0.f f
           |JOIN graft_lake.$ns0.d d ON f.day = d.day WHERE d.flag = 1""".stripMargin)
      assert(q.as[Long].head() == (0L until 100L).sum)
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.f")
      spark.sql(s"DROP TABLE IF EXISTS graft_lake.$ns0.d")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("deletion vectors stay NATIVE: SPJ keeps zero Exchange under MoR deletes") {
    mkTables("spjdv", buckets = 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val rootA = sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_warehouse/spjdv/a"
      // MoR delete plants a deletion vector on the LEFT side. DVs only
      // REMOVE rows, so KeyGroupedPartitioning stays valid — the native
      // scan applies positions inline and the co-bucketed join keeps
      // its zero-Exchange plan (a 100 TB fact table under targeted
      // deletes is the NORMAL state; it must not lose the optimizer
      // tier until the next OPTIMIZE)
      ManifestTable.deleteMoR(spark, rootA, col("k") % 10L === 3L)
      val df = spark.sql(joinSql("spjdv"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BatchScan"), s"DV'd table must stay native:\n$p")
      assert(!p.contains("Exchange"),
        s"DV'd co-bucketed join must still not shuffle:\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      val ref = withConf(GraftBucketedScanConf -> "false") {
        spark.sql(joinSql("spjdv")).as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ref, "inline DV application must match the V1 anti-join")
      // b.k = 3i (i<150) matched a.k 0..499; deleting a.k % 10 == 3
      // removes the k ≡ 3 (mod 10) multiples of 3
      assert(got.nonEmpty && got.size < 150 &&
        !got.exists { case (k, _, _) => k % 10L == 3L })
      // a plain filtered read over the DV'd table is also native + right
      val sel = spark.sql("SELECT k, v FROM graft_lake.spjdv.a WHERE k < 6 ORDER BY k")
      assert(sel.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(sel.as[(Long, Double)].collect().toSeq ==
        Seq((0L, 0.0), (1L, 1.5), (2L, 3.0), (4L, 6.0), (5L, 7.5)))
    } finally dropTables("spjdv")
  }

  test("a TARGETED MoR delete (one DV'd file among clean ones) stays readable") {
    // regression: supportColumnarReads must be a SCAN-level verdict —
    // Spark refuses mixed row/columnar input partitions, and a delete
    // touching ONE file used to demote only that partition
    mkTables("spjone", buckets = 8)
    try {
      val rootA = sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_warehouse/spjone/a"
      ManifestTable.deleteMoR(spark, rootA, col("k") === 7L)
      val dvd = ManifestTable.current(spark, rootA).get.files.count(_.dv.nonEmpty)
      assert(dvd == 1, s"the targeted delete should DV exactly one file, got $dvd")
      // full-table scan across mixed clean/DV'd partitions
      val all = spark.sql("SELECT k, v FROM graft_lake.spjone.a")
      assert(all.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(all.count() == 499 &&
        all.filter(col("k") === 7L).count() == 0)
      // and the co-bucketed join over the same mixed state
      val j = spark.sql(joinSql("spjone"))
      val got = j.as[(Long, Double, Double)].collect().toSeq.sorted
      val ref = withConf(GraftBucketedScanConf -> "false") {
        spark.sql(joinSql("spjone")).as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ref && got.nonEmpty)
    } finally dropTables("spjone")
  }

  test("a table-sized DV (above the inline bound) falls back to the V1 anti-join") {
    mkTables("spjfall", buckets = 4)
    try {
      val rootA = sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_warehouse/spjfall/a"
      ManifestTable.deleteMoR(spark, rootA, col("k") === 3L)
      // shrink the inline bound below this DV's cardinality (1 row):
      // the distributed anti-join is the right shape for deletes that
      // approach the table's own size
      withConf(graft.sources.v2.GraftBatchScan.MaxInlineDvRowsKey -> "0") {
        val df = spark.sql("SELECT k, v FROM graft_lake.spjfall.a WHERE k < 6 ORDER BY k")
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BatchScan"), s"over-bound DV table must fall back:\n$p")
        assert(df.as[(Long, Double)].collect().toSeq ==
          Seq((0L, 0.0), (1L, 1.5), (2L, 3.0), (4L, 6.0), (5L, 7.5)))
      }
    } finally dropTables("spjfall")
  }

  test("partially-clustered distribution splits a hot bucket across its files") {
    val ns0 = "spjskew"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.a (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.b (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    // three commits → three files per live bucket on the fact side,
    // with ~40% of rows planted on one hot key (all in ONE bucket)
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft_lake.$ns0.a " +
        s"SELECT CASE WHEN id % 5 < 2 THEN 42 ELSE id END AS k, " +
        s"CAST(id AS DOUBLE) AS v, NULL FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    spark.sql(s"INSERT INTO graft_lake.$ns0.b " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS w, NULL FROM range(0, 3000)")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val q = joinSql(ns0)
      // default posture: same-key partitions COALESCE — one task per
      // live bucket, zero Exchange (the classic SPJ shape)
      val base = spark.sql(q)
      assert(!base.queryExecution.executedPlan.toString.contains("Exchange"))
      val baseRows = base.as[(Long, Double, Double)].collect().toSeq.sorted
      assert(base.rdd.getNumPartitions == 4,
        s"grouped SPJ should run one task per live bucket, " +
          s"got ${base.rdd.getNumPartitions}")
      // skew posture: Spark keeps the larger side's PER-FILE partitions
      // (our scan plans one per (bucket, file)) and replicates the
      // smaller side's groups — the hot bucket becomes as many tasks as
      // it has files instead of one straggler, still with zero Exchange
      val split = withConf(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true") {
        val df = spark.sql(q)
        assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
          "partially-clustered SPJ must stay shuffle-free")
        assert(df.rdd.getNumPartitions > 4,
          s"expected per-file tasks under partially-clustered " +
            s"distribution, got ${df.rdd.getNumPartitions}")
        df.as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(split == baseRows,
        "partially-clustered execution must return the grouped answer")
      // 40% of each insert's 1000 ids plant k=42 (+ the real id=42 row)
      assert(baseRows.count(_._1 == 42L) == 1201,
        "the planted hot key carries ~40% of the fact rows")
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.a")
      spark.sql(s"DROP TABLE graft_lake.$ns0.b")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("COMPATIBLE bucket counts (2:1) co-partition via ReducibleFunction: zero Exchange") {
    // 16-vs-32 layouts are arithmetically reducible — pmod(h,32) mod 16
    // = pmod(h,16) — and the scan now reports the bucket TRANSFORM
    // (GraftBoundBucket, a ReducibleFunction through the catalog's
    // FunctionCatalog), so Spark reduces the finer side's partition
    // values onto the coarser side's and the join never shuffles.
    val ns0 = "spjmix"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.a (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, k))")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.b (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(32, k))")
    spark.sql(s"INSERT INTO graft_lake.$ns0.a " +
      "SELECT id AS k, CAST(id AS DOUBLE) * 1.5 AS v, NULL FROM range(0, 500)")
    spark.sql(s"INSERT INTO graft_lake.$ns0.b " +
      "SELECT id * 3 AS k, CAST(id AS DOUBLE) AS w, NULL FROM range(0, 150)")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val sql =
        s"""SELECT a.k, a.v, b.w FROM graft_lake.$ns0.a a
           |JOIN graft_lake.$ns0.b b ON a.k = b.k""".stripMargin
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"divisible bucket counts must reduce, not shuffle:\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      assert(got.size == 150 && got.head == ((0L, 0.0, 0.0)))
      // the V1 bridge is the shuffled reference — identical rows
      val ref = withConf(GraftBucketedScanConf -> "false") {
        val r = spark.sql(sql)
        assert(r.queryExecution.executedPlan.toString.contains("Exchange"))
        r.as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ref)
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.a")
      spark.sql(s"DROP TABLE graft_lake.$ns0.b")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("NON-DIVISIBLE bucket counts still refuse co-partitioning: shuffled, same answer") {
    // 12 vs 18: neither count divides the other, no reducer exists on
    // either side (GraftBoundBucket.reducer returns null), and the
    // join must fall back to the honest shuffle.
    val ns0 = "spjnodiv"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.a (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(12, k))")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.b (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(18, k))")
    spark.sql(s"INSERT INTO graft_lake.$ns0.a " +
      "SELECT id AS k, CAST(id AS DOUBLE) * 1.5 AS v, NULL FROM range(0, 500)")
    spark.sql(s"INSERT INTO graft_lake.$ns0.b " +
      "SELECT id * 3 AS k, CAST(id AS DOUBLE) AS w, NULL FROM range(0, 150)")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        s"""SELECT a.k, a.v, b.w FROM graft_lake.$ns0.a a
           |JOIN graft_lake.$ns0.b b ON a.k = b.k""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Exchange"),
        s"non-divisible bucket counts must shuffle (no false co-partitioning):\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      assert(got.size == 150 && got.head == ((0L, 0.0, 0.0)))
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.a")
      spark.sql(s"DROP TABLE graft_lake.$ns0.b")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("renamed columns stay NATIVE: scan, filters, and the SPJ keep zero Exchange") {
    mkTables("spjren", buckets = 4)
    try {
      val rootA = sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_warehouse/spjren/a"
      // rename a plain DATA column — a PERMANENT metadata state that
      // must not forfeit the native scan (layout columns and bucket
      // sources can never be renamed, so the mapping is a pure
      // reader-boundary translation)
      ManifestTable.renameColumn(spark, rootA, "v", "val")
      val df = spark.sql("SELECT k, val FROM graft_lake.spjren.a WHERE k < 3 ORDER BY k")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BatchScan"), s"renamed table must stay native:\n$p")
      assert(df.as[(Long, Double)].collect().toSeq ==
        Seq((0L, 0.0), (1L, 1.5), (2L, 3.0)))
      // the co-bucketed join THROUGH the rename: still zero Exchange
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val j = spark.sql(
          """SELECT a.k, a.val, b.w
            |FROM graft_lake.spjren.a a JOIN graft_lake.spjren.b b
            |  ON a.k = b.k AND a.k_bucket = b.k_bucket""".stripMargin)
        val jp = j.queryExecution.executedPlan.toString
        assert(!jp.contains("Exchange"),
          s"renamed co-bucketed join must keep zero Exchange:\n$jp")
        assert(jp.contains("BatchScan"), s"expected the DSv2 scan:\n$jp")
        val got = j.as[(Long, Double, Double)].collect().toSeq.sorted
        val ref = withConf(GraftBucketedScanConf -> "false") {
          j.as[(Long, Double, Double)].collect().toSeq.sorted
        }
        assert(got == ref && got.size == 150)
      }
      // a DROPPED column is a permanent state too: native, column gone
      ManifestTable.dropColumn(spark, rootA, "val")
      val d = spark.sql(s"SELECT * FROM graft_lake.spjren.a WHERE k < 2")
      assert(d.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(d.columns.toSeq.sorted == Seq("k", "k_bucket"))
      assert(d.select("k").as[Long].collect().toSeq.sorted == Seq(0L, 1L))
    } finally dropTables("spjren")
  }

  test("evolved specs read NATIVE across mixed eras; unrecorded generated columns decline") {
    val ns0 = "spjevo"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.t (day STRING, k BIGINT, v DOUBLE)")
    val root = sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_warehouse/$ns0/t"
    try {
      // era 1: unpartitioned — `day` lives in the parquet BYTES
      spark.sql(s"INSERT INTO graft_lake.$ns0.t " +
        "SELECT concat('2026-01-0', 1 + id % 3), id, CAST(id AS DOUBLE) " +
        "FROM range(0, 300)")
      ManifestTable.evolvePartitionSpec(spark, root, Seq("day"))
      // era 2: identity-partitioned — `day` is a DIRECTORY value
      spark.sql(s"INSERT INTO graft_lake.$ns0.t " +
        "SELECT concat('2026-01-0', 1 + id % 3), id, CAST(id AS DOUBLE) " +
        "FROM range(300, 500)")
      val df = spark.sql(
        s"SELECT day, k, v FROM graft_lake.$ns0.t WHERE day = '2026-01-02'")
      val p = df.queryExecution.executedPlan.toString
      // per-file era classification: one reader per dir-signature, the
      // scan stays NATIVE (the description names its era-group count)
      assert(p.contains("BatchScan") && p.contains("eras(2)"),
        s"mixed-era read must stay native:\n$p")
      val got = df.as[(String, Long, Double)].collect().toSeq.sorted
      val ref = withConf(GraftBucketedScanConf -> "false") {
        spark.sql(s"SELECT day, k, v FROM graft_lake.$ns0.t " +
          "WHERE day = '2026-01-02'").as[(String, Long, Double)]
          .collect().toSeq.sorted
      }
      assert(got == ref && got.size == 166 + 1) // 100+67 per modulo split
      // evolving ON a generated transform: old files don't record the
      // new column, so a projection including it needs the V1 bridge's
      // expression repair — the native scan must decline
      ManifestTable.evolvePartitionSpec(spark, root, Seq("day", "bucket(4, k)"))
      val g = spark.sql(s"SELECT day, k, k_bucket FROM graft_lake.$ns0.t")
      val gp = g.queryExecution.executedPlan.toString
      assert(!gp.contains("BatchScan"),
        s"unrecorded generated column must fall back to V1 repair:\n$gp")
      assert(g.count() == 500 &&
        g.filter(col("k_bucket").isNull).count() == 0,
        "the V1 repair derives the generated column on every era's rows")
      // a projection NOT touching the unrecorded column stays native
      val h = spark.sql(s"SELECT day, k FROM graft_lake.$ns0.t")
      assert(h.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(h.count() == 500)
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$ns0.t")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns0")
    }
  }

  test("multi-column bucket layouts co-locate composite-key joins: zero Exchange") {
    val ns0 = "spjmk"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.a (k1 BIGINT, k2 BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k1, k2))")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.b (k1 BIGINT, k2 BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, k1, k2))")
    try {
      spark.sql(s"INSERT INTO graft_lake.$ns0.a SELECT id % 40, id % 7, " +
        "CAST(id AS DOUBLE), NULL FROM range(0, 400)")
      spark.sql(s"INSERT INTO graft_lake.$ns0.b SELECT id % 40, id % 7, " +
        "CAST(id AS DOUBLE) * 2, NULL FROM range(0, 100)")
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        // the NATURAL composite-key shape: both member equalities present
        // → the rule injects the tuple-bucket conjunct, SPJ fires
        val df = spark.sql(
          s"""SELECT a.k1, a.k2, a.v, b.w
             |FROM graft_lake.$ns0.a a JOIN graft_lake.$ns0.b b
             |  ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin)
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"composite-key co-bucketed join must not shuffle:\n$p")
        assert(p.contains("BatchScan"), s"expected the DSv2 scan:\n$p")
        val got = df.as[(Long, Long, Double, Double)].collect().toSeq.sorted
        val ref = withConf(GraftBucketedScanConf -> "false") {
          df.as[(Long, Long, Double, Double)].collect().toSeq.sorted
        }
        assert(got == ref && got.nonEmpty)
        // joining on ONE member only must NOT inject: the bucket hashes
        // the TUPLE, so k1 equality alone does not imply bucket equality
        val one = spark.sql(
          s"""SELECT a.k1, COUNT(*) AS n
             |FROM graft_lake.$ns0.a a JOIN graft_lake.$ns0.b b
             |  ON a.k1 = b.k1 GROUP BY a.k1""".stripMargin)
        val op = one.queryExecution.executedPlan.toString
        assert(op.contains("Exchange"),
          s"single-member join must shuffle (no false co-partitioning):\n$op")
        assert(!op.contains("k1_k2_bucket#"),
          s"the tuple-bucket conjunct must not be injected on a member join:\n$op")
        assert(one.collect().nonEmpty)
      }
    } finally dropTables(ns0)
  }

  test("multi-column CROSS-COUNT buckets refuse reduction: shuffled, same answer (pinned)") {
    // The composite-key analogue of the 2:1 compat join CANNOT reduce,
    // by Spark's own resolution contract — pinned here as the recorded
    // decision (r17 verdict #3):
    //  - V2ExpressionUtils.toCatalystTransformOpt (spark-catalyst
    //    4.1.2) guards its BucketTransform branch on refs.length == 1;
    //    ONLY that branch constructs TransformExpression with
    //    numBucketsOpt = Some(n).
    //  - a multi-reference bucket transform falls through to the
    //    generic NamedTransform branch, which resolves the function but
    //    builds TransformExpression(..., numBucketsOpt = None).
    //  - TransformExpression.reducers requires BOTH sides' counts to
    //    call ReducibleFunction.reducer(thisN, other, otherN) — with
    //    None there is no divisor, and the bound function cannot learn
    //    the count any other way (bind() sees the count's TYPE, not its
    //    value).
    // So reporting the tuple transform would buy nothing over identity
    // + the injected conjunct (which already serves equal-count
    // composite joins, test above), and cross-count composite joins pay
    // the honest shuffle. The conjunct rule's ln == rn guard
    // (BucketJoinRule) keeps it from mis-injecting across counts.
    val ns0 = "spjmkx"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$ns0")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.a (k1 BIGINT, k2 BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, k1, k2))")
    spark.sql(s"CREATE TABLE graft_lake.$ns0.b (k1 BIGINT, k2 BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, k1, k2))")
    try {
      spark.sql(s"INSERT INTO graft_lake.$ns0.a SELECT id % 40, id % 7, " +
        "CAST(id AS DOUBLE), NULL FROM range(0, 400)")
      spark.sql(s"INSERT INTO graft_lake.$ns0.b SELECT id % 40, id % 7, " +
        "CAST(id AS DOUBLE) * 2, NULL FROM range(0, 100)")
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val sql =
          s"""SELECT a.k1, a.k2, a.v, b.w
             |FROM graft_lake.$ns0.a a JOIN graft_lake.$ns0.b b
             |  ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin
        val df = spark.sql(sql)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("Exchange"),
          s"cross-count composite buckets must shuffle (no false reduce):\n$p")
        val got = df.as[(Long, Long, Double, Double)].collect().toSeq.sorted
        val ref = withConf(GraftBucketedScanConf -> "false") {
          spark.sql(sql).as[(Long, Long, Double, Double)].collect().toSeq.sorted
        }
        assert(got == ref && got.nonEmpty)
      }
    } finally dropTables(ns0)
  }

  test("transform precedence when BOTH columns are projected is a recorded decision") {
    // r17 changed the reported shape when the source key AND the stored
    // bucket column are both in the projection: the transform wins (it
    // serves source-key joins/aggs, the dominant shape), so a query
    // keying ONLY on the stored column in that projection pays an
    // Exchange it did not in r16. Pinned with both directions: the
    // accepted cost under the default, and the per-session escape
    // hatch (spark.graft.bucket.keyShape=identity) restoring r16.
    mkTables("spjshape", buckets = 4)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // sum over an EXPRESSION defeats the manifest agg pushdown (which
      // would otherwise answer the whole group-by from stats, no
      // Exchange either way) — the reported partitioning must decide
      val sql = "SELECT k_bucket, count(*) AS n, " +
        "CAST(max(k + v) AS BIGINT) AS mk " +
        "FROM graft_lake.spjshape.a GROUP BY k_bucket"
      val auto = spark.sql(sql)
      val pAuto = auto.queryExecution.executedPlan.toString
      assert(pAuto.contains("Exchange"),
        s"under auto the transform shape is reported, so stored-column " +
          s"keying shuffles (the recorded r17 decision):\n$pAuto")
      val rowsAuto = auto.as[(String, Long, Long)].collect().toSeq.sorted
      val rowsId = withConf(graft.sources.v2.GraftBatchScan.KeyShapeKey -> "identity") {
        val id = spark.sql(sql)
        val pId = id.queryExecution.executedPlan.toString
        assert(!pId.contains("Exchange"),
          s"keyShape=identity restores the r16 zero-Exchange shape:\n$pId")
        id.as[(String, Long, Long)].collect().toSeq.sorted
      }
      assert(rowsAuto == rowsId && rowsAuto.map(_._2).sum == 500L)
      // and the escape hatch never costs the join shape IT serves:
      // source-key grouping stays zero-Exchange under auto
      val aggK = spark.sql(
        "SELECT k, sum(v) AS sv FROM graft_lake.spjshape.a GROUP BY k")
      assert(!aggK.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(aggK.count() == 500L)
    } finally dropTables("spjshape")
  }

  test("clone chains keep the NATIVE scan: zero-Exchange SPJ straight off a shallow clone") {
    mkTables("spjclone", buckets = 4)
    val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
    val cloneRoot = s"$wh/spjclone/ac"
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                 "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql("GRAFT CLONE graft_lake.spjclone.a TO graft_lake.spjclone.ac")
      // a LOCAL deletion vector over an INHERITED file: the positions
      // land under the clone root while the parquet bytes stay under
      // the source's — the two indirections the per-generation base
      // resolution and the relPath-keyed DV plumbing must compose
      ManifestTable.deleteMoR(spark, cloneRoot, col("k") === 6L)
      val st = ManifestTable.current(spark, cloneRoot).get
      val schema = ManifestTable.read(spark, cloneRoot).schema
      assert(graft.sources.v2.GraftBatchScan.tryBuild(cloneRoot, None, st,
        Array.empty, schema, schema).nonEmpty,
        "clone-chain state must keep the native scan")
      val sql =
        """SELECT a.k, a.v, b.w
          |FROM graft_lake.spjclone.ac a JOIN graft_lake.spjclone.b b
          |  ON a.k = b.k AND a.k_bucket = b.k_bucket""".stripMargin
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"cloned co-bucketed join must not shuffle either side:\n$p")
      assert(p.contains("BatchScan"), s"expected the DSv2 bucketed scan:\n$p")
      val got = df.as[(Long, Double, Double)].collect().toSeq.sorted
      val ref = withConf(GraftBucketedScanConf -> "false") {
        spark.sql(sql).as[(Long, Double, Double)].collect().toSeq.sorted
      }
      assert(got == ref && got.nonEmpty)
      assert(!got.exists(_._1 == 6L), "the clone's MoR delete must apply inline")
      assert(spark.table("graft_lake.spjclone.a").count() == 500,
        "the SOURCE must be untouched by the clone's delete")
    } finally {
      spark.sql("DROP TABLE graft_lake.spjclone.ac")
      dropTables("spjclone")
    }
  }

  private val GraftBucketedScanConf = graft.sources.v2.GraftBatchScan.EnabledKey
}

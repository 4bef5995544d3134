package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.sources.{FixtureFetcher, HttpSources, Readers, Writers}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("csv reader with schema drops malformed rows") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,price,stock\n1,9.99,5\n2,notanumber,oops\n3,1.50,7\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("price", DoubleType),
      StructField("stock", IntegerType)))
    val got = Readers.csv(spark, s"$dir/in.csv", schema)
    // note: a bare count() would report 3 — Spark skips column parsing for
    // count-only plans, so malformed rows are only dropped when columns
    // are actually materialized
    assert(got.collect().length == 2)
    assert(got.agg(sum($"stock")).as[Long].head() == 12L)
  }

  test("json reader with explicit schema") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id": 1, "name": "a"}
        |{"id": null, "name": "  b "}""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    assert(Readers.json(spark, s"$dir/in.json", schema).count() == 2)
  }

  test("space-delimited text scan (wikipageviews shape), .gz transparent") {
    val dir = tmp()
    val content = "en Page_A 100 0\nde Page_B 50 0\nen Page_C 7 0\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/views"), content)
    val df = Readers.spaceDelimited(spark, s"$dir/views",
      Seq("domain", "title", "count", "size"))
    val en = df.filter($"domain" === "en")
      .select($"title", $"count".cast("int").as("count"))
    assert(en.count() == 2)
    assert(en.agg(sum($"count")).as[Long].head() == 107L)
  }

  test("binary file source reads opaque content") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(s"$dir/blob.bin"),
      Array[Byte](1, 2, 3, 4))
    val df = Readers.binaryFiles(spark, s"$dir/*.bin")
    assert(df.select(length($"content")).as[Int].head() == 4)
  }

  test("fixture fetcher poll + paginated sources") {
    val fetcher = new FixtureFetcher(Map(
      "p1" -> """{"symbol":"BTCUSDT","price":"68285.81"}""",
      "p2" -> """{"symbol":"BTCUSDT","price":"68290.00"}"""))
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("price", StringType)))
    val one = HttpSources.pollJson(spark, fetcher, Map("key" -> "p1"), schema,
      java.time.Instant.parse("2026-01-01T00:00:00Z"))
      .withColumn("price", $"price".cast("double"))
    assert(one.select("price").as[Double].head() == 68285.81)
    assert(one.columns.contains("fetched_at"))
    val paged = HttpSources.paginated(spark, fetcher, schema,
      Iterator(Map("key" -> "p1"), Map("key" -> "p2")))
    assert(paged.count() == 2)
  }

  test("paginatedParallel: parity with the serial path; executor-side fetch e2e") {
    // parity vs the serial driver loop over the same pages
    val pages = (1 to 20).map(i => Map("key" -> s"p$i"))
    val payloads = (1 to 20).map(i =>
      s"p$i" -> s"""{"page":$i,"price":"${i * 1.5}"}""").toMap
    val fetcher = new FixtureFetcher(payloads)
    val schema = StructType(Seq(
      StructField("page", IntegerType), StructField("price", StringType)))
    val serial = HttpSources.paginated(spark, fetcher, schema, pages.iterator)
      .orderBy("page").collect().toSeq
    val parallel = HttpSources.paginatedParallel(spark, fetcher, schema, pages,
      maxConcurrency = 4)
      .orderBy("page").collect().toSeq
    assert(parallel == serial && parallel.size == 20)

    // wire-level e2e: a loopback HTTP server (zero egress), the real
    // HttpFetcher, fetches executed in Spark tasks — the backfill shape
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/klines", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val q = ex.getRequestURI.getRawQuery
      val off = q.split('&').find(_.startsWith("offset=")).get.stripPrefix("offset=")
      val body = s"""{"page":$off,"price":"$off.0"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/klines"
      val httpPages = (1 to 8).map(i => Map("url" -> base, "offset" -> i.toString))
      // single action without a sort: a range-sort would add a sampling
      // pass and re-invoke the fetches (standard lazy-source semantics —
      // the scaladoc tells multi-pass consumers to persist or sink first)
      val got = HttpSources.paginatedParallel(spark,
        new graft.sources.HttpFetcher(), schema, httpPages, maxConcurrency = 4)
        .select("page").as[Int].collect().toSeq.sorted
      assert(got == (1 to 8).toSeq)
      assert(hits.get() == 8)
    } finally server.stop(0)
  }

  test("partitioned write + partition-grained upsert rewrites only fresh keys") {
    val dir = tmp() + "/table"
    val day1 = Seq(("2026-01-01", "a", 1), ("2026-01-02", "b", 1)).toDF("date", "k", "v")
    Writers.partitionedParquet(day1, dir, Seq("date"))
    // dynamic overwrite: only the 01-02 partition is replaced
    val fresh = Seq(("2026-01-02", "b", 99)).toDF("date", "k", "v")
    Writers.upsertPartition(fresh, dir, Seq("date"))
    val got = spark.read.parquet(dir).orderBy("date")
      .select("v").as[Int].collect().toSeq
    assert(got == Seq(1, 99))
  }

  test("upsertDedup merges keep-last within touched partitions") {
    val dir = tmp() + "/dedup"
    val existing = Seq(("2026-01-01", 1L, 10.0), ("2026-01-01", 2L, 20.0))
      .toDF("date", "key", "v")
    Writers.partitionedParquet(existing, dir, Seq("date"))
    val fresh = Seq(("2026-01-01", 2L, 99.0), ("2026-01-01", 3L, 30.0))
      .toDF("date", "key", "v")
    Writers.upsertDedup(spark, fresh, dir, Seq("key"), "v", Seq("date"))
    val got = spark.read.parquet(dir).orderBy("key")
      .select("key", "v").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("upsertDedup first write (no existing table) just lands fresh") {
    val dir = tmp() + "/fresh-only"
    val fresh = Seq(("2026-01-01", 1L, 10.0)).toDF("date", "key", "v")
    Writers.upsertDedup(spark, fresh, dir, Seq("key"), "v", Seq("date"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("commit lock: an interleaved writer is refused, no rows lost") {
    val dir = tmp() + "/locked"
    val batch1 = Seq(("2026-01-01", 1L, 10.0)).toDF("date", "key", "v")
    Writers.upsertDedup(spark, batch1, dir, Seq("key"), "v", Seq("date"))
    // the lock marker does not outlive a successful commit
    val lock = new org.apache.hadoop.fs.Path(dir + "__lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lock))
    // simulate writer A paused between its stale read and its swap: its
    // lock is held. Writer B (upsert), a second compactor, and a
    // partition upsert must all REFUSE — the pre-lock behavior silently
    // dropped B's rows when A's overwrite landed last.
    val batch2 = Seq(("2026-01-01", 2L, 20.0)).toDF("date", "key", "v")
    Writers.withCommitLock(spark, dir) {
      intercept[IllegalStateException] {
        Writers.upsertDedup(spark, batch2, dir, Seq("key"), "v", Seq("date"))
      }
      intercept[IllegalStateException] { Writers.compactParquet(spark, dir) }
      intercept[IllegalStateException] {
        Writers.upsertPartition(batch2, dir, Seq("date"))
      }
    }
    // holder finished -> refused writer retries -> both batches present
    Writers.upsertDedup(spark, batch2, dir, Seq("key"), "v", Seq("date"))
    val got = spark.read.parquet(dir).orderBy("key")
      .select("key", "v").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 20.0)))
    // the lock releases even when the body throws (no stuck table)
    intercept[RuntimeException] {
      Writers.withCommitLock(spark, dir) { sys.error("boom") }
    }
    assert(!fs.exists(lock))
    // and compaction under the lock still works end-to-end
    val (_, after) = Writers.compactParquet(spark, dir)
    assert(after >= 1 && spark.read.parquet(dir).count() == 2)
  }

  test("notify counts after write (atomic side-effect stage)") {
    var sent = -1L
    val n = Writers.notify(Seq(1, 2, 3).toDF("x"), c => sent = c)
    assert(n == 3 && sent == 3)
  }

  test("bucketed tables join with zero shuffle (co-located by write)") {
    val orders = Tables.table(spark, sf(), "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val cust = Tables.table(spark, sf(), "customer")
      .select($"c_custkey", $"c_mktsegment")
    Writers.bucketedTable(orders, "b_orders", tmp() + "/b_orders", "o_custkey", 8)
    Writers.bucketedTable(cust, "b_customer", tmp() + "/b_customer", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      assert(!plan.contains("Exchange"), plan) // the point: no shuffle at all
      assert(joined.count() ==
        orders.join(cust, $"o_custkey" === $"c_custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("compactParquet merges a small-files directory and preserves the data") {
    val dir = tmp() + "/frag"
    val df = spark.range(1000).selectExpr("id", "id % 7 AS k")
    df.repartition(40).write.parquet(dir) // 40 tiny files
    val before = df.collect().map(_.getLong(0)).sorted.toSeq
    val (nBefore, nAfter) = graft.sources.Writers.compactParquet(spark, dir, 512)
    assert(nBefore >= 40 && nAfter == 1, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_bak").exists())
  }

  test("jdbc write + read round-trip against embedded Derby (S18/K6)") {
    // The reference's Postgres pageview_counts sink (create_table.sql +
    // listing_4_20.py:73-78), executed for real against embedded Derby —
    // same Spark JDBC surface as any networked RDBMS.
    val url = s"jdbc:derby:${tmp()}/derbydb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE pageview_counts (pagename VARCHAR(64), pageviewcount INT)")
    finally conn.close()

    val batch1 = Seq(("google", 120), ("facebook", 80)).toDF("pagename", "pageviewcount")
    val batch2 = Seq(("amazon", 65)).toDF("pagename", "pageviewcount")
    Writers.jdbc(batch1, url, "pageview_counts", props)
    Writers.jdbc(batch2, url, "pageview_counts", props) // append, not replace

    val back = Readers.jdbc(spark, url, "pageview_counts", props)
    assert(back.count() == 3)
    assert(back.agg(sum($"pageviewcount")).as[Long].head() == 265L)

    // partitioned parallel read: the scan splits into range queries
    val part = Readers.jdbc(spark, url, "pageview_counts", props,
      partitionColumn = Some(("pageviewcount", 0L, 200L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.select("pagename").as[String].collect().sorted.toSeq ==
      Seq("amazon", "facebook", "google"))
  }

  test("compactParquet preserves hive partition layout (ADVICE r4)") {
    val dir = tmp() + "/part"
    spark.range(200).selectExpr("id", "CAST(id % 3 AS INT) AS k")
      .repartition(10).write.partitionBy("k").parquet(dir)
    val (nb, na) = Writers.compactParquet(spark, dir, 512)
    assert(na == 3 && na < nb, s"$nb -> $na") // one compacted file per partition
    assert(new java.io.File(dir + "/k=0").isDirectory)
    val back = spark.read.parquet(dir)
    assert(back.filter($"k" === 1).count() == 67)
    assert(back.count() == 200)
    // partition pruning still works against the compacted layout
    val plan = back.filter($"k" === 1).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(k"), plan)
  }

  test("compactParquet splits a skewed partition value by target size") {
    val dir = tmp() + "/skew"
    // k=0 carries ~99% of the rows; a key-only repartition would write it
    // as ONE file regardless of targetFileMB
    spark.range(100000)
      .selectExpr("id",
        // ~128 incompressible bytes per row -> k=0 lands well over 1 MB
        "concat(md5(CAST(id AS STRING)), md5(CAST(id + 1 AS STRING)), " +
          "md5(CAST(id + 2 AS STRING)), md5(CAST(id + 3 AS STRING))) AS pad",
        "CAST(CASE WHEN id < 99000 THEN 0 ELSE id % 4 + 1 END AS INT) AS k")
      .repartition(20).write.partitionBy("k").parquet(dir)
    // tiny target (1 MB) so the hot value must split into several files
    val (nb, na) = Writers.compactParquet(spark, dir, 1)
    val hotFiles = new java.io.File(dir + "/k=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(hotFiles > 1, s"hot partition wrote $hotFiles file(s)")
    val back = spark.read.parquet(dir)
    assert(back.count() == 100000)
    assert(back.filter($"k" === 0).count() == 99000)
  }

  test("compactParquet preserves the null partition value") {
    val dir = tmp() + "/nullpart"
    spark.range(100)
      .selectExpr("id",
        "CAST(CASE WHEN id % 10 = 0 THEN NULL ELSE id % 3 END AS INT) AS k")
      .write.partitionBy("k").parquet(dir)
    // null rows land in k=__HIVE_DEFAULT_PARTITION__; a non-null-safe
    // sizing join would drop all 10 of them from the rewrite
    val (nb, na) = Writers.compactParquet(spark, dir, 512)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(back.filter($"k".isNull).count() == 10)
  }

  test("compactParquet refuses non-partition subdirs and bad targetFileMB") {
    val dir = tmp() + "/nested"
    spark.range(10).write.parquet(dir + "/sub1")
    spark.range(10).write.parquet(dir + "/sub2")
    intercept[IllegalArgumentException] { Writers.compactParquet(spark, dir) }
    val flat = tmp() + "/flat"
    spark.range(10).write.parquet(flat)
    intercept[IllegalArgumentException] { Writers.compactParquet(spark, flat, 0) }
    // refusals left the data untouched
    assert(spark.read.parquet(flat).count() == 10)
  }
}

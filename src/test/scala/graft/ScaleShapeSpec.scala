package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Streams

/** Scale-shape demos: bucketed co-located joins and the streaming upsert
  * sink — the storage-layout techniques a 100 TB deployment leans on. */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  test("AQE coalesces an over-partitioned tiny shuffle at runtime") {
    // 32 shuffle partitions configured, but the aggregate output is 10
    // rows — AQE's runtime stats collapse the read side instead of
    // launching 32 near-empty tasks (the mechanism that keeps small
    // stages cheap at any configured parallelism)
    val df = spark.range(1000).groupBy((col("id") % 10).as("k")).count()
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead"), finalPlan)
    assert(finalPlan.contains("coalesced"), finalPlan)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS g_customer_bucketed")
    Tables.orders(spark, sf()).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("g_orders_bucketed")
    Tables.customer(spark, sf()).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("g_customer_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("g_orders_bucketed")
        .join(spark.table("g_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // and it computes the right thing
      val expected = Tables.orders(spark, sf())
        .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_customer_bucketed")
    }
  }

  test("streaming upsert sink: micro-batches merge keep-last into the table") {
    val in = Files.createTempDirectory("ups-in").toString
    val target = Files.createTempDirectory("ups-t").toString + "/table"
    val ckpt1 = Files.createTempDirectory("ups-c1").toString
    val ckpt2 = Files.createTempDirectory("ups-c2").toString

    val batch1 = Seq(("2026-01-01", 1L, 1, 10.0), ("2026-01-01", 2L, 1, 20.0))
      .toDF("date", "key", "version", "v")
    batch1.write.mode("overwrite").parquet(in)
    val q1 = Streams.upsertSink(
      Streams.fileSource(spark, in, batch1.schema), spark, target,
      keys = Seq("key"), order = "version", partitionCols = Seq("date"), ckpt1)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(target).count() == 2)

    // second drop updates key=2 and adds key=3
    val batch2 = Seq(("2026-01-01", 2L, 2, 99.0), ("2026-01-01", 3L, 2, 30.0))
      .toDF("date", "key", "version", "v")
    batch2.write.mode("append").parquet(in + "/b2")
    val q2 = Streams.upsertSink(
      Streams.fileSource(spark, in + "/b2", batch1.schema), spark, target,
      keys = Seq("key"), order = "version", partitionCols = Seq("date"), ckpt2)
    q2.awaitTermination(60000)
    val got = spark.read.parquet(target).orderBy("key")
      .select("key", "v").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }
}

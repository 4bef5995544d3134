package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** `writeStream.format("graft-manifest")` — the exactly-once sink as a
  * registered format: keyed-upsert and append-only modes, first-batch
  * table seeding, replay recognition, and the round-trip back out
  * through the change-feed source. */
class ManifestSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("keyed mode: writeStream.format upserts keep-last, exactly-once tagged") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp() + "/t"
    val ckpt = tmp() + "/ckpt"
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDF().toDF("date", "key", "v")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .option("keys", "key").option("order", "v")
      .partitionBy("date")
      .start(root)
    try {
      input.addData(("2026-01-01", 1L, 10.0), ("2026-01-01", 2L, 20.0))
      q.processAllAvailable()
      input.addData(("2026-01-01", 2L, 99.0), ("2026-01-02", 3L, 30.0))
      q.processAllAvailable()
      assert(ManifestTable.read(spark, root).orderBy("key")
        .select("key", "v").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
      // the batch id committed atomically with the data (replay armor)
      val st = ManifestTable.current(spark, root).get
      assert(st.tags.get(s"stream_batch.$ckpt").exists(_.toLong >= 1L))
      assert(ManifestTable.partitionLayout(spark, root) == Seq("date"))
    } finally q.stop()
  }

  test("append mode: no keys → O(batch) add-only commits; first batch seeds") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp() + "/ev"
    val ckpt = tmp() + "/ckpt"
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("day", "n")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .option("sinkId", "ev1")
      .partitionBy("day")
      .start(root)
    try {
      input.addData(("2026-08-01", 1L), ("2026-08-01", 2L))   // seeds v1
      q.processAllAvailable()
      input.addData(("2026-08-02", 3L))                        // appends v2
      q.processAllAvailable()
      // duplicates are KEPT (append-only semantics, unlike keyed mode)
      input.addData(("2026-08-02", 3L))                        // appends v3
      q.processAllAvailable()
      assert(ManifestTable.read(spark, root).count() == 4)
      val ops = ManifestTable.history(spark, root)
        .orderBy("version").select("op").as[String].collect().toSeq
      assert(ops == Seq("append", "append", "append"))
      // append commits carry everything forward by reference: v2/v3 are
      // delta manifests whose adds are just the batch's files
      assert(ManifestTable.readChanges(spark, root, 1, 2)
        .select("n").as[Long].collect().toSeq == Seq(3L))
      // replaying batch 1 against the same sinkId is refused
      assert(!ManifestTable.commitStreamAppend(spark,
        Seq(("2026-08-02", 3L)).toDF("day", "n"), 1L, root, Seq("day"), "ev1"))
      assert(ManifestTable.read(spark, root).count() == 4)
    } finally q.stop()
  }

  test("sink → change-feed source round trip (lakehouse hop via formats only)") {
    implicit val sqlCtx = spark.sqlContext
    val srcRoot = tmp() + "/hop_src"
    val dstRoot = tmp() + "/hop_dst"
    val input = MemoryStream[(Long, Double)]
    val load = input.toDF().toDF("key", "v")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", tmp() + "/c1")
      .option("keys", "key").option("order", "v")
      .start(srcRoot)
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      load.processAllAvailable()
      // hop: incremental read of the sink's commits into a second table
      val hop = spark.readStream.format("graft-manifest-changes")
        .load(srcRoot)
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", tmp() + "/c2")
        .option("keys", "key").option("order", "v")
        .start(dstRoot)
      try {
        hop.processAllAvailable()
        input.addData((2L, 9.0), (3L, 3.0))
        load.processAllAvailable()
        hop.processAllAvailable()
        assert(ManifestTable.read(spark, dstRoot).orderBy("key")
          .select("key", "v").as[(Long, Double)].collect().toSeq ==
          Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
      } finally hop.stop()
    } finally load.stop()
  }

  test("guard rails: keys without order refused; missing sink identity refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    intercept[Exception] {
      input.toDF().toDF("key", "v")
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", tmp() + "/c")
        .option("keys", "key") // no order
        .start(tmp() + "/t").processAllAvailable()
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Row-level change data feed (Delta CDF re-expressed): opt-in per
  * table, recorded AT WRITE TIME by the row-level mutators as immutable
  * `cdf-*` datasets committed atomically with the mutation, served by
  * readChangeFeed over a version window with `_change_type` /
  * `_commit_version`. Append-only commits derive inserts from their
  * added files for free; rewrites emit nothing; commits that changed
  * rows without a record refuse loudly. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cdf").toString

  private def feed(root: String, from: Long, to: Long): Seq[(Long, Double, String, Long)] =
    ManifestTable.readChangeFeed(spark, root, from, to)
      .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, Double, String, Long)].collect().toSeq.sorted

  test("delete/update/merge record row-level changes; CoW and MoR agree") {
    def run(mor: Boolean): Seq[(Long, Double, String, Long)] = {
      val root = tmp() + (if (mor) "/mor" else "/cow")
      ManifestTable.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("k", "v").repartition(1), root)                           // v1
      ManifestTable.setChangeFeed(spark, root, enabled = true)          // v2
      if (mor) {
        ManifestTable.deleteMoR(spark, root, col("k") === 1L)           // v3
        ManifestTable.updateMoR(spark, root, col("k") === 2L,
          Map("v" -> (col("v") + 5.0)))                                 // v4
        ManifestTable.mergeMoR(spark, root,
          Seq((3L, 99.0), (9L, 90.0)).toDF("k", "v"), keys = Seq("k"))  // v5
      } else {
        ManifestTable.delete(spark, root, col("k") === 1L)
        ManifestTable.update(spark, root, col("k") === 2L,
          Map("v" -> (col("v") + 5.0)))
        ManifestTable.merge(spark, root,
          Seq((3L, 99.0), (9L, 90.0)).toDF("k", "v"), keys = Seq("k"))
      }
      feed(root, 2L, 5L)
    }
    val expected = Seq(
      (1L, 10.0, "delete", 3L),
      (2L, 20.0, "update_preimage", 4L), (2L, 25.0, "update_postimage", 4L),
      (3L, 30.0, "update_preimage", 5L), (3L, 99.0, "update_postimage", 5L),
      (9L, 90.0, "insert", 5L)).sorted
    assert(run(mor = false) == expected, "copy-on-write feed")
    assert(run(mor = true) == expected, "merge-on-read feed")
  }

  test("a by-source merge records deletes/updates for the unmatched target rows") {
    val root = tmp() + "/bysrc"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("k", "v").repartition(1), root)                             // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)            // v2
    // sync-to-source: k=2 updates, k=4 inserts, k=1/k=3 fall away
    ManifestTable.merge(spark, root,
      Seq((2L, 99.0), (4L, 40.0)).toDF("k", "v"), keys = Seq("k"),
      notMatchedBySource = Some(ManifestTable.SourceMissDelete))        // v3
    assert(feed(root, 2L, 3L) == Seq(
      (1L, 10.0, "delete", 3L),
      (2L, 20.0, "update_preimage", 3L), (2L, 99.0, "update_postimage", 3L),
      (3L, 30.0, "delete", 3L),
      (4L, 40.0, "insert", 3L)).sorted)
    // flag-stale flavor
    ManifestTable.merge(spark, root,
      Seq((2L, 100.0)).toDF("k", "v"), keys = Seq("k"),
      insertUnmatched = false,
      notMatchedBySource = Some(ManifestTable.SourceMissUpdate(
        Map("v" -> (col("v") * -1.0)))))                                // v4
    assert(feed(root, 3L, 4L) == Seq(
      (2L, 99.0, "update_preimage", 4L), (2L, 100.0, "update_postimage", 4L),
      (4L, 40.0, "update_preimage", 4L), (4L, -40.0, "update_postimage", 4L)).sorted)
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((2L, 100.0), (4L, -40.0)))
  }

  test("append-only commits derive inserts for free; rewrites emit nothing") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0), (3L, 30.0)).toDF("k", "v")
      .repartition(1), root)                                                 // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)                 // v2
    // MERGE with no matches = pure insert path (still a recorded commit)
    ManifestTable.merge(spark, root, Seq((2L, 20.0)).toDF("k", "v"),
      keys = Seq("k"))                                                       // v3
    ManifestTable.compactSmallFiles(spark, root,
      smallFileMB = 64, targetFileMB = 64)                                   // v4 (rewrite)
    ManifestTable.delete(spark, root, col("k") === 1L)                       // v5
    assert(feed(root, 2L, 5L) == Seq(
      (1L, 10.0, "delete", 5L),
      (2L, 20.0, "insert", 3L)).sorted)
    // MatchDelete through the feed
    ManifestTable.mergeMoR(spark, root, Seq((2L, 0.0)).toDF("k", "v"),
      keys = Seq("k"), whenMatched = ManifestTable.MatchDelete,
      insertUnmatched = false)                                               // v6
    assert(feed(root, 5L, 6L) == Seq((2L, 20.0, "delete", 6L)))
  }

  test("keyed upserts record exact diffs: update pre+post, insert, no-op cancels") {
    val root = tmp() + "/ups"
    ManifestTable.write(Seq((1L, 10.0, "p1"), (2L, 20.0, "p1"), (3L, 30.0, "p2"))
      .toDF("k", "v", "p").repartition(1), root,
      partitionCols = Seq("p"))                                      // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)         // v2
    // batch: k=1 changes value (update), k=2 arrives IDENTICAL (no-op,
    // nothing emitted), k=4 is new (insert); p2 untouched (carried)
    ManifestTable.upsertDedup(spark,
      Seq((1L, 11.0, "p1"), (2L, 20.0, "p1"), (4L, 40.0, "p1"))
        .toDF("k", "v", "p"), root,
      keys = Seq("k"), order = "v", partitionCols = Seq("p"))        // v3
    val got = ManifestTable.readChangeFeed(spark, root, 2L, 3L)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 10.0, "update_preimage", 3L), (1L, 11.0, "update_postimage", 3L),
      (4L, 40.0, "insert", 3L)).sorted)
    // the exactly-once STREAMING path (idempotentUpsert = the sink's
    // commit primitive) records its diff too — sink → CDC chains compose
    ManifestTable.idempotentUpsert(spark,
      Seq((4L, 44.0, "p1")).toDF("k", "v", "p"), root,
      keys = Seq("k"), order = "v", appId = "job1", appVersion = 1L,
      partitionCols = Seq("p"))                                      // v4
    assert(ManifestTable.readChangeFeed(spark, root, 3L, 4L)
      .select("k", "v", "_change_type").as[(Long, Double, String)]
      .collect().toSeq.sorted == Seq(
        (4L, 40.0, "update_preimage"), (4L, 44.0, "update_postimage")))
  }

  test("a row-changing commit without a record refuses; empty windows are typed") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0)).toDF("k", "v"), root)   // v1
    ManifestTable.delete(spark, root, col("k") === 1000L)       // no-op: no commit
    ManifestTable.update(spark, root, col("k") === 1L,
      Map("v" -> lit(11.0)))                                    // v2, feed OFF
    val e = intercept[RuntimeException] {
      ManifestTable.readChangeFeed(spark, root, 1L, 2L).collect()
    }
    assert(e.getMessage.contains("without a change record"))
    // empty window: schema-typed zero-row frame
    ManifestTable.setChangeFeed(spark, root, enabled = true)    // v3
    val empty = ManifestTable.readChangeFeed(spark, root, 2L, 3L)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("k", "v", "_change_type", "_commit_version"))
  }

  test("streaming CDC: readChangeFeed=true serves row-level batches with AvailableNow") {
    val root = tmp() + "/stream"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .repartition(1), root)                                     // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)     // v2
    ManifestTable.delete(spark, root, col("k") === 1L)           // v3
    ManifestTable.update(spark, root, col("k") === 2L,
      Map("v" -> lit(21.0)))                                     // v4

    val q = spark.readStream
      .format("graft-manifest-changes")
      .option("path", root)
      .option("readChangeFeed", "true")
      .option("startingversion", "2") // post-enable history only
      .load()
      .writeStream.format("memory").queryName("cdc_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cdc_sink")
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 10.0, "delete", 3L),
      (2L, 20.0, "update_preimage", 4L),
      (2L, 21.0, "update_postimage", 4L)).sorted)
  }

  test("vacuum retains referenced change datasets and reclaims dropped ones") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .repartition(1), root)                                    // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)    // v2
    ManifestTable.delete(spark, root, col("k") === 1L)          // v3 (+cdf)
    ManifestTable.update(spark, root, col("k") === 2L,
      Map("v" -> lit(21.0)))                                    // v4 (+cdf)
    def cdfDirs(): Set[String] = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("cdf-")).toSet
    assert(cdfDirs().size == 2)
    // keep=2 retains v3..v4 → both cdf dirs still referenced
    ManifestTable.vacuum(spark, root, keep = 2)
    assert(cdfDirs().size == 2)
    assert(feed(root, 3L, 4L).map(_._3).sorted ==
      Seq("update_postimage", "update_preimage"))
    // keep=1 (need a snapshot at/below the floor): compact commits one
    ManifestTable.compact(spark, root, targetFileMB = 64)       // v5 snapshot
    ManifestTable.vacuum(spark, root, keep = 1)
    assert(cdfDirs().isEmpty, "dropped manifests' change datasets reclaimed")
  }

  test("feed on a renamed table serves each commit under its own logical names") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .repartition(1), root)                                    // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)    // v2
    ManifestTable.delete(spark, root, col("v") === 10.0)        // v3: columns k,v
    ManifestTable.renameColumn(spark, root, "v", "price")       // v4
    ManifestTable.update(spark, root, col("price") === 20.0,
      Map("price" -> lit(21.0)))                                // v5: columns k,price
    val df = ManifestTable.readChangeFeed(spark, root, 2L, 5L)
    // union-by-name across the rename: both logical names present,
    // each commit's rows under the name that was live at its commit
    assert(df.columns.toSet == Set("k", "v", "price", "_change_type", "_commit_version"))
    val rows = df.select("k", "v", "price", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getString(3), r.getLong(4))).toSet
    assert(rows == Set(
      (1L, Some(10.0), None, "delete", 3L),
      (2L, None, Some(20.0), "update_preimage", 5L),
      (2L, None, Some(21.0), "update_postimage", 5L)))
  }
}

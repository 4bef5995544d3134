package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** The registered `graft-manifest` data source: DataFrame/SQL reads with
  * pushdown-driven manifest file pruning, time travel via option, and
  * keyed-upsert writes — each asserting identical rows to the
  * programmatic API plus (for pruning) fewer files scanned. */
class ManifestRelationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-rel").toString

  test("format('graft-manifest') round-trips reads, SQL WHERE prunes files") {
    val root = tmp() + "/t"
    val df = (0 until 200).map(i => (s"d${i % 4}", i.toLong, i * 0.5)).toDF("day", "id", "v")
    ManifestTable.write(df, root, partitionCols = Seq("day"))

    val rel = spark.read.format("graft-manifest").load(root)
    assert(rel.count() == 200)
    assert(rel.schema.fieldNames.sorted.toSeq == Seq("day", "id", "v"))

    // SQL over the relation: the WHERE reaches buildScan as a source
    // filter, converts to a Column, and prunes manifest files
    rel.createOrReplaceTempView("graft_rel_t")
    val filtered = spark.sql("SELECT id, v FROM graft_rel_t WHERE day = 'd2'")
    val expect = ManifestTable.read(spark, root).filter(col("day") === "d2")
      .select("id", "v").orderBy("id").collect().toSeq
    assert(filtered.orderBy("id").collect().toSeq == expect)
    val allFiles = ManifestTable.current(spark, root).get.files.size
    assert(filtered.rdd.getNumPartitions <= allFiles) // sanity: it executed
    // the pruning itself: readWhere path scans 1 partition's files
    assert(ManifestTable.readWhere(spark, root, col("day") === "d2")
      .inputFiles.length < allFiles)

    // COUNT(*) with zero required columns keeps the correct row count
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_rel_t WHERE day = 'd1'")
      .as[Long].collect().toSeq == Seq(50L))
  }

  test("weak filter conversion never loses rows: NOT over partially-convertible AND") {
    val root = tmp() + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "s", "v")
      .write.format("graft-manifest").mode("overwrite").save(root)
    val rel = spark.read.format("graft-manifest").load(root)
    rel.createOrReplaceTempView("graft_rel_not")
    // NOT(s = 'a' AND v < 2.5): if the AND half-converted under NOT, the
    // pruning-layer row filter would be stricter than the query and drop
    // rows 2 and 3
    val got = spark.sql(
      "SELECT id FROM graft_rel_not WHERE NOT (s = 'a' AND v < 2.5) ORDER BY id")
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
    // OR across columns stays whole-or-nothing but weak halves are fine
    assert(spark.sql(
      "SELECT id FROM graft_rel_not WHERE s = 'a' OR v > 2.5 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("changesFrom option exposes incremental windows with pushdown pruning") {
    val root = tmp() + "/t"
    Seq(("d1", 1L)).toDF("day", "id").write.format("graft-manifest")
      .mode("overwrite").option("partitionCols", "day").save(root)
    Seq(("d2", 2L), ("d3", 3L)).toDF("day", "id").write.format("graft-manifest")
      .mode("append").option("keys", "day,id").option("order", "id")
      .option("partitionCols", "day").save(root)
    val win = spark.read.format("graft-manifest")
      .option("changesFrom", 1).load(root)
    assert(win.select("id").as[Long].collect().toSeq.sorted == Seq(2L, 3L))
    // WHERE over the window still prunes (one changed partition scanned)
    val sliced = win.filter(col("day") === "d3")
    assert(sliced.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(ManifestTable.readChangesWhere(spark, root, 1L, 2L, col("day") === "d3")
      .inputFiles.length <
      ManifestTable.readChanges(spark, root, 1L, 2L).inputFiles.length)
    // explicit empty window
    assert(spark.read.format("graft-manifest")
      .option("changesFrom", 2).option("changesTo", 2).load(root).count() == 0)
  }

  test("a changes window is sized from its CHANGED bytes and auto-broadcasts") {
    // an incremental hop joins "what changed since v" against a big
    // fact; without window-scoped sizing the relation reports the
    // defaultSizeInBytes ceiling and the join sort-merges at any scale
    val root = tmp() + "/t"
    Seq((1L, "a")).toDF("id", "s").write.format("graft-manifest")
      .mode("overwrite").save(root)
    Seq((2L, "b")).toDF("id", "s").write.format("graft-manifest")
      .mode("append").option("keys", "id").option("order", "id").save(root)
    val win = spark.read.format("graft-manifest")
      .option("changesFrom", 1).load(root)
    val fact = spark.range(100000).withColumnRenamed("id", "id")
    val p = fact.join(win, "id").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("CREATE TABLE ... USING graft-manifest: catalog tables over the lakehouse") {
    val root = tmp() + "/t"
    Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
      .write.format("graft-manifest").mode("overwrite").save(root)
    spark.sql("DROP TABLE IF EXISTS graft_cat_t")
    spark.sql(s"CREATE TABLE graft_cat_t USING `graft-manifest` OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT k FROM graft_cat_t WHERE n = 2").as[String]
        .collect().toSeq == Seq("b"))
      // the catalog table sees subsequent commits (resolution is per-read)
      Seq(("c", 3L)).toDF("k", "n").write.format("graft-manifest").mode("append")
        .option("keys", "k").option("order", "n").save(root)
      assert(spark.sql("SELECT COUNT(*) FROM graft_cat_t").as[Long]
        .collect().toSeq == Seq(3L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_t")
  }

  test("versionAsOf option time-travels; append mode is the keyed upsert") {
    val root = tmp() + "/t"
    Seq(("d1", 1L, 1.0)).toDF("day", "id", "v")
      .write.format("graft-manifest").mode("overwrite")
      .option("partitionCols", "day").save(root)
    Seq(("d1", 1L, 9.0), ("d2", 2L, 2.0)).toDF("day", "id", "v")
      .write.format("graft-manifest").mode("append")
      .option("keys", "day,id").option("order", "v")
      .option("partitionCols", "day").save(root)
    val now = spark.read.format("graft-manifest").load(root)
      .select("day", "id", "v").as[(String, Long, Double)].collect().toSet
    assert(now == Set(("d1", 1L, 9.0), ("d2", 2L, 2.0)))
    val v1 = spark.read.format("graft-manifest").option("versionAsOf", 1).load(root)
      .select("day", "id", "v").as[(String, Long, Double)].collect().toSet
    assert(v1 == Set(("d1", 1L, 1.0)))
    // append without keys fails loudly (upsert semantics are explicit)
    intercept[RuntimeException] {
      Seq(("d3", 3L, 3.0)).toDF("day", "id", "v")
        .write.format("graft-manifest").mode("append").save(root)
    }
  }

  test("append mergeSchema option: additive evolution through the data source") {
    val root = tmp() + "/t"
    Seq((1L, "a")).toDF("k", "s").write.format("graft-manifest")
      .mode("overwrite").save(root)
    val plus = Seq((2L, "b", 9.0)).toDF("k", "s", "x")
    intercept[Exception] { // schema drift is an error by default
      plus.write.format("graft-manifest").option("keys", "k").option("order", "s")
        .mode("append").save(root)
    }
    plus.write.format("graft-manifest").option("keys", "k").option("order", "s")
      .option("mergeSchema", "true").mode("append").save(root)
    val got = spark.read.format("graft-manifest").load(root)
      .select("k", "x").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(9.0)))
  }
}

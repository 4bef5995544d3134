package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** `graft.`/table/root`` as a first-class SQL relation (injected
  * resolution rule): reads with pruning, time travel, INSERT
  * INTO/OVERWRITE, and the guard rails (schema-mismatch refusal,
  * time-traveled insert refusal, untouched non-graft namespaces). */
class GraftSqlRelationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sqlrel").toString

  test("SELECT over graft.`path` resolves, filters, and joins like any relation") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "g", "v"), root)

    assert(spark.sql(s"SELECT sum(v) FROM graft.`$root` WHERE g = 'a'")
      .as[Double].head() == 40.0)

    // joins + aggregation through the same surface
    Seq(("a", "alpha"), ("b", "beta")).toDF("g", "name")
      .createOrReplaceTempView("dims")
    val joined = spark.sql(
      s"SELECT d.name, count(*) AS n FROM graft.`$root` t JOIN dims d USING (g) " +
        "GROUP BY d.name ORDER BY d.name")
    assert(joined.as[(String, Long)].collect().toSeq ==
      Seq(("alpha", 2L), ("beta", 1L)))
  }

  test("FOR VERSION AS OF and FOR TIMESTAMP AS OF pin snapshots") {
    val root = tmp() + "/tt"
    ManifestTable.write(Seq((1L, 1.0)).toDF("k", "v"), root)              // v1
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(1100) // manifest mtimes have second resolution on some fs
    ManifestTable.upsertDedup(spark, Seq((1L, 2.0), (2L, 5.0)).toDF("k", "v"),
      root, keys = Seq("k"), order = "v")                                 // v2

    assert(spark.sql(s"SELECT sum(v) FROM graft.`$root`").as[Double].head() == 7.0)
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$root` FOR VERSION AS OF 1")
      .as[Double].head() == 1.0)
    val ts = new java.sql.Timestamp(afterV1).toString
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$root` FOR TIMESTAMP AS OF '$ts'")
      .as[Double].head() == 1.0)
    // Spark folds current_timestamp() at analysis (its own time-travel
    // contract), so "as of now" pins the newest snapshot
    assert(spark.sql(
      s"SELECT sum(v) FROM graft.`$root` FOR TIMESTAMP AS OF current_timestamp()")
      .as[Double].head() == 7.0)
  }

  test("INSERT INTO appends O(batch); INSERT OVERWRITE rewrites; feed records inserts") {
    val root = tmp() + "/ins"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)   // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)              // v2

    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 'c'), (4, 'd')")     // v3
    assert(ManifestTable.read(spark, root).count() == 4)
    // add-only delta commit: v1's files are untouched (carried by reference)
    val hist = ManifestTable.history(spark, root)
    assert(hist.filter(col("version") === 3).select("op").as[String].head() == "append")
    val feed = ManifestTable.readChangeFeed(spark, root, fromVersion = 2,
      toVersion = 3)
    assert(feed.filter(col(ManifestTable.ChangeTypeCol) === "insert")
      .select("k").as[Long].collect().sorted.toSeq == Seq(3L, 4L))

    // positional + implicit-cast alignment comes from Spark's own insert path
    spark.sql(s"INSERT INTO graft.`$root` SELECT 5, 'e'")                 // v4
    assert(ManifestTable.read(spark, root).filter(col("k") === 5L)
      .select("s").as[String].head() == "e")

    spark.sql(s"INSERT OVERWRITE graft.`$root` VALUES (9, 'z')")          // v5
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
  }

  test("INSERT guard rails: wrong arity refused, time-traveled insert refused") {
    val root = tmp() + "/guard"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)
    intercept[Exception](spark.sql(s"INSERT INTO graft.`$root` VALUES (2)"))
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$root` FOR VERSION AS OF 1 VALUES (2, 'b')"))
    // Spark's parser itself refuses time travel on an insert target —
    // either way the snapshot stays immutable
    assert(ManifestTable.read(spark, root).count() == 1)
  }

  test("partitioned table: INSERT INTO lands in the hive layout; pruning still works") {
    val root = tmp() + "/part"
    ManifestTable.write(Seq(("2026-08-01", 1L), ("2026-08-02", 2L)).toDF("day", "k"),
      root, partitionCols = Seq("day"))
    // positional insert follows the TABLE's column order — hive layout
    // reads partition columns last, so the relation's schema is (k, day)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, '2026-08-03')")
    // BY NAME sidesteps the ordering question entirely
    spark.sql(s"INSERT INTO graft.`$root` BY NAME " +
      "SELECT '2026-08-04' AS day, 4 AS k")
    assert(ManifestTable.partitionLayout(spark, root) == Seq("day"))
    assert(spark.sql(s"SELECT k FROM graft.`$root` WHERE day >= '2026-08-03'")
      .as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // the appended generations are hive-partitioned like the others
    assert(ManifestTable.read(spark, root).count() == 4)
  }

  test("graft_changes.`path@v` / graft_feed.`path@v` expose incremental windows in SQL") {
    val root = tmp() + "/win"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)          // v1
    ManifestTable.setChangeFeed(spark, root, enabled = true)          // v2
    spark.sql(s"INSERT INTO graft.`$root` VALUES (2, 'b'), (3, 'c')") // v3

    // rows added since v2 (exclusive), head default
    assert(spark.sql(s"SELECT k FROM graft_changes.`$root@2` ORDER BY k")
      .as[Long].collect().toSeq == Seq(2L, 3L))
    // explicit bounded window (0, 1]
    assert(spark.sql(s"SELECT k FROM graft_changes.`$root@0:1`")
      .as[Long].collect().toSeq == Seq(1L))
    // CDF rows carry _change_type; joins against live tables compose
    assert(spark.sql(
      s"""SELECT f.k FROM graft_feed.`$root@2` f JOIN graft.`$root` t USING (k)
         |WHERE f.${ManifestTable.ChangeTypeCol} = 'insert' ORDER BY f.k"""
        .stripMargin).as[Long].collect().toSeq == Seq(2L, 3L))
    // a bare path in the window namespaces (no @from) is not claimed
    intercept[Exception](spark.sql(s"SELECT * FROM graft_changes.`$root`").collect())
  }

  test("append refuses schema drift; non-graft two-part names stay untouched") {
    val root = tmp() + "/drift"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)
    val e = intercept[Exception](
      ManifestTable.append(spark, Seq((2L, 3.0)).toDF("k", "other"), root))
    assert(e.getMessage.contains("must match"))
    val e2 = intercept[Exception](
      ManifestTable.append(spark, Seq((2L, 3.0)).toDF("k", "s"), root))
    assert(e2.getMessage.contains("types differ"))
    // a genuine missing table in another namespace errors as before
    intercept[Exception](spark.sql("SELECT * FROM somedb.sometable").collect())
    // and a table literally named graft.x (no slash) is not intercepted
    intercept[Exception](spark.sql("SELECT * FROM graft.x").collect())
  }
}

package graft

import java.util.UUID

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Atomic REPLACE WHERE through the catalog write surface: STATIC-mode
  * `INSERT OVERWRITE … PARTITION (…)` and `writeTo(t).overwrite(cond)`
  * land as ONE ManifestTable.replaceWhere commit — matched rows out,
  * batch in, everything else carried by reference. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def ns(): String = "rw_" + UUID.randomUUID().toString.take(8)

  private def rootOf(n: String, table: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + s"/graft_warehouse/$n/$table"

  private def withStatic[A](body: => A): A = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try body
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
  }

  test("static INSERT OVERWRITE PARTITION replaces exactly that partition, atomically") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1,'a'),(2,'b'),(3,'b'),(4,'c')")
    val vBefore = ManifestTable.currentVersion(spark, rootOf(n, "t")).get
    withStatic {
      spark.sql(s"INSERT OVERWRITE graft_lake.$n.t PARTITION (day='b') " +
        "SELECT 9 AS k")
    }
    val got = spark.table(s"graft_lake.$n.t").as[(Long, String)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, "a"), (4L, "c"), (9L, "b")))
    // ONE commit: readers never see the deleted-but-not-yet-replaced gap
    assert(ManifestTable.currentVersion(spark, rootOf(n, "t")).get == vBefore + 1)
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("writeTo(...).overwrite(cond): region swapped, outside-region batch refused") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1,'a'),(2,'b'),(3,'b')")
    Seq((7L, "b"), (8L, "b")).toDF("k", "day")
      .writeTo(s"graft_lake.$n.t").overwrite(col("day") === "b")
    assert(spark.table(s"graft_lake.$n.t").as[(Long, String)]
      .collect().toSeq.sorted == Seq((1L, "a"), (7L, "b"), (8L, "b")))
    // a batch row OUTSIDE the replaced region is the silent-corruption
    // footgun — refused loudly, nothing committed
    val before = spark.table(s"graft_lake.$n.t").collect().toSet
    intercept[Exception] {
      Seq((9L, "b"), (10L, "zz")).toDF("k", "day")
        .writeTo(s"graft_lake.$n.t").overwrite(col("day") === "b")
    }
    assert(spark.table(s"graft_lake.$n.t").collect().toSet == before)
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("non-exactly-convertible overwrite conditions refuse at analysis") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1,'x')")
    // a condition whose V1 filter can't convert exactly (regex-class
    // predicate) must be refused — a weaker conversion would clear
    // MORE rows than the condition names
    intercept[Exception] {
      Seq((2L, "y")).toDF("k", "s").writeTo(s"graft_lake.$n.t")
        .overwrite(col("s").rlike("^x.*"))
    }
    assert(spark.table(s"graft_lake.$n.t").count() == 1)
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("replaceWhere records the change feed: matched deletes + written inserts") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"ALTER TABLE graft_lake.$n.t SET TBLPROPERTIES ('cdf.enabled'='true')")
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1,'a'),(2,'b'),(3,'b')")
    val root = rootOf(n, "t")
    val v = ManifestTable.currentVersion(spark, root).get
    Seq((7L, "b")).toDF("k", "day")
      .writeTo(s"graft_lake.$n.t").overwrite(col("day") === "b")
    val changes = ManifestTable.readChangeFeed(spark, root, v, v + 1)
      .select(col("k"), col("_change_type")).as[(Long, String)]
      .collect().toSeq.sorted
    assert(changes == Seq((2L, "delete"), (3L, "delete"), (7L, "insert")))
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("untouched files carry forward by reference (region economics)") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO graft_lake.$n.t " +
      "SELECT id, concat('d', CAST(id % 4 AS STRING)) FROM range(0, 400)")
    val root = rootOf(n, "t")
    val before = ManifestTable.current(spark, root).get.files
      .map(f => f.relPath -> f.bytes).toMap
    withStatic {
      spark.sql(s"INSERT OVERWRITE graft_lake.$n.t PARTITION (day='d2') " +
        "SELECT id FROM range(1000, 1010)")
    }
    val after = ManifestTable.current(spark, root).get.files
    // every file NOT under day=d2 is the SAME manifest entry
    val untouched = after.filter(!_.relPath.contains("day=d2"))
    assert(untouched.nonEmpty &&
      untouched.forall(f => before.get(f.relPath).contains(f.bytes)),
      "files outside the replaced region must carry forward by reference")
    assert(spark.table(s"graft_lake.$n.t")
      .filter(col("day") === "d2").count() == 10)
    assert(spark.table(s"graft_lake.$n.t").count() == 310)
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }
}

package graft

import org.apache.spark.sql.functions._

/** The Delta-shaped by-NAME reader surfaces on graft_lake catalog
  * tables: `spark.read.option("readChangeFeed", true)
  * .option("startingVersion", n).table(...)` (batch CDF, inclusive
  * version window) and `.option("versionAsOf"/"timestampAsOf", …)
  * .table(...)` (reader-option time travel). Both rewrite onto the same
  * V1 relations the path/format surfaces use, so semantics cannot
  * drift between the three spellings. */
class CdfByNameSpec extends SparkSpec {
  import spark.implicits._

  private def ns(): String = "cdfn_" + java.util.UUID.randomUUID().toString.take(8)

  test("batch readChangeFeed by table name: inclusive window, row-level types") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, v DOUBLE)")           // v1
    spark.sql(s"ALTER TABLE graft_lake.$n.t SET TBLPROPERTIES ('cdf.enabled'='true')") // v2
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1, 10.0), (2, 20.0), (3, 30.0)")   // v3
    spark.sql(s"UPDATE graft_lake.$n.t SET v = v * 2 WHERE k = 2")            // v4
    spark.sql(s"DELETE FROM graft_lake.$n.t WHERE k = 3")                     // v5

    def feed(opts: (String, String)*): Seq[(Long, Double, String, Long)] = {
      val r = opts.foldLeft(spark.read.option("readChangeFeed", "true")) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.table(s"graft_lake.$n.t")
        .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .as[(Long, Double, String, Long)].collect().toSeq.sorted
    }
    // full window since the enable commit
    assert(feed("startingVersion" -> "3") == Seq(
      (1L, 10.0, "insert", 3L), (2L, 20.0, "insert", 3L),
      (2L, 20.0, "update_preimage", 4L), (2L, 40.0, "update_postimage", 4L),
      (3L, 30.0, "delete", 5L), (3L, 30.0, "insert", 3L)))
    // bounded window: startingVersion and endingVersion are INCLUSIVE
    assert(feed("startingVersion" -> "4", "endingVersion" -> "4") == Seq(
      (2L, 20.0, "update_preimage", 4L), (2L, 40.0, "update_postimage", 4L)))
    // startingVersion is required (the window must be explicit)
    val e = intercept[Exception] {
      spark.read.option("readChangeFeed", "true")
        .table(s"graft_lake.$n.t").collect()
    }
    assert(e.getMessage.contains("startingVersion"))
    // exclusive with time travel
    intercept[Exception] {
      spark.read.option("readChangeFeed", "true")
        .option("startingVersion", "3").option("versionAsOf", "2")
        .table(s"graft_lake.$n.t").collect()
    }
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("versionAsOf / timestampAsOf reader options by table name") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, v DOUBLE)")        // v1
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1, 1.0), (2, 2.0)")    // v2
    spark.sql(s"DELETE FROM graft_lake.$n.t WHERE k = 2")                  // v3
    def ks(opts: (String, String)*): Seq[Long] = {
      val r = opts.foldLeft(spark.read.option("ignored", "x")) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.table(s"graft_lake.$n.t").select("k").as[Long].collect().toSeq.sorted
    }
    // Spark 4 consumes these options natively (TimeTravelSpec) and
    // resolves through GraftCatalog.loadTable — no engine rule needed;
    // this pins that the catalog honors them end-to-end
    assert(ks() == Seq(1L)) // head
    assert(ks("versionAsOf" -> "2") == Seq(1L, 2L))
    assert(ks("versionAsOf" -> "1") == Seq.empty) // schema-only seed
    // timestampAsOf: a future instant resolves the head version
    assert(ks("timestampAsOf" -> "2099-01-01 00:00:00") == Seq(1L))
    intercept[Exception] {
      ks("versionAsOf" -> "2", "timestampAsOf" -> "2099-01-01 00:00:00")
    }
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }
}

package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Round-14 hardening: the advisor's five findings, each pinned by the
  * failure it named — fsck must not treat a LISTING failure as confirmed
  * absence, history must not count MoR deletion-vector repoints as rows
  * added, the CDF flag must parse case-insensitively, the two TIMESTAMP
  * AS OF surfaces must floor-divide identically for pre-1970 instants,
  * and SQL MERGE must refuse a source column that collides with the
  * target key spelling instead of failing opaquely mid-plan. */
class HardeningR14Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-r14").toString

  test("fsck: an unlistable dir is reported as such, never auto-repaired") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .repartition(1), src)
    ManifestTable.cloneTable(spark, src, dst)
    // destroy the SOURCE generation dir: the clone's dirBase resolution
    // now fails — fsck cannot LIST the dir, which is not the same as
    // confirming its files absent
    val gen = ManifestTable.current(spark, src).get
      .files.head.relPath.takeWhile(_ != '/')
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => rmTree(c))
      Files.delete(p)
    }
    rmTree(Paths.get(src, gen))
    val report = ManifestTable.fsck(spark, dst).collect()
    assert(report.length == 1 && report.head.getString(2) == "unlistable",
      s"expected one 'unlistable' problem, got ${report.toSeq}")
    assert(report.head.getString(1) == gen)
    // repair REFUSES: dropping references because a listing failed would
    // permanently lose intact data on a transient FS error
    val v0 = ManifestTable.current(spark, dst).get.version
    val e = intercept[Exception] {
      ManifestTable.fsck(spark, dst, repair = true).collect()
    }
    assert(e.getMessage.contains("failed to LIST"))
    assert(ManifestTable.current(spark, dst).get.version == v0,
      "a refused repair must not commit")
  }

  test("history: a MoR delete's DV repoints do not count as rows_added") {
    val root = tmp() + "/mor-hist"
    ManifestTable.write(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("k", "v").repartition(1), root)
    ManifestTable.deleteMoR(spark, root, col("k") === 2L)
    val row = ManifestTable.history(spark, root)
      .filter(col("version") === 2L).select("rows_added").collect().head
    // the delta re-ADDS the 4-row file repointed onto its deletion
    // vector (relPath in adds and removes); before the fix this row
    // reported 4 rows "added" for a 1-row delete
    assert(!row.isNullAt(0) && row.getLong(0) == 0L,
      s"MoR delete must report 0 rows_added, got $row")
  }

  test("cdf.enabled parses case-insensitively; junk values refuse at SET time") {
    val root = tmp() + "/cdf-ci"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .repartition(1), root)
    // uppercase TRUE through the generic property surface must turn the
    // feed ON (mutations after it carry change records)
    ManifestTable.setTableProperties(spark, root, Map("cdf.enabled" -> "TRUE"))
    ManifestTable.delete(spark, root, col("k") === 2L) // v3
    val changes = ManifestTable.readChangeFeed(spark, root, 2L, 3L)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(changes == Seq((2L, "delete")),
      s"TBLPROPERTIES ('cdf.enabled'='TRUE') must enable the feed, got $changes")
    // a value that is neither true nor false refuses at SET time instead
    // of committing a property that silently does nothing
    val e = intercept[Exception] {
      ManifestTable.setTableProperties(spark, root, Map("cdf.enabled" -> "yes"))
    }
    assert(e.getMessage.contains("cdf.enabled"))
  }

  test("TIMESTAMP AS OF floors pre-1970 instants on both SQL surfaces") {
    val root = tmp() + "/pre-epoch"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s").repartition(1), root)
    // pin the only commit's wall clock to epoch 0: an instant 1µs BEFORE
    // the epoch must resolve NO version. Truncating division rounds
    // -1µs to 0ms (rounds toward zero) and would wrongly resolve v1;
    // floorDiv yields -1ms and correctly refuses — and must do so
    // identically on the path-relation surface and the catalog surface.
    val manifest = Paths.get(root, "_manifests", f"${1L}%020d.txt")
    Files.setLastModifiedTime(manifest, FileTime.fromMillis(0L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root` TIMESTAMP AS OF " +
        "'1969-12-31 23:59:59.999999'").collect()
    }
    assert(e.getMessage.contains("no commit at or before"))
    // sanity: the epoch instant itself resolves
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` TIMESTAMP AS OF " +
      "'1970-01-01 00:00:00'").as[Long].head() == 1L)
  }

  test("SQL MERGE refuses a source column colliding with the target key spelling") {
    val n = "r14mrg"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_lake.$n")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").createOrReplaceTempView("r14_seed")
    spark.sql(s"CREATE TABLE graft_lake.$n.t AS SELECT * FROM r14_seed")
    // source maps kk → k but ALSO carries its own k: renaming would
    // produce duplicate column names and an opaque ambiguity error
    Seq((2L, 99L, 5.0)).toDF("k", "kk", "v").createOrReplaceTempView("r14_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft_lake.$n.t t USING r14_src s ON t.k = s.kk
                   |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.contains("already has a column named 'k'"),
      s"expected the collision refusal, got: ${e.getMessage}")
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    // a CASE-ONLY spelling difference between the mapped source column
    // and the target key is an unambiguous rename, not a collision
    spark.sql(s"CREATE TABLE graft_lake.$n.c (eventId BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft_lake.$n.c VALUES (1, 1.0), (2, 2.0)")
    Seq((2L, 9.0)).toDF("eventid", "v").createOrReplaceTempView("r14_ci")
    spark.sql(s"""MERGE INTO graft_lake.$n.c t USING r14_ci s
                 |ON t.eventId = s.eventid
                 |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.sql(s"SELECT v FROM graft_lake.$n.c ORDER BY eventId")
      .as[Double].collect().toSeq == Seq(1.0, 9.0))
    spark.sql(s"DROP TABLE graft_lake.$n.c")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }
}

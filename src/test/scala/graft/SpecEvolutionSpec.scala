package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Partition-spec EVOLUTION (Iceberg semantics re-expressed): one
  * metadata commit replaces the table's layout of record; old files stay
  * readable under their recorded era, new writes land the new layout,
  * generated columns repair at read time across eras, pruning stays
  * era-correct on both sides, dynamic overwrite refuses while eras are
  * mixed, and a compact physicalizes everything onto the current spec. */
class SpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-evo").toString

  private def mkEvolved(root: String): Unit = {
    val era1 = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-05 10:00:00"), "a", 10.0),
      (2L, java.sql.Timestamp.valueOf("2026-01-06 11:00:00"), "b", 20.0))
      .toDF("id", "ts", "cat", "v")
    ManifestTable.createEmpty(spark, root, era1.schema,
      partitionCols = Seq("days(ts)"))
    ManifestTable.append(spark, era1, root)                 // era 1: ts_day dirs
    ManifestTable.evolvePartitionSpec(spark, root, Seq("months(ts)", "cat"))
    val era2 = Seq(
      (3L, java.sql.Timestamp.valueOf("2026-02-07 12:00:00"), "a", 30.0),
      (4L, java.sql.Timestamp.valueOf("2026-02-08 13:00:00"), "b", 40.0))
      .toDF("id", "ts", "cat", "v")
    ManifestTable.append(spark, era2, root)                 // era 2: ts_month/cat dirs
  }

  test("mixed-era reads repair generated columns on both sides") {
    val root = tmp() + "/t"
    mkEvolved(root)
    // era-1 rows predate ts_month (read-time derivation); era-2 rows
    // carry ts_day as a DATA column (derived at their write boundary)
    val got = ManifestTable.read(spark, root)
      .select("id", "ts_day", "ts_month", "cat", "v")
      .as[(Long, String, String, String, Double)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, "2026-01-05", "2026-01", "a", 10.0),
      (2L, "2026-01-06", "2026-01", "b", 20.0),
      (3L, "2026-02-07", "2026-02", "a", 30.0),
      (4L, "2026-02-08", "2026-02", "b", 40.0)))
    // the layout of record is the new spec; files carry both eras
    assert(ManifestTable.partitionLayout(spark, root) == Seq("ts_month", "cat"))
    val eras = ManifestTable.current(spark, root).get.files
      .map(_.partitionPath.split('/').toSeq.map(_.takeWhile(_ != '=')))
      .distinct.toSet
    assert(eras == Set(Seq("ts_day"), Seq("ts_month", "cat")), eras)
  }

  test("pruning stays era-correct: old-era dirs, new-era dirs, conservative cross-era") {
    val root = tmp() + "/t"
    mkEvolved(root)
    // filter on the OLD column: era-1 prunes by dir, era-2 carries it as
    // a data column with footer stats — both prune, answer exact
    assert(ManifestTable.readWhere(spark, root, col("ts_day") === "2026-01-05")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // filter on the NEW column: era-2 prunes by dir; era-1 files lack it
    // (kept conservatively, repaired + re-filtered above the scan)
    assert(ManifestTable.readWhere(spark, root, col("ts_month") === "2026-02")
      .select("id").as[Long].collect().toSeq.sorted == Seq(3L, 4L))
    assert(ManifestTable.readWhere(spark, root, col("cat") === "b")
      .select("id").as[Long].collect().toSeq.sorted == Seq(2L, 4L))
  }

  test("dynamic overwrite refuses on mixed eras; compact physicalizes and unblocks") {
    val root = tmp() + "/t"
    mkEvolved(root)
    val batch = Seq(
      (9L, java.sql.Timestamp.valueOf("2026-02-09 09:00:00"), "a", 90.0))
      .toDF("id", "ts", "cat", "v")
    val e = intercept[Exception] {
      ManifestTable.replacePartitions(spark, batch, root)
    }
    assert(e.getMessage.contains("MIXED"), e.getMessage)
    // full compact rewrites every file under the current spec
    ManifestTable.compact(spark, root)
    val eras = ManifestTable.current(spark, root).get.files
      .map(_.partitionPath.split('/').toSeq.map(_.takeWhile(_ != '=')))
      .distinct
    assert(eras == Seq(Seq("ts_month", "cat")), eras)
    // content identical after physicalization
    assert(ManifestTable.read(spark, root)
      .select("id", "ts_day", "ts_month").as[(Long, String, String)]
      .collect().toSeq.sorted == Seq(
        (1L, "2026-01-05", "2026-01"), (2L, "2026-01-06", "2026-01"),
        (3L, "2026-02-07", "2026-02"), (4L, "2026-02-08", "2026-02")))
    // and the overwrite now replaces exactly the (2026-02, a) partition
    ManifestTable.replacePartitions(spark, batch, root)
    assert(ManifestTable.read(spark, root)
      .select("id").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 4L, 9L))
  }

  test("evolution refusals: redefinition, unknown column, reserved tag") {
    val root = tmp() + "/t"
    mkEvolved(root)
    ManifestTable.evolvePartitionSpec(spark, root, Seq("bucket(4, id)"))
    assert(ManifestTable.partitionLayout(spark, root) == Seq("id_bucket"))
    // changing an existing generated column's definition (same derived
    // name, different bucket count) is a rewrite, not evolution
    val e1 = intercept[Exception] {
      ManifestTable.evolvePartitionSpec(spark, root, Seq("bucket(8, id)"))
    }
    assert(e1.getMessage.contains("already defined"), e1.getMessage)
    // identity partitioning on a column the table does not have
    val e2 = intercept[Exception] {
      ManifestTable.evolvePartitionSpec(spark, root, Seq("nope"))
    }
    assert(e2.getMessage.contains("not in the schema"), e2.getMessage)
    // the marker tag is engine state
    intercept[Exception] {
      ManifestTable.setTableProperties(spark, root,
        Map("layout.evolved" -> "false"))
    }
    // time travel to a pre-evolution version shows the old era untouched
    val v2 = ManifestTable.readVersion(spark, root, 2L)
    assert(v2.columns.contains("ts_day") && !v2.columns.contains("ts_month"))
  }

  test("partitioned upsert refuses on mixed eras (carry-forward is path-based)") {
    val root = tmp() + "/t"
    mkEvolved(root)
    // the batch touches (2026-02, a) — old-era rows of that logical
    // partition live in ts_day-era files the path-based carry-forward
    // cannot retire; an unguarded upsert would duplicate them
    val batch = Seq(
      (3L, java.sql.Timestamp.valueOf("2026-02-07 12:00:00"), "a", 99.0))
      .toDF("id", "ts", "cat", "v")
    val e = intercept[Exception] {
      ManifestTable.upsertWithRetry(spark, batch, root, Seq("id"), "v",
        Seq("ts_month", "cat"))
    }
    assert(e.getMessage.contains("MIXED"), e.getMessage)
    // physicalize, then the same upsert lands exactly once
    ManifestTable.compact(spark, root)
    ManifestTable.upsertWithRetry(spark, batch, root, Seq("id"), "v",
      Seq("ts_month", "cat"))
    assert(ManifestTable.read(spark, root)
      .select("id", "v").as[(Long, Double)].collect().toSeq.sorted ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 99.0), (4L, 40.0)))
  }

  test("GRAFT EVOLVE SQL verb commits the spec change") {
    val root = tmp() + "/t"
    mkEvolved(root)
    val v = spark.sql(s"GRAFT EVOLVE '$root' PARTITIONED BY (bucket(4, id), cat)")
      .collect().head.getLong(0)
    assert(v == 5L)
    assert(ManifestTable.partitionLayout(spark, root) == Seq("id_bucket", "cat"))
    // mixed-era read still whole and repaired
    assert(ManifestTable.read(spark, root).count() == 4L)
  }

  test("catalog time travel to a pre-evolution version uses that era's layout") {
    val n = "evo_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (id BIGINT, cat STRING, v DOUBLE) " +
      "PARTITIONED BY (cat)")                                              // v1
    spark.sql(s"INSERT INTO graft_lake.$n.t VALUES (1, 'a', 10.0), (2, 'b', 20.0)") // v2
    val loc = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(n), "t"))
      .properties().get("location")
    ManifestTable.evolvePartitionSpec(spark, loc, Seq("bucket(4, id)"))    // v3
    spark.sql(s"INSERT INTO graft_lake.$n.t (id, cat, v) VALUES (3, 'c', 30.0)") // v4
    // the pinned v2 state predates evolution: its scan must classify
    // `cat` as that ERA's partition column (dir values), not by the
    // current bucket layout — the wrong era would read NULLs
    val got = spark.sql(s"SELECT id, cat, v FROM graft_lake.$n.t VERSION AS OF 2 ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b", 20.0)), got)
    // and the head reads all eras with repair
    assert(spark.sql(s"SELECT id, cat FROM graft_lake.$n.t ORDER BY id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }
}

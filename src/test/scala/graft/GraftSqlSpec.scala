package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** The GRAFT maintenance SQL grammar (injected parser): each statement
  * plans as a command over the manifest log, and everything that is not
  * a GRAFT statement must reach Spark's own parser untouched. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sql").toString

  test("GRAFT HISTORY / DETAIL / STATS read the manifest through SQL") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    ManifestTable.upsertDedup(spark, Seq((3L, "c")).toDF("k", "s"), root,
      keys = Seq("k"), order = "s")

    val hist = spark.sql(s"GRAFT HISTORY '$root'")
    assert(hist.select("version").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(hist.filter(col("version") === 2).select("op").as[String].head() == "upsert")
    // operation metrics from per-file footer counts: v1 wrote 2 rows;
    // the upsert's FULL snapshot lists carried files too, so its
    // rows_added is honest-NULL rather than the whole table's count
    assert(hist.filter(col("version") === 1).select("rows_added")
      .as[Long].head() == 2L)
    assert(hist.filter(col("version") === 2 && col("kind") === "snapshot")
      .collect().forall(_.isNullAt(6)))

    val detail = spark.sql(s"GRAFT DETAIL '$root'").collect().head
    assert(detail.getString(detail.fieldIndex("location")) == root)
    assert(detail.getLong(detail.fieldIndex("version")) == 2L)

    val stats = spark.sql(s"GRAFT STATS '$root'")
    assert(stats.filter(col("column") === "k").select("value_count")
      .as[Long].head() == 3L)

    // SHOW TBLPROPERTIES for path tables: user props + durable switches
    ManifestTable.setTableProperties(spark, root,
      Map("owner.team" -> "curation", "write.autoCompact" -> "true"))
    val props = spark.sql(s"GRAFT PROPERTIES '$root'")
      .as[(String, String)].collect().toMap
    assert(props("owner.team") == "curation" &&
      props("write.autoCompact") == "true")
    assert(!props.contains("schema.create") && !props.contains("graft.op"))
  }

  test("GRAFT RESTORE / COMPACT / VACUUM mutate through SQL") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)         // v1
    ManifestTable.upsertDedup(spark, Seq((2L, "b")).toDF("k", "s"), root,
      keys = Seq("k"), order = "s")                                   // v2

    val restored = spark.sql(s"GRAFT RESTORE '$root' TO VERSION 1").collect().head
    assert(restored.getLong(0) == 1L && restored.getLong(1) == 3L)
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))

    val compacted = spark.sql(s"GRAFT COMPACT '$root' TARGET 64").collect().head
    assert(compacted.getLong(0) == 4L)

    val reclaimed = spark.sql(s"GRAFT VACUUM '$root' KEEP 1").collect().head
    assert(reclaimed.getInt(0) >= 1) // v2's generation is unreferenced now
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("GRAFT DELETE FROM … WHERE — copy-on-write and MOR") {
    val root = tmp() + "/del"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), root)
    val r = spark.sql(s"GRAFT DELETE FROM '$root' WHERE v > 25.0").collect().head
    assert(r.getLong(0) == 2L && r.getString(1) == "copy-on-write")
    assert(ManifestTable.read(spark, root).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))

    val rootM = tmp() + "/delm"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .repartition(1), rootM)
    val rm = spark.sql(s"GRAFT DELETE MOR FROM '$rootM' WHERE k = 2").collect().head
    assert(rm.getString(1) == "merge-on-read")
    assert(ManifestTable.read(spark, rootM).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    // the MOR path really wrote a deletion vector, not a rewrite
    assert(ManifestTable.detail(spark, rootM).collect().head
      .getAs[Long]("num_dv_files") == 1L)
  }

  test("GRAFT UPDATE … SET … [WHERE] — old-row semantics, optional WHERE") {
    val root = tmp() + "/upd"
    ManifestTable.write(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "v", "s"), root)
    spark.sql(s"GRAFT UPDATE '$root' SET v = v * 2, s = concat(s, '!') WHERE k = 2")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double, String)]
      .collect().toSeq == Seq((1L, 10.0, "a"), (2L, 40.0, "b!")))
    // no WHERE = whole table; MOR flavor
    spark.sql(s"GRAFT UPDATE MOR '$root' SET v = v + 1")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double, String)]
      .collect().toSeq == Seq((1L, 11.0, "a"), (2L, 41.0, "b!")))
  }

  test("GRAFT MERGE INTO — default upsert, UPDATE SET with t/s aliases, DELETE") {
    val root = tmp() + "/mrg"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)
    // default (no WHEN clause) = UPDATE ALL + INSERT ALL, subquery source
    spark.sql(
      s"GRAFT MERGE INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(99.0 AS DOUBLE) AS v UNION ALL SELECT CAST(3 AS BIGINT) AS k, " +
        "CAST(30.0 AS DOUBLE) AS v) ON (k)")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))

    // UPDATE SET with both aliases: t.v is the OLD value, s.v the source's
    Seq((1L, 5.0), (4L, 40.0)).toDF("k", "v").createOrReplaceTempView("mrg_src")
    spark.sql(
      s"GRAFT MERGE INTO '$root' USING mrg_src ON (k) " +
        "WHEN MATCHED THEN UPDATE SET v = t.v + s.v " +
        "WHEN NOT MATCHED THEN INSERT ALL")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 15.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))

    // WHEN MATCHED THEN DELETE without INSERT: only the matched key goes
    spark.sql(
      s"GRAFT MERGE MOR INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(0.0 AS DOUBLE) AS v) ON (k) " +
        "WHEN MATCHED THEN DELETE")
    assert(ManifestTable.read(spark, root).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L))

    // NOT-MATCHED-only: matched rows carried through unchanged
    spark.sql(
      s"GRAFT MERGE INTO '$root' USING (SELECT CAST(1 AS BIGINT) AS k, " +
        "CAST(77.0 AS DOUBLE) AS v UNION ALL SELECT CAST(9 AS BIGINT) AS k, " +
        "CAST(90.0 AS DOUBLE) AS v) ON (k) WHEN NOT MATCHED THEN INSERT ALL")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 15.0), (3L, 30.0), (4L, 40.0), (9L, 90.0)))
  }

  test("GRAFT MERGE — WHEN NOT MATCHED BY SOURCE deletes/flags unmatched target rows") {
    // the "sync to source" shape: UPDATE ALL + INSERT ALL + BY SOURCE
    // DELETE makes the target an exact mirror of the source
    val root = tmp() + "/bysrc"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), root)
    spark.sql(
      s"GRAFT MERGE INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(99.0 AS DOUBLE) AS v UNION ALL SELECT CAST(4 AS BIGINT) AS k, " +
        "CAST(40.0 AS DOUBLE) AS v) ON (k) " +
        "WHEN MATCHED THEN UPDATE ALL " +
        "WHEN NOT MATCHED THEN INSERT ALL " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((2L, 99.0), (4L, 40.0)))

    // UPDATE SET flavor: flag stale rows instead of deleting them; the
    // expressions speak target columns only (t.c or bare)
    spark.sql(
      s"GRAFT MERGE INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(100.0 AS DOUBLE) AS v) ON (k) " +
        "WHEN MATCHED THEN UPDATE ALL " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v * -1.0")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((2L, 100.0), (4L, -40.0)))

    // an s. reference on the by-source branch is refused (no source row)
    val e = intercept[Exception](spark.sql(
      s"GRAFT MERGE INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(0.0 AS DOUBLE) AS v) ON (k) " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v"))
    assert(e.getMessage.contains("cannot reference the source"))

    // MOR refuses by-source loudly (it would DV ~the whole table)
    val e2 = intercept[Exception](spark.sql(
      s"GRAFT MERGE MOR INTO '$root' USING (SELECT CAST(2 AS BIGINT) AS k, " +
        "CAST(0.0 AS DOUBLE) AS v) ON (k) " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"))
    assert(e2.getMessage.contains("copy-on-write"))
  }

  test("GRAFT VACUUM deletes orphans only with ORPHANS, and only aged ones") {
    val root = tmp() + "/vac"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)
    // fabricate a crash orphan: a gen- dir no manifest references
    val orphan = java.nio.file.Paths.get(root, "gen-orphan-test")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk.parquet"), Array[Byte](1, 2, 3))

    // without ORPHANS: never touched
    spark.sql(s"GRAFT VACUUM '$root' KEEP 1").collect()
    assert(java.nio.file.Files.exists(orphan))
    // with ORPHANS but younger than the grace window: still kept
    spark.sql(s"GRAFT VACUUM '$root' KEEP 1 ORPHANS").collect()
    assert(java.nio.file.Files.exists(orphan),
      "a fresh unreferenced dir may be a concurrent writer's in-flight data")
    // age the dir (and its children) past the grace window → reclaimed
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 24L * 3600 * 1000)
    java.nio.file.Files.setLastModifiedTime(orphan, old)
    java.nio.file.Files.setLastModifiedTime(orphan.resolve("junk.parquet"), old)
    // DRY RUN counts exactly what the real run would reclaim, deletes nothing
    val dry = spark.sql(s"GRAFT VACUUM '$root' KEEP 1 ORPHANS DRY RUN").collect().head
    assert(dry.getInt(0) >= 1 && java.nio.file.Files.exists(orphan))
    val r = spark.sql(s"GRAFT VACUUM '$root' KEEP 1 ORPHANS").collect().head
    assert(r.getInt(0) == dry.getInt(0) && !java.nio.file.Files.exists(orphan))

    // abandoned streaming-write staging: same opt-in, same age gate
    val epoch = java.nio.file.Paths.get(root, "_staging", "sink-dead", "epoch-7")
    java.nio.file.Files.createDirectories(epoch)
    java.nio.file.Files.write(epoch.resolve("part.parquet"), Array[Byte](1))
    spark.sql(s"GRAFT VACUUM '$root' KEEP 1 ORPHANS").collect()
    assert(java.nio.file.Files.exists(epoch),
      "a fresh epoch dir may belong to a live in-flight micro-batch")
    java.nio.file.Files.setLastModifiedTime(epoch, old)
    java.nio.file.Files.setLastModifiedTime(epoch.resolve("part.parquet"), old)
    spark.sql(s"GRAFT VACUUM '$root' KEEP 1 ORPHANS").collect()
    assert(!java.nio.file.Files.exists(epoch))
  }

  test("GRAFT FSCK reports missing files and size drift; REPAIR drops dead refs") {
    val root = tmp() + "/fsck"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .repartition(2), root)
    assert(spark.sql(s"GRAFT FSCK '$root'").count() == 0) // healthy
    // destroy one data file behind the manifest's back
    val st = ManifestTable.current(spark, root).get
    val victim = st.files.maxBy(_.rows) // a file that actually holds rows
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, victim.relPath))
    val report = spark.sql(s"GRAFT FSCK '$root'").collect()
    assert(report.length == 1 && report.head.getString(2) == "missing")
    assert(report.head.getString(0) == victim.relPath)
    // repair: the dead reference drops in one auditable commit and the
    // table reads again (minus the lost rows)
    spark.sql(s"GRAFT FSCK '$root' REPAIR").collect()
    assert(ManifestTable.current(spark, root).get.version == st.version + 1)
    assert(ManifestTable.read(spark, root).count() == 2L - victim.rows)
    assert(spark.sql(s"GRAFT FSCK '$root'").count() == 0)
    // size drift reports but never auto-drops
    val st2 = ManifestTable.current(spark, root).get
    val f2 = st2.files.head
    java.nio.file.Files.write(java.nio.file.Paths.get(root, f2.relPath),
      Array[Byte](1, 2, 3), java.nio.file.StandardOpenOption.APPEND)
    val drift = spark.sql(s"GRAFT FSCK '$root' REPAIR").collect()
    assert(drift.length == 1 && drift.head.getString(2) == "size-mismatch")
    assert(ManifestTable.current(spark, root).get.version == st2.version,
      "size mismatches must never auto-repair")
  }

  test("GRAFT CLUSTER / BLOOM build and retire through SQL") {
    val root = tmp() + "/opt"
    ManifestTable.write((1L to 200L).map(i => (i, i * 2.0)).toDF("k", "v")
      .repartition(4), root)
    spark.sql(s"GRAFT CLUSTER '$root' BY (k, v) ZORDER TARGET 1").collect()
    // by contract clustering never changes content
    assert(ManifestTable.read(spark, root).count() == 200)
    val v = spark.sql(s"GRAFT BLOOM '$root' ON (k)").collect().head.getLong(0)
    assert(v == 3L)
    assert(ManifestTable.readWhere(spark, root, col("k") === 42L)
      .select("v").as[Double].head() == 84.0)
    spark.sql(s"GRAFT BLOOM DROP '$root'").collect()
    assert(ManifestTable.read(spark, root).count() == 200)
  }

  test("GRAFT MATERIALIZE folds deletion vectors; VACUUM RETAIN n HOURS parses") {
    val root = tmp() + "/mat"
    ManifestTable.write(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
      .repartition(1), root)
    spark.sql(s"GRAFT DELETE MOR FROM '$root' WHERE k = 2")
    assert(ManifestTable.detail(spark, root).collect().head
      .getAs[Long]("num_dv_files") == 1L)
    spark.sql(s"GRAFT MATERIALIZE '$root'").collect()
    assert(ManifestTable.detail(spark, root).collect().head
      .getAs[Long]("num_dv_files") == 0L)
    assert(ManifestTable.read(spark, root).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    // RETAIN: everything committed within 24h stays
    val r = spark.sql(s"GRAFT VACUUM '$root' RETAIN 24 HOURS").collect().head
    assert(r.getInt(0) == 0)
    assert(ManifestTable.history(spark, root).count() >= 3)
  }

  test("GRAFT CONSTRAINT ADD/DROP and RESTORE TO TIMESTAMP run through SQL") {
    val root = tmp() + "/cons"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)  // v1
    spark.sql(s"GRAFT CONSTRAINT '$root' ADD v_pos CHECK (v >= 0.0)")      // v2
    assert(ManifestTable.constraints(spark, root) == Map("v_pos" -> "v >= 0.0"))
    // enforcement reaches every committing path, including SQL inserts
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$root` VALUES (3, -1.0)"))
    assert(e.getMessage.contains("v_pos"))
    // a constraint the live table violates is refused at ADD time
    val e2 = intercept[Exception](spark.sql(
      s"GRAFT CONSTRAINT '$root' ADD v_small CHECK (v < 15.0)"))
    assert(e2.getMessage.contains("existing rows violate"))
    spark.sql(s"GRAFT CONSTRAINT '$root' DROP v_pos")                      // v3
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, -1.0)")               // v4
    assert(ManifestTable.read(spark, root).count() == 3)

    // RESTORE TO TIMESTAMP: roll back to the pre-insert instant
    val v3mtime = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths
      .get(root, "_manifests", "00000000000000000003.txt")).toMillis
    val r = spark.sql(
      s"GRAFT RESTORE '$root' TO TIMESTAMP '$v3mtime'").collect().head
    assert(r.getLong(0) == 3L)
    assert(ManifestTable.read(spark, root).count() == 2)
  }

  test("GRAFT CREATE [OR REPLACE] … AS — the SQL-only lifecycle end to end") {
    val root = tmp() + "/ctas"
    val r = spark.sql(s"GRAFT CREATE '$root' PARTITIONED BY (g) AS " +
      "SELECT id AS k, CAST(id % 2 AS STRING) AS g, CAST(id AS DOUBLE) AS v " +
      "FROM range(10)").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L)
    assert(ManifestTable.partitionLayout(spark, root) == Seq("g"))
    // plain CREATE refuses the existing table
    val e = intercept[Exception](spark.sql(
      s"GRAFT CREATE '$root' AS SELECT 1 AS one"))
    assert(e.getMessage.contains("OR REPLACE"))
    // ...and the whole lifecycle stays inside spark.sql
    spark.sql(s"INSERT INTO graft.`$root` SELECT CAST(10 AS BIGINT), " +
      "CAST(10.0 AS DOUBLE), '0'") // positional: (k, v, g) — g reads last
    spark.sql(s"GRAFT DELETE FROM '$root' WHERE k < 3")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`").as[Long].head() == 8L)
    spark.sql(s"GRAFT CREATE OR REPLACE '$root' AS SELECT 7 AS seven")
    assert(spark.sql(s"SELECT seven FROM graft.`$root`").as[Int].head() == 7)
    // the replaced generations stay time-travelable until vacuum
    assert(ManifestTable.history(spark, root).count() >= 3)
  }

  test("non-GRAFT SQL is untouched; a malformed GRAFT statement errors loudly") {
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].head() == 2)
    // a table named graft still parses through the delegate (the prefix
    // regex requires GRAFT as the leading keyword)
    spark.sql("SELECT 'GRAFT VACUUM' AS s").collect()
    val e = intercept[RuntimeException] {
      spark.sql("GRAFT FROBNICATE 'x'")
    }
    assert(e.getMessage.contains("GRAFT statement not recognized"))
  }
}

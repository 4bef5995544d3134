package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Generated partition columns (the Delta-generated-column take on
  * Iceberg hidden partitioning): PARTITIONED BY (days(ts) | bucket(n, c)
  * | …) declares a derived string column whose definition rides the
  * manifest; every write boundary derives it when a batch omits it. */
class GeneratedColsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-gen").toString

  private def events = Seq(
    (1L, Timestamp.valueOf("2026-01-01 10:00:00"), 10.0),
    (2L, Timestamp.valueOf("2026-01-01 23:30:00"), 20.0),
    (3L, Timestamp.valueOf("2026-01-02 08:00:00"), 30.0)
  ).toDF("id", "ts", "v")

  test("write PARTITIONED BY days(ts) derives ts_day; appends derive it too") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    assert(ManifestTable.partitionLayout(spark, root) == Seq("ts_day"))
    val st = ManifestTable.current(spark, root).get
    assert(st.files.flatMap(_.partitionValues.get("ts_day")).flatten.toSet ==
      Set("2026-01-01", "2026-01-02"))
    // append a batch WITHOUT the derived column: the boundary derives it
    ManifestTable.append(spark,
      Seq((4L, Timestamp.valueOf("2026-01-03 12:00:00"), 40.0))
        .toDF("id", "ts", "v"), root)
    val got = ManifestTable.read(spark, root)
      .select("id", "ts_day").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "2026-01-01"), (2L, "2026-01-01"),
      (3L, "2026-01-02"), (4L, "2026-01-03")))
  }

  test("user-supplied generated values: NULL derives, disagreement refuses") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    // NULL means "derive for me" (the positional-INSERT contract)
    ManifestTable.append(spark,
      Seq((5L, Timestamp.valueOf("2026-01-04 01:00:00"), 50.0))
        .toDF("id", "ts", "v")
        .withColumn("ts_day", lit(null).cast("string")), root)
    assert(ManifestTable.read(spark, root).filter(col("id") === 5L)
      .select("ts_day").as[String].head() == "2026-01-04")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark,
        Seq((6L, Timestamp.valueOf("2026-01-05 01:00:00"), 60.0))
          .toDF("id", "ts", "v").withColumn("ts_day", lit("1999-01-01")), root)
    }
    assert(e.getMessage.contains("disagree"), e.getMessage)
  }

  test("upsert on a generated layout carries untouched days by reference") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    val before = ManifestTable.current(spark, root).get
    val day2 = before.files.filter(_.partitionPath == "ts_day=2026-01-02")
    assert(day2.nonEmpty)
    // fresh batch touches only 2026-01-01 — no ts_day column supplied
    ManifestTable.upsertDedup(spark,
      Seq((2L, Timestamp.valueOf("2026-01-01 23:30:00"), 99.0))
        .toDF("id", "ts", "v"),
      root, keys = Seq("id"), order = "v", partitionCols = Seq("ts_day"))
    val after = ManifestTable.current(spark, root).get
    assert(day2.forall(after.files.contains),
      "untouched day must carry by reference")
    assert(ManifestTable.read(spark, root).filter(col("id") === 2L)
      .select("v").as[Double].head() == 99.0)
  }

  test("dynamic overwrite replaces exactly the derived partitions in the batch") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    ManifestTable.replacePartitions(spark,
      Seq((9L, Timestamp.valueOf("2026-01-01 00:00:00"), 90.0))
        .toDF("id", "ts", "v"), root)
    val got = ManifestTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got == Seq(3L, 9L), s"day 01 replaced, day 02 untouched: $got")
  }

  test("bucket(4, id) co-locates keys; merge inserts derive the bucket") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("bucket(4, id)"))
    assert(ManifestTable.partitionLayout(spark, root) == Seq("id_bucket"))
    ManifestTable.merge(spark, root,
      Seq((7L, Timestamp.valueOf("2026-01-07 00:00:00"), 70.0))
        .toDF("id", "ts", "v"),
      keys = Seq("id"))
    val got = ManifestTable.read(spark, root)
    assert(got.count() == 4)
    // the derived bucket equals the defining expression everywhere
    assert(got.filter(col("id_bucket") =!=
      expr("cast(pmod(hash(`id`), 4) as string)")).count() == 0)
  }

  test("CTAS/write supplying disagreeing generated values refuses; deep clone keeps the definition") {
    val root = tmp() + "/t"
    val e = intercept[IllegalArgumentException] {
      ManifestTable.write(events.withColumn("ts_day", lit("1999-01-01")),
        root, partitionCols = Seq("days(ts)"))
    }
    assert(e.getMessage.contains("disagree"), e.getMessage)
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    val deep = tmp() + "/deep"
    ManifestTable.cloneTable(spark, root, deep, deep = true)
    // the generated definition survived: an append without ts_day derives
    ManifestTable.append(spark,
      Seq((9L, Timestamp.valueOf("2026-01-09 00:00:00"), 9.0))
        .toDF("id", "ts", "v"), deep)
    assert(ManifestTable.read(spark, deep).filter(col("id") === 9L)
      .select("ts_day").as[String].head() == "2026-01-09")
  }

  test("optimized writes: a many-task batch lands one file per partition") {
    val root = tmp() + "/t"
    // 64 rows over 2 days arriving in 8 input tasks: an unshaped write
    // splinters into up to 8 x 2 files, the optimized write lands 2
    val wide = (1 to 64).map(i =>
        (i.toLong, Timestamp.valueOf(s"2026-01-0${1 + i % 2} 10:00:00"), i.toDouble))
      .toDF("id", "ts", "v").repartition(8)
    ManifestTable.createEmpty(spark, root, events.schema,
      partitionCols = Seq("days(ts)"),
      tags = Map(ManifestTable.OptimizedWriteProp -> "true"))
    ManifestTable.append(spark, wide, root)
    val files = ManifestTable.current(spark, root).get.files
    assert(files.size == 2, s"expected one file per day, got ${files.size}")
    assert(ManifestTable.read(spark, root).count() == 64)
    // a full overwrite honors the property too (the write mode that
    // touches the most data must not be the one that splinters)
    ManifestTable.write(wide, root, partitionCols = Seq("days(ts)"))
    assert(ManifestTable.current(spark, root).get.files.size == 2)
    // generated layouts DEFAULT to optimized writes (the k33/k35 decade
    // ratios both traced to splinters) — the unshaped behavior needs an
    // explicit opt-out now
    val root2 = tmp() + "/u"
    ManifestTable.createEmpty(spark, root2, events.schema,
      partitionCols = Seq("days(ts)"))
    ManifestTable.append(spark, wide, root2)
    assert(ManifestTable.current(spark, root2).get.files.size == 2,
      "a generated layout must default to optimized writes")
    val root3 = tmp() + "/v"
    ManifestTable.createEmpty(spark, root3, events.schema,
      partitionCols = Seq("days(ts)"),
      tags = Map(ManifestTable.OptimizedWriteProp -> "false"))
    ManifestTable.append(spark, wide, root3)
    assert(ManifestTable.current(spark, root3).get.files.size > 8,
      "explicit opt-out restores unshaped writes")
    // IDENTITY layouts default to optimized writes too (r19): the
    // splinter algebra is the same T × P whether the dir value is
    // derived or copied from a data column — a 1-task INSERT into a
    // 120-dir identity layout serialized 120 tiny file writes
    val root4 = tmp() + "/w"
    val ident = wide.withColumn("day", expr("CAST(ts AS DATE)"))
    ManifestTable.createEmpty(spark, root4, ident.schema,
      partitionCols = Seq("day"))
    ManifestTable.append(spark, ident, root4)
    assert(ManifestTable.current(spark, root4).get.files.size == 2,
      "an identity layout must default to optimized writes")
  }

  test("auto-compact: drip appends self-pack once a partition crowds") {
    val root = tmp() + "/t"
    ManifestTable.createEmpty(spark, root, events.schema,
      partitionCols = Seq("days(ts)"),
      tags = Map(ManifestTable.AutoCompactProp -> "true"))
    // 8 one-row appends into the SAME day: the 8th crosses the
    // threshold and a scoped optimize packs the partition inline
    (1 to 8).foreach { i =>
      ManifestTable.append(spark,
        Seq((i.toLong, Timestamp.valueOf("2026-01-01 10:00:00"), i.toDouble))
          .toDF("id", "ts", "v"), root)
    }
    val st = ManifestTable.current(spark, root).get
    assert(st.files.size == 1, s"expected the crowded day packed, got ${st.files.size}")
    assert(st.tags.get("graft.op").contains("rewrite"))
    assert(ManifestTable.read(spark, root).count() == 8)
    // the control without the property splinters
    val root2 = tmp() + "/u"
    ManifestTable.createEmpty(spark, root2, events.schema,
      partitionCols = Seq("days(ts)"))
    (1 to 8).foreach { i =>
      ManifestTable.append(spark,
        Seq((i.toLong, Timestamp.valueOf("2026-01-01 10:00:00"), i.toDouble))
          .toDF("id", "ts", "v"), root2)
    }
    assert(ManifestTable.current(spark, root2).get.files.size == 8)
  }

  test("rename/drop of the source column refuses; generated col is a partition col") {
    val root = tmp() + "/t"
    ManifestTable.write(events, root, partitionCols = Seq("days(ts)"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "ts", "event_time")
    }
    assert(e.getMessage.contains("generated"), e.getMessage)
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "ts")
    }
    intercept[IllegalArgumentException] { // partition col guard
      ManifestTable.renameColumn(spark, root, "ts_day", "day")
    }
    intercept[IllegalArgumentException] { // reserved tag guard
      ManifestTable.setTableProperties(spark, root,
        Map("layout.generated" -> "x:y"))
    }
  }

  test("catalog CREATE TABLE PARTITIONED BY (days(ts)) + INSERT derive end to end") {
    val ns = "gen_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
    spark.sql(s"CREATE TABLE graft_lake.$ns.ev (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    // positional INSERT passes NULL for the generated column; the write
    // boundary derives the real value
    spark.sql(s"INSERT INTO graft_lake.$ns.ev " +
      "SELECT 1L, TIMESTAMP'2026-02-01 12:00:00', 1.5, NULL")
    val got = spark.sql(s"SELECT id, ts_day FROM graft_lake.$ns.ev")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "2026-02-01")))
    // bucket transform through the catalog too
    spark.sql(s"CREATE TABLE graft_lake.$ns.kv (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO graft_lake.$ns.kv SELECT 42L, 'x', NULL")
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.$ns.kv")
      .collect().head.getLong(0) == 1L)
  }

  test("writeStream.toTable into a generated layout derives the partition column") {
    val ns = "gens_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
    spark.sql(s"CREATE TABLE graft_lake.$ns.ev (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    val ck = java.nio.file.Files.createTempDirectory("graft-genstream").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-genstream-src")
      .toString + "/in"
    Seq((1L, Timestamp.valueOf("2026-03-01 08:00:00"), 1.0),
        (2L, Timestamp.valueOf("2026-03-02 08:00:00"), 2.0))
      .toDF("id", "ts", "v").write.json(srcDir)
    // the stream passes NULL for the generated column (the positional
    // contract); the epoch commit derives the real day
    val q = spark.readStream.schema("id BIGINT, ts TIMESTAMP, v DOUBLE")
      .json(srcDir)
      .select(col("id"), col("ts"), col("v"), lit(null).cast("string").as("ts_day"))
      .writeStream.option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"graft_lake.$ns.ev")
    q.awaitTermination(60000L); assert(!q.isActive)
    assert(spark.sql(s"SELECT id, ts_day FROM graft_lake.$ns.ev ORDER BY id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "2026-03-01"), (2L, "2026-03-02")))
    spark.sql(s"DROP TABLE graft_lake.$ns.ev")
    spark.sql(s"DROP NAMESPACE graft_lake.$ns")
  }

  test("GRAFT CREATE ... PARTITIONED BY (days(...)) via SQL; clone carries the layout") {
    val base = tmp()
    val root = base + "/t"
    events.createOrReplaceTempView("gen_ev_src")
    spark.sql(s"GRAFT CREATE '$root' PARTITIONED BY (days(ts)) AS " +
      "SELECT * FROM gen_ev_src")
    assert(ManifestTable.partitionLayout(spark, root) == Seq("ts_day"))
    // a shallow clone inherits the generated definition: appends to the
    // clone derive too
    val dst = base + "/c"
    spark.sql(s"GRAFT CLONE '$root' TO '$dst'")
    ManifestTable.append(spark,
      Seq((8L, Timestamp.valueOf("2026-01-08 00:00:00"), 80.0))
        .toDF("id", "ts", "v"), dst)
    assert(ManifestTable.read(spark, dst).filter(col("id") === 8L)
      .select("ts_day").as[String].head() == "2026-01-08")
  }
}

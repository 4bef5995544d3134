package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Incremental OPTIMIZE: bin-pack small files + fold deletion vectors,
  * carry compacted files by reference — the steady-state maintenance op
  * (GRAFT COMPACT remains the deliberate full rewrite). */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-opt").toString

  /** date=A gets `aFiles` small files (via appends), date=B exactly one. */
  private def seed(root: String, aFiles: Int): Unit = {
    ManifestTable.write(
      Seq(("A", 1L, 1.0), ("B", 100L, 5.0)).toDF("date", "key", "v"),
      root, partitionCols = Seq("date"))
    (2 to aFiles).foreach { i =>
      ManifestTable.append(spark,
        Seq(("A", i.toLong, i.toDouble)).toDF("date", "key", "v"), root)
    }
  }

  test("optimize bin-packs small files, carries lone-file partitions, and is idempotent") {
    val root = tmp() + "/t"
    seed(root, aFiles = 4) // 4 small files in date=A + 1 in date=B
    val before = ManifestTable.current(spark, root).get
    val bFile = before.files.filter(_.partitionPath == "date=B")
    assert(before.files.count(_.partitionPath == "date=A") == 4)
    val v = ManifestTable.optimize(spark, root, targetFileMB = 64)
    val after = ManifestTable.current(spark, root).get
    assert(v == before.version + 1)
    // date=A packed into one file; date=B's lone small file untouched —
    // the SAME manifest entry, carried by reference
    assert(after.files.count(_.partitionPath == "date=A") == 1)
    assert(after.files.filter(_.partitionPath == "date=B") == bFile)
    assert(ManifestTable.read(spark, root).select("key").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 100L))
    // nothing left to pack: version unchanged
    assert(ManifestTable.optimize(spark, root, targetFileMB = 64) == v)
  }

  test("optimize WHERE scopes to exact partitions; data columns refuse") {
    val root = tmp() + "/t"
    seed(root, aFiles = 3)
    ManifestTable.append(spark,
      Seq(("B", 101L, 6.0)).toDF("date", "key", "v"), root) // B now has 2
    val before = ManifestTable.current(spark, root).get
    val aFilesBefore = before.files.filter(_.partitionPath == "date=A")
    ManifestTable.optimize(spark, root, predicate = Some(col("date") === "B"),
      targetFileMB = 64)
    val after = ManifestTable.current(spark, root).get
    assert(after.files.count(_.partitionPath == "date=B") == 1)
    assert(after.files.filter(_.partitionPath == "date=A").toSet ==
      aFilesBefore.toSet, "out-of-scope partitions must carry by reference")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.optimize(spark, root, predicate = Some(col("key") > 1L))
    }
    assert(e.getMessage.contains("partition columns only"))
  }

  test("optimize folds deletion vectors back into plain files") {
    val root = tmp() + "/t"
    // one multi-row file per partition: a partial MoR delete leaves a DV
    ManifestTable.write(
      Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0), ("B", 100L, 5.0))
        .toDF("date", "key", "v").coalesce(1),
      root, partitionCols = Seq("date"))
    ManifestTable.deleteMoR(spark, root, col("key") === 2L)
    assert(ManifestTable.current(spark, root).get.files.exists(_.dv.nonEmpty))
    ManifestTable.optimize(spark, root, targetFileMB = 64)
    val after = ManifestTable.current(spark, root).get
    assert(after.files.forall(_.dv.isEmpty), "optimize must fold DVs in")
    assert(ManifestTable.read(spark, root).select("key").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 100L))
  }

  test("optimize commits a data-identical delta: incremental readers skip it") {
    val root = tmp() + "/t"
    seed(root, aFiles = 3)
    val v0 = ManifestTable.current(spark, root).get.version
    val v1 = ManifestTable.optimize(spark, root, targetFileMB = 64)
    assert(v1 == v0 + 1)
    // rows added SINCE the optimize: none (op 'rewrite' is data-identical)
    assert(ManifestTable.readChanges(spark, root, v0, v1).count() == 0)
  }

  test("OPTIMIZE ZORDER BY clusters the scope: every scoped file rewrites, out-of-scope carries") {
    val root = tmp() + "/t"
    // two days, each with interleaved k values across 3 files
    (0 to 2).foreach { i =>
      val rows = (0 until 30).map(j => ("A", (j * 3 + i).toLong, j.toDouble)) ++
        (0 until 30).map(j => ("B", (j * 3 + i).toLong, j.toDouble))
      if (i == 0) ManifestTable.write(rows.toDF("date", "key", "v").coalesce(1),
        root, partitionCols = Seq("date"))
      else ManifestTable.append(spark, rows.toDF("date", "key", "v").coalesce(1), root)
    }
    val before = ManifestTable.current(spark, root).get
    val bBefore = before.files.filter(_.partitionPath == "date=B")
    val v = spark.sql(
      s"GRAFT OPTIMIZE '$root' TARGET 64 ZORDER BY (key) WHERE date = 'A'")
      .collect().head.getLong(0)
    val after = ManifestTable.current(spark, root).get
    assert(v == before.version + 1)
    // in-scope: ALL of date=A rewrote into one clustered file whose key
    // range is contiguous (min..max stats prove the sort landed)
    val aAfter = after.files.filter(_.partitionPath == "date=A")
    assert(aAfter.size == 1 && !before.files.exists(aAfter.contains))
    // out-of-scope: date=B carried by reference, byte for byte
    assert(after.files.filter(_.partitionPath == "date=B").toSet == bBefore.toSet)
    assert(ManifestTable.read(spark, root).count() == 180)
    // rows conserved per key
    assert(ManifestTable.read(spark, root).filter(col("date") === "A")
      .select("key").distinct().count() == 90)
  }

  test("GRAFT OPTIMIZE SQL: TARGET + WHERE end to end") {
    val root = tmp() + "/t"
    seed(root, aFiles = 4)
    val v = spark.sql(s"GRAFT OPTIMIZE '$root' TARGET 64 WHERE date = 'A'")
      .collect().head.getLong(0)
    val after = ManifestTable.current(spark, root).get
    assert(v == after.version)
    assert(after.files.count(_.partitionPath == "date=A") == 1)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`")
      .collect().head.getLong(0) == 5L)
  }
}

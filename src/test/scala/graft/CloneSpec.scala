package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Zero-copy shallow CLONE (the Delta CLONE role): one metadata commit
  * references the source's files; both sides mutate independently from
  * that instant; local rewrites progressively localize the clone. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-clone").toString

  private def seed(root: String): Unit =
    ManifestTable.write(
      Seq(("2026-01-01", 1L, 10.0), ("2026-01-01", 2L, 20.0),
          ("2026-01-02", 3L, 30.0), ("2026-01-02", 4L, 40.0))
        .toDF("date", "key", "v"),
      root, partitionCols = Seq("date"))

  test("shallow clone: one metadata commit, identical reads, zero data copied") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    val v = ManifestTable.cloneTable(spark, src, dst)
    assert(v == 1L)
    def rows(root: String) = ManifestTable.read(spark, root)
      .select("date", "key", "v").orderBy("key")
      .as[(String, Long, Double)].collect().toSeq
    assert(rows(dst) == rows(src) && rows(dst).size == 4)
    // zero data files under the clone root — only the manifest dir
    val local = new java.io.File(dst).listFiles().map(_.getName).toSet
    assert(local == Set("_manifests"), s"clone root should hold only metadata, got $local")
    // the file ENTRIES are the source's, byte for byte
    assert(ManifestTable.current(spark, dst).get.files.toSet ==
      ManifestTable.current(spark, src).get.files.toSet)
    // DESCRIBE DETAIL surfaces the provenance
    val d = ManifestTable.detail(spark, dst).collect().head
    assert(d.getAs[String]("clone_sources").contains(src))
    assert(ManifestTable.detail(spark, src).collect().head
      .getAs[String]("clone_sources").isEmpty)
  }

  test("clone and source mutate independently") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.cloneTable(spark, src, dst)
    // mutate the CLONE: CoW delete + append land locally
    ManifestTable.delete(spark, dst, col("key") === 1L)
    ManifestTable.append(spark, Seq(("2026-01-03", 9L, 90.0)).toDF("date", "key", "v"), dst)
    assert(ManifestTable.read(spark, dst).count() == 4)
    assert(ManifestTable.read(spark, src).count() == 4) // source untouched
    assert(ManifestTable.read(spark, src).filter(col("key") === 1L).count() == 1)
    // mutate the SOURCE: the clone's snapshot is pinned
    ManifestTable.delete(spark, src, col("key") === 3L)
    assert(ManifestTable.read(spark, dst).filter(col("key") === 3L).count() == 1)
  }

  test("MoR delete on the clone marks inherited files without touching the source") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.cloneTable(spark, src, dst)
    // the deletion vector lands under the CLONE root; positions address
    // files that physically live under the SOURCE root
    ManifestTable.deleteMoR(spark, dst, col("key") === 2L)
    assert(ManifestTable.read(spark, dst).orderBy("key")
      .select("key").as[Long].collect().toSeq == Seq(1L, 3L, 4L))
    assert(ManifestTable.read(spark, src).count() == 4)
    assert(new java.io.File(dst).listFiles().map(_.getName).count(_.startsWith("dv-")) == 1)
    assert(!new java.io.File(src).listFiles().map(_.getName).exists(_.startsWith("dv-")))
  }

  test("clone inherits live deletion vectors and the bloom index by reference") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.deleteMoR(spark, src, col("key") === 4L)
    ManifestTable.buildBloomIndex(spark, src, Seq("key"))
    ManifestTable.cloneTable(spark, src, dst)
    assert(ManifestTable.read(spark, dst).orderBy("key")
      .select("key").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // the inherited bloom index still prunes point lookups on the clone
    val pruned = ManifestTable.readWhere(spark, dst, col("key") === 2L)
    assert(pruned.select("key").as[Long].collect().toSeq == Seq(2L))
  }

  test("VERSION AS OF clone pins a historical snapshot") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src) // v1
    ManifestTable.delete(spark, src, col("key") <= 2L) // v2
    ManifestTable.cloneTable(spark, src, dst, version = Some(1L))
    assert(ManifestTable.read(spark, dst).count() == 4)
    assert(ManifestTable.read(spark, src).count() == 2)
  }

  test("compact localizes the clone — it survives the source's disappearance") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.cloneTable(spark, src, dst)
    ManifestTable.compact(spark, dst, targetFileMB = 64)
    // simulate the source being vacuumed/retired wholesale
    val srcDir = new java.io.File(src)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(srcDir)
    assert(ManifestTable.read(spark, dst).count() == 4)
    // schema record + layout survived the clone + compact
    assert(ManifestTable.read(spark, dst).columns.toSet == Set("date", "key", "v"))
  }

  test("a vacuumed-away source fails the un-localized clone loudly") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.cloneTable(spark, src, dst)
    val srcDir = new java.io.File(src)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(srcDir)
    val e = intercept[RuntimeException] {
      ManifestTable.read(spark, dst).count()
    }
    assert(e.getMessage.contains("clone source"), e.getMessage)
  }

  test("clone of a clone chains the source roots") {
    val a = tmp() + "/a"; val b = tmp() + "/b"; val c = tmp() + "/c"
    seed(a)
    ManifestTable.cloneTable(spark, a, b)
    // b adds local data, then is itself cloned: c inherits dirs from BOTH
    ManifestTable.append(spark, Seq(("2026-01-03", 9L, 90.0)).toDF("date", "key", "v"), b)
    ManifestTable.cloneTable(spark, b, c)
    assert(ManifestTable.read(spark, c).count() == 5)
    assert(new java.io.File(c).listFiles().map(_.getName).toSet == Set("_manifests"))
  }

  test("deep clone copies physically — independent of the source from birth") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    // a deep clone carries data-describing metadata like a shallow one
    ManifestTable.addConstraint(spark, src, "pos_v", "v > 0")
    ManifestTable.cloneTable(spark, src, dst, deep = true)
    intercept[IllegalArgumentException] { // the constraint came along
      ManifestTable.append(spark,
        Seq(("2026-01-09", 11L, -1.0)).toDF("date", "key", "v"), dst)
    }
    intercept[Exception] { // DEEP refuses an existing destination too
      ManifestTable.cloneTable(spark, src, dst, deep = true)
    }
    val srcDir = new java.io.File(src)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(srcDir)
    assert(ManifestTable.read(spark, dst).count() == 4)
    // deep clone preserved the hive layout
    assert(ManifestTable.partitionLayout(spark, dst) == Seq("date"))
  }

  test("clone carries renames, constraints, and the cdf switch; not stream watermarks") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    ManifestTable.renameColumn(spark, src, "v", "amount")
    ManifestTable.addConstraint(spark, src, "pos_amount", "amount > 0")
    ManifestTable.setChangeFeed(spark, src, enabled = true)
    ManifestTable.cloneTable(spark, src, dst)
    assert(ManifestTable.read(spark, dst).columns.contains("amount"))
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark,
        Seq(("2026-01-04", 8L, -5.0)).toDF("date", "key", "amount"), dst)
    }
    // refusing user writes to the reserved clone tag
    intercept[IllegalArgumentException] {
      ManifestTable.setTableProperties(spark, dst, Map("clone.sources" -> "/evil"))
    }
  }

  test("CLONE and OPTIMIZE accept catalog names end to end") {
    val ns = "cl_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
    spark.sql(s"CREATE TABLE graft_lake.$ns.a AS SELECT id AS k, id * 1.5 AS v " +
      "FROM range(100)")
    val r = spark.sql(s"GRAFT CLONE graft_lake.$ns.a TO graft_lake.$ns.b")
      .collect().head
    assert(r.getString(1) == "shallow")
    assert(spark.table(s"graft_lake.$ns.b").count() == 100)
    // mutate the named clone; the named source is untouched
    spark.sql(s"DELETE FROM graft_lake.$ns.b WHERE k < 50")
    assert(spark.table(s"graft_lake.$ns.b").count() == 50)
    assert(spark.table(s"graft_lake.$ns.a").count() == 100)
    spark.sql(s"GRAFT OPTIMIZE graft_lake.$ns.b TARGET 64").collect()
    assert(spark.table(s"graft_lake.$ns.b").count() == 50)
    Seq("b", "a").foreach(t => spark.sql(s"DROP TABLE graft_lake.$ns.$t"))
    spark.sql(s"DROP NAMESPACE graft_lake.$ns")
  }

  test("GRAFT CLONE SQL end to end; refuses cloning onto itself / onto an existing table") {
    val src = tmp() + "/src"; val dst = tmp() + "/dst"
    seed(src)
    val r = spark.sql(s"GRAFT CLONE '$src' TO '$dst'").collect().head
    // carried-file count tracks the SOURCE's live files (the optimized-
    // write default coalesces the seed; the invariant is "all of them",
    // not a fixed number)
    val srcFiles = ManifestTable.current(spark, src).get.files.size.toLong
    assert(r.getLong(0) == 1L && r.getString(1) == "shallow" &&
      r.getLong(2) == srcFiles)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dst`").collect().head.getLong(0) == 4L)
    intercept[Exception] { ManifestTable.cloneTable(spark, src, src) }
    intercept[Exception] { ManifestTable.cloneTable(spark, src, dst) } // dst exists
    // deep via SQL with time travel
    val deep = tmp() + "/deep"
    val r2 = spark.sql(s"GRAFT CLONE '$src' TO '$deep' VERSION AS OF 1 DEEP")
      .collect().head
    assert(r2.getString(1) == "deep" && r2.getLong(2) >= 1L)
  }
}

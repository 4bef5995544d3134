package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Column rename/drop WITHOUT rewrites (Iceberg/Delta name-mapping):
  * data files keep their physical column names forever; the manifest
  * maps physical→logical and every surface translates at its boundary.
  * These specs pin the contract: old files stay readable after a
  * rename, mutations and pruning speak the logical name, time travel
  * shows each version under its own mapping, and a rename/drop is one
  * metadata-only commit (zero generation dirs added). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-schemaevo").toString

  private def genDirs(root: String): Set[String] =
    new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("gen-")).toSet

  test("rename: metadata-only, old files readable, logical name everywhere") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "v", "s"), root)
    val gensBefore = genDirs(root)
    val v = ManifestTable.renameColumn(spark, root, "v", "price")
    assert(v == 2L)
    assert(genDirs(root) == gensBefore, "rename must not write any data file")

    // read serves the logical name over the untouched old files
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price", "s"))
    assert(ManifestTable.read(spark, root).orderBy("k")
      .select("price").as[Double].collect().toSeq == Seq(10.0, 20.0))
    // time travel: v1 still shows the pre-rename name
    assert(ManifestTable.readVersion(spark, root, 1L).columns.toSeq ==
      Seq("k", "v", "s"))
    // pruning + filtering on the logical name (stats are keyed physical)
    assert(ManifestTable.readWhere(spark, root, col("price") > 15.0)
      .select("k").as[Long].collect().toSeq == Seq(2L))
    // statsOnly reports under the logical name
    val stats = ManifestTable.statsOnly(spark, root)
    assert(stats.filter(col("column") === "price").count() == 1)
    assert(stats.filter(col("column") === "v").count() == 0)
    // history marks the metadata commit
    assert(ManifestTable.history(spark, root)
      .filter(col("version") === 2).select("op").as[String].head() == "rename")
  }

  test("mutations after a rename keep one physical schema across generations") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)
    ManifestTable.renameColumn(spark, root, "v", "price")
    // upsert with the LOGICAL schema: the new generation must be written
    // with the physical name or the union would fork into two columns
    ManifestTable.upsertDedup(spark, Seq((3L, 30.0)).toDF("k", "price"), root,
      keys = Seq("k"), order = "price")
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // copy-on-write update + MoR delete via the logical name
    ManifestTable.update(spark, root, col("price") === 30.0,
      Map("price" -> (col("price") + 1.0)))
    ManifestTable.deleteMoR(spark, root, col("price") < 15.0)
    assert(ManifestTable.read(spark, root).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((2L, 20.0), (3L, 31.0)))
    // merge keyed on a renamed column
    ManifestTable.renameColumn(spark, root, "k", "id")
    ManifestTable.merge(spark, root,
      Seq((2L, 99.0), (9L, 90.0)).toDF("id", "price"), keys = Seq("id"))
    assert(ManifestTable.read(spark, root).orderBy("id").as[(Long, Double)]
      .collect().toSeq == Seq((2L, 99.0), (3L, 31.0), (9L, 90.0)))
    // SQL DML through the GRAFT grammar sees logical names too
    spark.sql(s"GRAFT DELETE FROM '$root' WHERE id = 9")
    assert(ManifestTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("rewrites after a rename (compact/cluster) keep one physical schema") {
    val root = tmp() + "/t"
    ManifestTable.write((1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(4), root)
    ManifestTable.renameColumn(spark, root, "v", "price")
    ManifestTable.compactSmallFiles(spark, root, smallFileMB = 64, targetFileMB = 64)
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price"))
    assert(ManifestTable.read(spark, root).agg(sum("price")).as[Double].head()
      == (1 to 50).map(_ * 1.0).sum)
    ManifestTable.cluster(spark, root, sortCols = Seq("price"), targetFileMB = 1)
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price"))
    assert(ManifestTable.read(spark, root).count() == 50)
    ManifestTable.compact(spark, root, targetFileMB = 64)
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price"))
    assert(ManifestTable.read(spark, root).count() == 50)
  }

  test("drop: column vanishes from reads and stats; re-adding it is refused") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "v", "s"), root)
    val gensBefore = genDirs(root)
    ManifestTable.dropColumn(spark, root, "s")
    assert(genDirs(root) == gensBefore, "drop must not write any data file")
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(ManifestTable.statsOnly(spark, root)
      .filter(col("column") === "s").count() == 0)
    // old files still physically carry 's': a same-named new column
    // would be silently re-dropped on read — refused loudly instead
    val e = intercept[IllegalArgumentException] {
      ManifestTable.upsertDedup(spark,
        Seq((3L, 30.0, "z")).toDF("k", "v", "s"), root,
        keys = Seq("k"), order = "v", mergeSchema = true)
    }
    assert(e.getMessage.contains("DROPped"))
    // dropping a renamed column tracks its physical name
    ManifestTable.renameColumn(spark, root, "v", "price")
    ManifestTable.dropColumn(spark, root, "price")
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k"))
  }

  test("refusals: partition columns, constraint-referenced columns, collisions, last column") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0, "p1")).toDF("k", "v", "p"), root,
      partitionCols = Seq("p"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "p", "part")
    }.getMessage.contains("partition"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "v", "k")
    }.getMessage.contains("already exists"))
    ManifestTable.addConstraint(spark, root, "v_pos", "v > 0")
    assert(intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "v", "w")
    }.getMessage.contains("constraint"))
    ManifestTable.dropConstraint(spark, root, "v_pos")
    // partition columns can never be dropped (dir layout), and the data
    // columns can go one by one down to the floor of one column total
    ManifestTable.dropColumn(spark, root, "v")
    ManifestTable.dropColumn(spark, root, "k")
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("p"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "p")
    }.getMessage.contains("partition"))
  }

  test("rename round-trip back to the physical name clears the mapping") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0)).toDF("k", "v"), root)
    ManifestTable.renameColumn(spark, root, "v", "price")
    ManifestTable.renameColumn(spark, root, "price", "v")
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "v"))
    // the healed mapping leaves no schema.rename tag in the manifest
    val head = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifests", f"${3L}%020d.txt")), "UTF-8")
    assert(!head.contains("schema.rename"))
    // incremental reads logicalize with the window-end tags
    ManifestTable.renameColumn(spark, root, "v", "w")                     // v4
    ManifestTable.upsertDedup(spark, Seq((2L, 20.0)).toDF("k", "w"), root,
      keys = Seq("k"), order = "w")                                       // v5
    assert(ManifestTable.readChanges(spark, root, 4L, 5L).columns.toSeq ==
      Seq("k", "w"))
    // (an unpartitioned upsert rewrites the whole table, so the change
    // window carries both rows — the mapping, not the set, is under test)
    assert(ManifestTable.readChanges(spark, root, 4L, 5L)
      .select("w").as[Double].collect().sorted.toSeq == Seq(10.0, 20.0))
  }

  test("GRAFT ALTER SQL: rename + drop through the injected parser") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0, "a")).toDF("k", "v", "s"), root)
    spark.sql(s"GRAFT ALTER '$root' RENAME COLUMN v TO price").collect()
    spark.sql(s"GRAFT ALTER '$root' DROP COLUMN s").collect()
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price"))
  }

  test("add: metadata-only, reads pad typed NULLs, the next write carries it") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)
    val gensBefore = genDirs(root)
    val v = ManifestTable.addColumn(spark, root, "tag",
      org.apache.spark.sql.types.StringType)
    assert(v == 2L)
    assert(genDirs(root) == gensBefore, "add must not write any data file")

    // the column is declared → present, typed, all-NULL over old files
    val df = ManifestTable.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "v", "tag"))
    assert(df.schema("tag").dataType == org.apache.spark.sql.types.StringType)
    assert(df.filter(col("tag").isNull).count() == 2)
    // filters on the new column work through the pruned read path too
    assert(ManifestTable.readWhere(spark, root, col("tag") === "x").count() == 0)
    assert(ManifestTable.readWhere(spark, root,
      col("tag").isNull && col("v") > 15.0).select("k").as[Long]
      .collect().toSeq == Seq(2L))
    // time travel: v1 predates the column
    assert(ManifestTable.readVersion(spark, root, 1L).columns.toSeq == Seq("k", "v"))

    // the next append carries it; old rows keep reading NULL
    ManifestTable.retryOnConflict()(ManifestTable.append(spark,
      Seq((3L, 30.0, "new")).toDF("k", "v", "tag"), root))
    assert(ManifestTable.read(spark, root).orderBy("k")
      .select("tag").as[Option[String]].collect().toSeq ==
      Seq(None, None, Some("new")))
    // and a row-level UPDATE backfills it in place
    ManifestTable.update(spark, root, col("k") === 1L,
      Map("tag" -> lit("backfilled")))
    assert(ManifestTable.read(spark, root).orderBy("k")
      .select("tag").as[Option[String]].collect().toSeq ==
      Seq(Some("backfilled"), None, Some("new")))
    // history marks the metadata commit
    assert(ManifestTable.history(spark, root)
      .filter(col("version") === 2).select("op").as[String].head() == "add-column")
  }

  test("add: refusals (duplicate, physical collision, nested) and evolution chains") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0)).toDF("k", "v"), root)
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, root, "k", org.apache.spark.sql.types.LongType)
    }
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, root, "a.b", org.apache.spark.sql.types.LongType)
    }
    // after v → price, re-adding 'v' would shadow the physical name
    ManifestTable.renameColumn(spark, root, "v", "price")
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, root, "v", org.apache.spark.sql.types.DoubleType)
    }
    // add → rename → drop chains like any declared column
    ManifestTable.addColumn(spark, root, "tag",
      org.apache.spark.sql.types.StringType)
    ManifestTable.renameColumn(spark, root, "tag", "label")
    assert(ManifestTable.read(spark, root).columns.toSeq ==
      Seq("k", "price", "label"))
    ManifestTable.dropColumn(spark, root, "label")
    assert(ManifestTable.read(spark, root).columns.toSeq == Seq("k", "price"))
  }

  test("GRAFT ALTER SQL: ADD COLUMN with a DDL type through the injected parser") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, 10.0)).toDF("k", "v"), root)
    spark.sql(s"GRAFT ALTER '$root' ADD COLUMN w DECIMAL(10,2)").collect()
    val df = ManifestTable.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "v", "w"))
    assert(df.schema("w").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
  }
}

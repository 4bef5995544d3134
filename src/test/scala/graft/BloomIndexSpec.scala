package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Per-file bloom-filter index for point lookups: min/max skipping is
  * blind to equality probes on high-cardinality UNCLUSTERED columns
  * (every file's range spans the key space), which is exactly the
  * layout these specs construct — then assert the bloom index prunes
  * the scan to the owning file(s) while results stay identical, and
  * that every conservative edge (post-index files, cross-kind probes,
  * drop/rebuild, vacuum) keeps rather than mis-prunes. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bloom").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 4000 rows hash-scattered over 8 files: every file's id range spans
    * ~[0, 4000), so min/max skipping keeps all 8 for any id probe. */
  private def seed(root: String): Unit = {
    val df = (0 until 4000).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "v")
      .repartition(8, col("id"))
    ManifestTable.write(df, root)
    assert(ManifestTable.current(spark, root).get.files.size == 8)
  }

  test("equality probe scans only the bloom-positive files; results identical") {
    val root = tmp() + "/t"
    seed(root)
    // without an index: min/max can't prune a hash-scattered key
    val before = ManifestTable.readWhere(spark, root, col("id") === 42L)
    assert(before.inputFiles.length == 8, "control: ranges overlap, nothing prunes")

    ManifestTable.buildBloomIndex(spark, root, Seq("id", "name"))
    val after = ManifestTable.readWhere(spark, root, col("id") === 42L)
    assert(after.inputFiles.length <= 2, // 1 owning file + fpp slack
      s"bloom should prune to the owning file, scanned ${after.inputFiles.length}")
    assert(after.select("id", "name").as[(Long, String)].collect().toSeq ==
      Seq((42L, "name_42")))

    // IN probe: union of owning files
    val in = ManifestTable.readWhere(spark, root, col("id").isin(1L, 2000L, 3999L))
    assert(in.inputFiles.length <= 4, s"got ${in.inputFiles.length}")
    assert(in.select("id").as[Long].collect().toSet == Set(1L, 2000L, 3999L))

    // string column probe
    val s = ManifestTable.readWhere(spark, root, col("name") === "name_777")
    assert(s.inputFiles.length <= 2)
    assert(s.select("id").as[Long].collect().toSeq == Seq(777L))

    // compound: equality conjunct prunes, the residual filter still applies
    val c = ManifestTable.readWhere(spark, root, col("id") === 42L && col("v") > 100.0)
    assert(c.count() == 0L) // 42 * 1.5 = 63 <= 100
  }

  test("files written after the build are never excluded (advisory index)") {
    val root = tmp() + "/t"
    seed(root)
    ManifestTable.buildBloomIndex(spark, root, Seq("id"))
    ManifestTable.upsertDedup(spark,
      Seq((999999L, "late", 0.0)).toDF("id", "name", "v"), root,
      keys = Seq("id"), order = "v")
    val got = ManifestTable.readWhere(spark, root, col("id") === 999999L)
    assert(got.select("name").as[String].collect().toSeq == Seq("late"),
      "a post-index file must be kept, not bloom-excluded")
  }

  test("cross-kind and unprunable probes keep everything; drop restores the full scan") {
    val root = tmp() + "/t"
    seed(root)
    ManifestTable.buildBloomIndex(spark, root, Seq("id"))
    // a range probe is not bloom-shaped (min/max may still prune the
    // files whose low end misses the range) — results stay exact
    val r = ManifestTable.readWhere(spark, root, col("id") < 10L)
    assert(r.count() == 10L)
    // fractional literal can never equal a long — but bloom must KEEP
    // (cross-kind), the residual filter decides
    val f = ManifestTable.readWhere(spark, root, col("id") === 41.5)
    assert(f.count() == 0L)

    ManifestTable.dropBloomIndex(spark, root)
    val full = ManifestTable.readWhere(spark, root, col("id") === 42L)
    assert(full.inputFiles.length == 8, "dropped index must stop pruning")
    assert(full.count() == 1L)
  }

  test("rebuild replaces the dataset; vacuum reclaims superseded and orphan indexes") {
    val root = tmp() + "/t"
    seed(root)
    ManifestTable.buildBloomIndex(spark, root, Seq("id"))
    val dir1 = ManifestTable.current(spark, root).get.tags("bloom.index")
    ManifestTable.buildBloomIndex(spark, root, Seq("id", "name"))
    val dir2 = ManifestTable.current(spark, root).get.tags("bloom.index")
    assert(dir1 != dir2 && fs.exists(new Path(root, dir1)))
    fs.mkdirs(new Path(root, "bloomidx-orphan0000"))

    // compact commits a dv/bloom-preserving snapshot head; keep=1 drops
    // the versions still referencing dir1
    ManifestTable.compact(spark, root, targetFileMB = 64)
    ManifestTable.vacuum(spark, root, keep = 1, deleteOrphans = true, orphanGraceMs = 0L)
    assert(!fs.exists(new Path(root, dir1)), "superseded index must be reclaimed")
    assert(fs.exists(new Path(root, dir2)), "live index must survive vacuum")
    assert(!fs.exists(new Path(root, "bloomidx-orphan0000")))

    // post-compaction files are not in the index — probes keep them
    assert(ManifestTable.readWhere(spark, root, col("id") === 42L).count() == 1L)
  }

  test("bloom.* is a reserved tag namespace for user writes") {
    val root = tmp() + "/t"
    seed(root)
    intercept[IllegalArgumentException] {
      ManifestTable.upsertDedup(spark,
        Seq((1L, "x", 0.0)).toDF("id", "name", "v"), root,
        keys = Seq("id"), order = "v", tags = Map("bloom.index" -> "evil"))
    }
  }

  test("bloom probing composes with deletion vectors (superset blooms stay safe)") {
    val root = tmp() + "/t"
    seed(root)
    ManifestTable.buildBloomIndex(spark, root, Seq("id"))
    ManifestTable.deleteMoR(spark, root, col("id") === 42L)
    // the bloom still says "maybe" for 42 (built pre-DV) — the read must
    // scan the file and the DV must strike the row
    assert(ManifestTable.readWhere(spark, root, col("id") === 42L).count() == 0L)
    assert(ManifestTable.readWhere(spark, root, col("id") === 43L)
      .select("id").as[Long].collect().toSeq == Seq(43L))
  }
}

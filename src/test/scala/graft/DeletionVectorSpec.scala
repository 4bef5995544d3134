package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable
import graft.sources.ManifestTable.DvRef

/** Merge-on-read deletes (deletion vectors): deleteMoR marks row
  * POSITIONS in a dv-* sidecar dataset and repoints the manifest; the
  * data files are untouched and every read path anti-joins the
  * positions out. These specs pin the full lifecycle: mark, read
  * (plain/pruned/time-travel/incremental), re-mark, full-file drop,
  * materialize, stats honesty, sidecar round-trip, and vacuum
  * reclamation. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dv").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mk(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 10.0)).toDF("id", "tag", "v")

  private def ids(root: String): Set[Long] =
    ManifestTable.read(spark, root).select("id").as[Long].collect().toSet

  test("deleteMoR: rows vanish from every read; data files stay untouched") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 100, "a").repartition(4), root)
    val before = ManifestTable.current(spark, root).get
    val dataBytes = before.files.map(f => f.relPath -> f.bytes).toMap

    val v2 = ManifestTable.deleteMoR(spark, root, col("id") < 30)
    assert(v2 == 2L)
    assert(ids(root) == (30L until 100L).toSet)

    val after = ManifestTable.current(spark, root).get
    // same files, same bytes — only the dv refs changed
    assert(after.files.map(_.relPath).toSet == before.files.map(_.relPath).toSet)
    after.files.foreach(f => assert(f.bytes == dataBytes(f.relPath)))
    assert(after.files.flatMap(_.dv).map(_.count).sum == 30L)
    // every file's dv names the same dataset, and it exists on disk
    val dvDirs = after.files.flatMap(_.dv).map(_.dir).distinct
    assert(dvDirs.size == 1 && dvDirs.head.startsWith("dv-"))
    assert(fs.exists(new Path(root, dvDirs.head)))

    // filter-pushdown read and SQL-style filters agree
    assert(ManifestTable.readWhere(spark, root, col("id") < 40)
      .select("id").as[Long].collect().toSet == (30L until 40L).toSet)
    // time travel BEFORE the delete still sees everything
    assert(ManifestTable.readVersion(spark, root, 1L).count() == 100L)
    // history shows a delete commit
    assert(ManifestTable.history(spark, root).select("version", "op")
      .as[(Long, String)].collect().toMap.apply(2L) == "delete")
  }

  test("deleteMoR semantics: TRUE deletes, FALSE and NULL keep; no-match is a no-op") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("id", "x"), root)
    ManifestTable.deleteMoR(spark, root, col("x") > 2.0) // NULL x must survive
    assert(ids(root) == Set(1L, 2L))
    val v = ManifestTable.currentVersion(spark, root).get
    assert(ManifestTable.deleteMoR(spark, root, col("x") > 100.0) == v,
      "a predicate matching nothing must not commit")
  }

  test("repeat deleteMoR unions positions; a fully-deleted file drops from the manifest") {
    val root = tmp() + "/t"
    // exactly ONE file per partition (repartition(1)): partial deletes
    // must land as DVs, not full-file drops
    ManifestTable.write(
      mk(0 until 10, "a").union(mk(10 until 20, "b")).repartition(1),
      root, partitionCols = Seq("tag"))
    ManifestTable.deleteMoR(spark, root, col("tag") === "a" && col("id") < 5)
    val mid = ManifestTable.current(spark, root).get
    val aFile = mid.files.filter(_.partitionPath == "tag=a")
    assert(aFile.flatMap(_.dv).map(_.count).sum == 5L)
    assert(ids(root) == ((5L until 10L) ++ (10L until 20L)).toSet)

    // second delete on the SAME file: union with the prior positions
    ManifestTable.deleteMoR(spark, root, col("tag") === "a" && col("id") < 8)
    val mid2 = ManifestTable.current(spark, root).get
    assert(mid2.files.filter(_.partitionPath == "tag=a").flatMap(_.dv).map(_.count).sum == 8L)
    assert(ids(root) == ((8L until 10L) ++ (10L until 20L)).toSet)

    // delete the rest of partition a: its file's deletions reach its row
    // count, so the file drops outright instead of carrying a full DV
    ManifestTable.deleteMoR(spark, root, col("tag") === "a")
    val end = ManifestTable.current(spark, root).get
    assert(end.files.forall(_.partitionPath != "tag=a"),
      "a fully-deleted file must leave the manifest")
    assert(ids(root) == (10L until 20L).toSet)
  }

  test("materializeDeletes folds DVs into a rewrite; incremental readers see nothing") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 50, "a").repartition(2), root)
    ManifestTable.deleteMoR(spark, root, col("id") % 2 === 0)
    val vDel = ManifestTable.currentVersion(spark, root).get
    val expected = ids(root)
    assert(expected == (1L until 50L by 2).toSet)

    val vMat = ManifestTable.materializeDeletes(spark, root)
    assert(vMat == vDel + 1)
    val st = ManifestTable.current(spark, root).get
    assert(st.files.forall(_.dv.isEmpty), "materialize must clear every dv ref")
    assert(ids(root) == expected)
    // rows identical → the rewrite contributes NOTHING downstream
    assert(ManifestTable.readChanges(spark, root, vDel, vMat).count() == 0L)
    // idempotent
    assert(ManifestTable.materializeDeletes(spark, root) == vMat)
  }

  test("statsOnly goes honest-NULL under a live DV, exact again after materialize") {
    val root = tmp() + "/t"
    // one file: the partial delete below must leave a LIVE dv (a
    // range-aligned layout would drop whole files instead — spec'd in
    // the repeat-delete test)
    ManifestTable.write(mk(0 until 40, "a").repartition(1), root)
    def stat(colName: String, field: String) =
      ManifestTable.statsOnly(spark, root).filter(col("column") === colName)
        .select(field).collect().head
    assert(stat("id", "value_count").getLong(0) == 40L)

    ManifestTable.deleteMoR(spark, root, col("id") < 10)
    assert(stat("id", "value_count").isNullAt(0),
      "counts would overcount deleted rows — must be NULL, never wrong")
    assert(stat("id", "min").isNullAt(0),
      "the deleted rows owned the min — must be NULL, never stale")

    ManifestTable.materializeDeletes(spark, root)
    assert(stat("id", "value_count").getLong(0) == 30L)
    assert(ManifestTable.statDouble(
      ManifestTable.statsOnly(spark, root), "id", "min").contains(10.0))
  }

  test("detail reports dv file count and deleted-row total") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 30, "a").repartition(3), root)
    ManifestTable.deleteMoR(spark, root, col("id") < 15)
    val d = ManifestTable.detail(spark, root).collect().head
    assert(d.getLong(d.fieldIndex("num_deleted_rows")) == 15L)
    assert(d.getLong(d.fieldIndex("num_dv_files")) >= 1L)
    // metadata-only live row count: footer totals minus DV'd positions
    assert(d.getLong(d.fieldIndex("num_rows")) == 15L)
  }

  test("upsert and compact materialize DVs along their rewrites") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 10, "a").union(mk(10 until 20, "b")),
      root, partitionCols = Seq("tag"))
    ManifestTable.deleteMoR(spark, root, col("id").isin(0L, 10L))
    assert(ids(root) == ((1L until 10L) ++ (11L until 20L)).toSet)

    // upsert touches partition a: its rewrite starts from LIVE rows (id 0
    // stays dead) and clears the partition's dv; partition b's dv carries
    ManifestTable.upsertDedup(spark, mk(5 until 7, "a").withColumn("v", col("v") + 1000.0),
      root, keys = Seq("id"), order = "v", partitionCols = Seq("tag"))
    val st = ManifestTable.current(spark, root).get
    assert(st.files.filter(_.partitionPath == "tag=a").forall(_.dv.isEmpty))
    assert(st.files.filter(_.partitionPath == "tag=b").exists(_.dv.nonEmpty))
    assert(ids(root) == ((1L until 10L) ++ (11L until 20L)).toSet)

    // a full compaction folds the remaining dv in
    ManifestTable.compact(spark, root, targetFileMB = 64)
    assert(ManifestTable.current(spark, root).get.files.forall(_.dv.isEmpty))
    assert(ids(root) == ((1L until 10L) ++ (11L until 20L)).toSet)
  }

  test("updateMoR: old positions DV'd, updated rows appended — one atomic commit") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 20, "a").repartition(1), root)
    val v2 = ManifestTable.updateMoR(spark, root, col("id") < 5,
      Map("v" -> (col("v") + 0.5)))
    assert(v2 == 2L)
    val rows = ManifestTable.read(spark, root)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(rows.size == 20)
    (0L until 5L).foreach(i => assert(rows(i) == i * 10.0 + 0.5))
    (5L until 20L).foreach(i => assert(rows(i) == i * 10.0))
    // the original file carries a 5-row dv; a new generation holds the
    // re-emitted updated rows
    val st = ManifestTable.current(spark, root).get
    assert(st.files.flatMap(_.dv).map(_.count).sum == 5L)
    assert(st.files.map(_.relPath.takeWhile(_ != '/')).distinct.size == 2)
    assert(ManifestTable.history(spark, root).select("version", "op")
      .as[(Long, String)].collect().toMap.apply(2L) == "update")
    // set expressions see the OLD row; a second update compounds
    ManifestTable.updateMoR(spark, root, col("id") === 0L,
      Map("v" -> (col("v") * 2)))
    assert(ManifestTable.read(spark, root).filter(col("id") === 0)
      .select("v").as[Double].head() == 1.0)
  }

  test("deleteMoR under a NON-DETERMINISTIC predicate: counts match stored positions") {
    // the position plan must be evaluated exactly ONCE (counts are read
    // back from the written dataset) — a second evaluation of rand()
    // would desync counts from positions, and a wrongly "proven" fully
    // deleted file is silent data loss
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 1000, "a").repartition(2), root)
    ManifestTable.deleteMoR(spark, root, rand() < 0.5 && col("id") >= 0)
    val st = ManifestTable.current(spark, root).get
    val preDv = st.files.map(_.stats("id").count).sum
    val dvSum = st.files.flatMap(_.dv).map(_.count).sum
    val live = ManifestTable.read(spark, root).count()
    assert(preDv - dvSum == live,
      s"rows unaccounted for: $preDv files-total - $dvSum dv = expected, read $live")
    assert(dvSum > 0L && live > 0L) // ~B(1000, .5): both sides occupied
  }

  test("mergeMoR: merge semantics with DV economics — bystanders stay in place") {
    val root = tmp() + "/t"
    val rootC = tmp() + "/c"
    ManifestTable.write(mk(0 until 40, "a").repartition(2), root)
    ManifestTable.write(mk(0 until 40, "a").repartition(2), rootC)
    val src = Seq((5L, "a", 500.0), (100L, "a", 1000.0)).toDF("id", "tag", "v")
    val action = ManifestTable.MatchUpdate(Map("v" -> (col("v") + col("_src_v"))))
    ManifestTable.mergeMoR(spark, root, src, keys = Seq("id"), whenMatched = action)
    ManifestTable.merge(spark, rootC, src, keys = Seq("id"), whenMatched = action)
    def all(r: String) = ManifestTable.read(spark, r)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(all(root) == all(rootC), "MoR merge must equal the CoW merge row-for-row")
    assert(all(root).contains((5L, 550.0)) && all(root).contains((100L, 1000.0)))
    // MoR mechanics: the matched row's OLD file is still live (1-row dv);
    // its bystander rows were never rewritten
    val st = ManifestTable.current(spark, root).get
    assert(st.files.flatMap(_.dv).map(_.count).sum == 1L)
    assert(ManifestTable.history(spark, root).select("version", "op")
      .as[(Long, String)].collect().toMap.apply(2L) == "merge")

    // MatchDelete through the MoR path
    ManifestTable.mergeMoR(spark, root, Seq((6L, "a", 0.0)).toDF("id", "tag", "v"),
      keys = Seq("id"), whenMatched = ManifestTable.MatchDelete, insertUnmatched = false)
    assert(!all(root).exists(_._1 == 6L))
    assert(all(root).size == 40) // 39 originals (6 gone) + insert 100 + update 5
  }

  test("readChanges across a deleteMoR window re-emits the files' LIVE rows") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 20, "a").repartition(1), root)
    val v1 = ManifestTable.currentVersion(spark, root).get
    ManifestTable.deleteMoR(spark, root, col("id") < 5)
    val v2 = ManifestTable.currentVersion(spark, root).get
    // file-level granularity: the repointed file re-emits its surviving
    // rows (deleted ids never reappear — keyed consumers reconcile)
    assert(ManifestTable.readChanges(spark, root, v1, v2)
      .select("id").as[Long].collect().toSet == (5L until 20L).toSet)
  }

  test("dv refs survive the columnar snapshot sidecar round-trip") {
    val root = tmp() + "/t"
    spark.conf.set(ManifestTable.ColumnarSnapshotThresholdKey, "1")
    try {
      ManifestTable.write(mk(0 until 25, "a"), root)     // v1
      ManifestTable.deleteMoR(spark, root, col("id") < 5) // v2 (delta, dv live)
      ManifestTable.deleteMoR(spark, root, col("id") < 8) // v3
      // restore snapshots v2's dv-bearing file list THROUGH the parquet
      // sidecar (threshold 1); current() then resolves via loadRefFiles
      ManifestTable.restore(spark, root, 2L)              // v4
      val st = ManifestTable.current(spark, root).get
      assert(st.files.flatMap(_.dv).map(_.count).sum == 5L,
        "dv ref must round-trip through the columnar sidecar")
      assert(ids(root) == (5L until 25L).toSet)
    } finally spark.conf.unset(ManifestTable.ColumnarSnapshotThresholdKey)
  }

  test("vacuum reclaims superseded dv datasets, keeps live ones") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 30, "a"), root)
    ManifestTable.deleteMoR(spark, root, col("id") < 5)
    val dv1 = ManifestTable.current(spark, root).get.files.flatMap(_.dv).map(_.dir).head
    ManifestTable.deleteMoR(spark, root, col("id") < 10) // repoints to dv2
    val dv2 = ManifestTable.current(spark, root).get.files.flatMap(_.dv).map(_.dir).head
    assert(dv1 != dv2)
    // an orphan dv dir (simulated crashed writer)
    fs.mkdirs(new Path(root, "dv-orphan000000"))

    // dv1 is still referenced by retained v2 → must survive keep=2
    // (versions 2,3 retained)... v1 is the snapshot floor, so everything
    // survives; force reclamation with keep=1 + an extra snapshot head
    ManifestTable.compact(spark, root, targetFileMB = 64) // v4 snapshot, dv-free
    ManifestTable.vacuum(spark, root, keep = 1, deleteOrphans = true, orphanGraceMs = 0L)
    assert(!fs.exists(new Path(root, dv1)), "superseded dv must be reclaimed")
    assert(!fs.exists(new Path(root, dv2)), "materialized-away dv must be reclaimed")
    assert(!fs.exists(new Path(root, "dv-orphan000000")), "orphan dv must be reclaimed")
    assert(ids(root) == (10L until 30L).toSet)
  }

  test("deleteMoR on a DV'd table at higher volume: correctness under the broadcast anti-join") {
    val root = tmp() + "/t"
    ManifestTable.write(mk(0 until 5000, "a").repartition(8), root)
    ManifestTable.deleteMoR(spark, root, col("id") % 3 === 0)
    ManifestTable.deleteMoR(spark, root, col("id") % 5 === 0)
    val expect = (0L until 5000L).filterNot(i => i % 3 == 0 || i % 5 == 0).toSet
    assert(ids(root) == expect)
    assert(ManifestTable.read(spark, root).count() == expect.size.toLong)
    // and the combined dv count matches what was deleted
    assert(ManifestTable.current(spark, root).get.files.flatMap(_.dv).map(_.count).sum ==
      (5000L - expect.size))
  }
}

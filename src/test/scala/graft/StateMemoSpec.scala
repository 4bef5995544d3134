package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** The resolved-state memo: one manifest resolution per (root, version)
  * process-wide, validated by the head manifest file's fingerprint.
  * Why it exists: ONE query's planning resolves the same state several
  * times (table schema, bucket layout, ScanBuilder, statistics) and a
  * cold resolution is a parse + possibly a sidecar parquet read —
  * measured ~45 ms/query of plan-time growth across the r14/r15
  * optimizer tier. Every test here pins a CORRECTNESS boundary of the
  * cache, not a latency number. */
class StateMemoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-memo").toString + "/t"

  test("repeat resolutions hit the memo; a new commit resolves cold and correct") {
    val root = tmp()
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    ManifestTable.resetStateMemoCounters()
    val s1 = ManifestTable.current(spark, root).get
    val s2 = ManifestTable.current(spark, root).get
    val (h1, _) = ManifestTable.stateMemoCounters
    assert(h1 >= 1L, "second resolution of an unchanged table must hit")
    assert(s1 == s2)
    // a mutation moves the head version: the memo must never serve the
    // old head as current
    ManifestTable.append(spark, Seq((3L, "c")).toDF("k", "v"), root)
    val s3 = ManifestTable.current(spark, root).get
    assert(s3.version == s1.version + 1)
    assert(ManifestTable.read(spark, root).count() == 3)
    // time travel to the old version: resolves through the memo'd
    // pinned state, rows unchanged
    assert(ManifestTable.readVersion(spark, root, s1.version).count() == 2)
  }

  test("clearStateMemo drops every memoized resolution (the out-of-band-surgery hatch)") {
    val root = tmp()
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    ManifestTable.current(spark, root) // populate
    ManifestTable.clearStateMemo()
    ManifestTable.resetStateMemoCounters()
    ManifestTable.current(spark, root).get
    val (h, m) = ManifestTable.stateMemoCounters
    assert(h == 0L && m >= 1L,
      s"the first resolution after clearStateMemo must be COLD, got hits=$h misses=$m")
    // and the table still reads correctly through the refilled memo
    assert(ManifestTable.read(spark, root).count() == 2)
  }

  test("fingerprint validation: an externally re-created table never aliases") {
    val root = tmp()
    ManifestTable.write(Seq((1L, "old")).toDF("k", "v"), root)
    assert(ManifestTable.read(spark, root).select("v").as[String].head() == "old")
    // delete the WHOLE table out from under the memo (no engine-side
    // invalidation — e.g. an external job re-provisioning the path) and
    // re-create v1 with different content: the new manifest's length
    // differs, so the fingerprint misses and the cold path serves
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ManifestTable.write(Seq((1L, "fresh-and-longer")).toDF("k", "v"), root)
    assert(ManifestTable.read(spark, root).select("v").as[String].head()
      == "fresh-and-longer")
  }

  test("catalog DROP TABLE invalidates: a re-created SAME-shape table reads its own rows") {
    val ns = "memo_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
    try {
      // identical DDL + identical INSERT both times — the re-created
      // manifest can land with the SAME byte length inside the SAME
      // mtime tick, the one state the fingerprint alone cannot tell
      // apart; dropTable's explicit invalidation closes it
      spark.sql(s"CREATE TABLE graft_lake.$ns.t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft_lake.$ns.t VALUES (1, 'x')")
      assert(spark.table(s"graft_lake.$ns.t").count() == 1)
      spark.sql(s"DROP TABLE graft_lake.$ns.t")
      spark.sql(s"CREATE TABLE graft_lake.$ns.t (k BIGINT, v STRING)")
      assert(spark.table(s"graft_lake.$ns.t").count() == 0,
        "re-created empty table must not serve the dropped table's state")
      spark.sql(s"INSERT INTO graft_lake.$ns.t VALUES (2, 'y'), (3, 'z')")
      assert(spark.table(s"graft_lake.$ns.t").as[(Long, String)].collect()
        .toSet == Set((2L, "y"), (3L, "z")))
      spark.sql(s"DROP TABLE graft_lake.$ns.t")
    } finally spark.sql(s"DROP NAMESPACE graft_lake.$ns CASCADE")
  }

  test("a deleted snapshot sidecar declines the memo hit (degradation parity with a fresh process)") {
    val root = tmp()
    // force a columnar snapshot: the threshold conf makes even a tiny
    // file list go through a ckpt- sidecar
    spark.conf.set(ManifestTable.ColumnarSnapshotThresholdKey, "1")
    try {
      ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
      assert(ManifestTable.read(spark, root).count() == 2) // memoized via ckpt
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ckpts = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
        .filter(_.getPath.getName.startsWith("ckpt-"))
      assert(ckpts.nonEmpty, "expected a columnar snapshot sidecar")
      ckpts.foreach(c => fs.delete(c.getPath, true))
      // the warm memo must NOT mask the deleted checkpoint: resolution
      // goes cold, fails there, and current() degrades exactly like a
      // fresh process (here: no older resolvable version -> no state)
      assert(ManifestTable.current(spark, root).isEmpty,
        "a deleted sidecar must decline the memo hit and resolve cold")
    } finally spark.conf.unset(ManifestTable.ColumnarSnapshotThresholdKey)
  }

  test("the conf gate forces cold resolution") {
    val root = tmp()
    ManifestTable.write(Seq((1L, "a")).toDF("k", "v"), root)
    spark.conf.set(ManifestTable.StateMemoKey, "false")
    try {
      ManifestTable.current(spark, root)
      ManifestTable.resetStateMemoCounters()
      ManifestTable.current(spark, root)
      assert(ManifestTable.stateMemoCounters == ((0L, 0L)),
        "disabled memo must not even be consulted")
    } finally spark.conf.unset(ManifestTable.StateMemoKey)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.ManifestTable

/** ManifestTable scale smoke (round-7): the carry-forward property under
  * load — against a ~20M-row, 30-partition table, a single-partition
  * upsert must cost ~1/30th of the seed write (it reads and rewrites ONE
  * partition; the other 29 carry forward by reference), and the
  * carried files must be the SAME physical entries. This is the property
  * that makes the design viable at 100 TB: commit cost tracks the batch,
  * not the table.
  *
  * Usage: SPARK_GRAFT_SMOKE_ROWS=20000000 sbt "runMain graft.ScaleSmokeManifest"
  */
object ScaleSmokeManifest {

  private var failures = 0
  private def check(name: String, cond: Boolean, detail: => String): Unit =
    if (cond) println(s"SCALE CHECK ok: $name ($detail)")
    else { failures += 1; println(s"SCALE CHECK FAIL: $name ($detail)") }

  def main(args: Array[String]): Unit = {
    val target = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "20000000").toLong
    val spark = GraftSession.builder("graft-scale-manifest", "local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft-scale-m") + "/t"

    // seed: target rows over 30 date partitions, unique keys
    val seed = spark.range(target).select(
      concat(lit("2026-01-"), lpad((pmod(col("id"), lit(30L)) + 1).cast("string"), 2, "0")).as("date"),
      col("id").as("key"),
      (col("id") % 1000L).cast("double").as("v"))
    val t0 = System.nanoTime()
    ManifestTable.write(seed, root, Seq("date"))
    val seedSec = (System.nanoTime() - t0) / 1e9
    val st1 = ManifestTable.current(spark, root).get
    println(f"SCALE manifest seed write: $seedSec%.1f s ($target rows, ${st1.files.size} files, 30 partitions)")

    // single-partition upsert: ~target/30 fresh rows, half updates half new
    val batch = spark.range(target / 30L).select(
      lit("2026-01-05").as("date"),
      when(pmod(col("id"), lit(2L)) === 0, col("id") * 30L + 4L) // existing keys of that date
        .otherwise(col("id") + target * 2L).as("key"),           // brand-new keys
      lit(-1.0).as("v"))
    val t1 = System.nanoTime()
    ManifestTable.upsertDedup(spark, batch, root, Seq("key"), "v", Seq("date"))
    val upsertSec = (System.nanoTime() - t1) / 1e9
    val st2 = ManifestTable.current(spark, root).get
    println(f"SCALE manifest 1-of-30-partition upsert: $upsertSec%.1f s (${target / 30} batch rows)")

    val untouched1 = st1.files.filterNot(_.partitionPath == "date=2026-01-05")
    check("untouched partitions carried forward by reference (identical file entries)",
      untouched1.forall(st2.files.contains) &&
        st2.files.count(_.partitionPath != "date=2026-01-05") == untouched1.size,
      s"carried=${untouched1.size} of ${st1.files.size}")
    check("upsert cost tracks the batch, not the table",
      upsertSec < seedSec, f"upsert=$upsertSec%.1f s vs seed=$seedSec%.1f s")
    val nRows = ManifestTable.read(spark, root).count()
    val expected = target + target / 30L / 2L // half the batch is new keys
    check("row count after merge is exact",
      nRows == expected, s"rows=$nRows expected=$expected")
    // updated rows really replaced (keep-last semantics): all planted -1.0
    val updated = ManifestTable.read(spark, root)
      .filter(col("date") === "2026-01-05" && col("v") === -1.0).count()
    check("planted updates landed (keep-last over the touched partition)",
      updated == target / 30L, s"updated=$updated expected=${target / 30}")

    // ---- checkpoint log: commit bytes stay flat as live files grow 10x ----
    // two tables, same row volume, 10x the partition/file count; the SAME
    // 1-partition upsert commits a delta manifest on both — its size must
    // track the batch (one partition's adds+removes), not the table.
    def manifestBytes(tRoot: String, v: Long): Long = {
      val fs = new org.apache.hadoop.fs.Path(tRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getFileStatus(new org.apache.hadoop.fs.Path(tRoot, f"_manifests/$v%020d.txt")).getLen
    }
    val ckptRows = math.max(1000000L, target / 10L)
    val results = Seq(30, 300).map { parts =>
      val tRoot = graft.core.TempDirs.create("graft-scale-ckpt") + "/t"
      val seed2 = spark.range(ckptRows).select(
        lpad(pmod(col("id"), lit(parts.toLong)).cast("string"), 4, "0").as("part"),
        col("id").as("key"), lit(1.0).as("v"))
      ManifestTable.write(seed2, tRoot, Seq("part"))
      val liveFiles = ManifestTable.current(spark, tRoot).get.files.size
      val batch2 = spark.range(ckptRows / parts).select(
        lit("0007").as("part"), (col("id") + ckptRows * 2L).as("key"), lit(-1.0).as("v"))
      val t = System.nanoTime()
      val v = ManifestTable.upsertDedup(spark, batch2, tRoot, Seq("key"), "v", Seq("part"))
      val sec = (System.nanoTime() - t) / 1e9
      val deltaB = manifestBytes(tRoot, v)
      val snapB = manifestBytes(tRoot, 1L)
      println(f"SCALE ckpt: $parts%3d partitions, $liveFiles files live -> " +
        f"delta commit $deltaB B vs v1 snapshot $snapB B, upsert $sec%.1f s")
      (liveFiles, deltaB, snapB, sec)
    }
    val (filesS, deltaS, snapS, _) = results(0)
    val (filesL, deltaL, snapL, _) = results(1)
    check("snapshot manifests grow with the table (the cost deltas avoid)",
      filesL >= 8 * filesS && snapL >= 8 * snapS,
      s"files $filesS->$filesL, snapshot bytes $snapS->$snapL")
    check("delta commit bytes stay flat as live-file count grows 10x",
      deltaL <= 2 * deltaS, s"delta bytes $deltaS->$deltaL")

    // ---- columnar snapshot sidecar at the 10x table ----
    // same 300-partition/9600-file shape, snapshot forced columnar: the
    // committed stub stays tiny and the file list rides a parquet
    // sidecar — the million-file answer (text snapshots re-parse ~100 MB
    // per cold resolve; parquet is columnar, compressed, and immutable)
    spark.conf.set(ManifestTable.ColumnarSnapshotThresholdKey, "500")
    val cRoot = graft.core.TempDirs.create("graft-scale-ckpt-col") + "/t"
    val cSeed = spark.range(ckptRows).select(
      lpad(pmod(col("id"), lit(300L)).cast("string"), 4, "0").as("part"),
      col("id").as("key"), lit(1.0).as("v"))
    ManifestTable.write(cSeed, cRoot, Seq("part"))
    val stubB = manifestBytes(cRoot, 1L)
    val ckptDirs = new org.apache.hadoop.fs.Path(cRoot + "/_manifests")
    val cfs = ckptDirs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecarB = cfs.listStatus(ckptDirs).filter(_.getPath.getName.startsWith("ckpt-"))
      .map(d => cfs.getContentSummary(d.getPath).getLength).sum
    val t2 = System.nanoTime()
    val nCol = ManifestTable.read(spark, cRoot).count()
    val readSec = (System.nanoTime() - t2) / 1e9
    println(f"SCALE ckpt columnar: 9600-file snapshot = $stubB B stub + $sidecarB B parquet " +
      f"sidecar (text snapshot was ${results(1)._3} B); resolve+count $readSec%.1f s")
    check("columnar snapshot: stub is O(1), sidecar beats the text snapshot",
      stubB < 1000 && sidecarB < results(1)._3 && nCol == ckptRows,
      s"stub=$stubB B, sidecar=$sidecarB B vs text=${results(1)._3} B, rows=$nCol")
    spark.conf.unset(ManifestTable.ColumnarSnapshotThresholdKey)

    println(if (failures == 0) "SCALE manifest: ALL CHECKS PASSED"
    else s"SCALE manifest: $failures CHECK(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

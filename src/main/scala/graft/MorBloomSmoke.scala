package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.ManifestTable

/** Scale evidence for round-12's merge-on-read + bloom-index features:
  *
  *  1. DV read overhead — delete 1% of a table merge-on-read and
  *     compare full-read time against the pre-delete baseline and the
  *     copy-on-write alternative's WRITE cost. The MoR delete should
  *     write ~1% of the bytes CoW rewrites, and the DV'd read should
  *     stay within a small constant of the clean read (broadcast anti).
  *  2. Bloom point lookups — hash-scattered keys over 10× file counts:
  *     files scanned with and without the index (min/max prunes
  *     nothing by construction).
  *
  * Run: `sbt "runMain graft.MorBloomSmoke"`; results in SCALE_SMOKE.md.
  */
object MorBloomSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-mor-bloom-smoke",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def minOf3(f: => Long): Double = { f; (1 to 3).map(_ => timeIt(f)._2).min }

    // 1 — merge-on-read delete economics at 2M and 20M rows (10×)
    for (n <- Seq(2L << 20, 20L << 20)) {
      val base = graft.core.TempDirs.create("mor-smoke")
      val df = spark.range(n).select(col("id"),
        md5(col("id").cast("string")).as("pad"),
        (col("id") % 997).cast("double").as("v"))
      val rootM = base + "/mor"; val rootC = base + "/cow"
      ManifestTable.write(df.repartition(32), rootM)
      ManifestTable.write(df.repartition(32), rootC)
      // sum() forces real row reads on every path — a bare count() would
      // let the clean read answer from parquet metadata and make the DV
      // overhead look 15x instead of the real row-vs-row cost
      def readAgg(root: String): Long =
        ManifestTable.read(spark, root).agg(sum("id")).collect().head.getLong(0)
      val cleanRead = minOf3(readAgg(rootM))

      val pred = col("id") % 100 === 0 // 1%, scattered through every file
      val (_, morT) = timeIt(ManifestTable.deleteMoR(spark, rootM, pred))
      val (_, cowT) = timeIt(ManifestTable.delete(spark, rootC, pred))
      val stM = ManifestTable.current(spark, rootM).get
      val dvBytes = stM.files.flatMap(_.dv).map(_.dir).distinct.map { d =>
        val fs = new org.apache.hadoop.fs.Path(rootM)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(new org.apache.hadoop.fs.Path(rootM, d)).getLength
      }.sum
      val dvRead = minOf3(readAgg(rootM))
      val (_, matT) = timeIt(ManifestTable.materializeDeletes(spark, rootM))
      val matRead = minOf3(readAgg(rootM))
      println(f"SCALE mor: rows=$n%9d delete1pct mor=$morT%6.2fs (dv ${dvBytes / 1024}%6d KB) " +
        f"cow=$cowT%6.2fs | read clean=$cleanRead%5.2fs dv=$dvRead%5.2fs " +
        f"materialized=$matRead%5.2fs (materialize $matT%5.2fs)")
    }

    // 2 — bloom index point lookups at 64 and 640 files (10×)
    for (nFiles <- Seq(64, 640)) {
      val root = graft.core.TempDirs.create("bloom-smoke") + "/t"
      val n = nFiles * 100000L
      val df = spark.range(n).select(col("id"),
        md5(col("id").cast("string")).as("pad"))
      ManifestTable.write(df.repartition(nFiles, col("id")), root)
      val (_, buildT) = timeIt(
        ManifestTable.buildBloomIndex(spark, root, Seq("id"), fpp = 0.001))
      def probe() = ManifestTable.readWhere(spark, root, col("id") === 424242L)
      val unindexedFiles = ManifestTable.current(spark, root).get.files.size
      val scanned = probe().inputFiles.length
      val t = minOf3(probe().count())
      println(f"SCALE bloom: files=$unindexedFiles%4d build=$buildT%6.1fs " +
        f"lookup scans $scanned%3d/$unindexedFiles%4d files in $t%5.2fs")
    }
    spark.stop()
  }
}

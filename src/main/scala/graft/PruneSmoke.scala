package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.ManifestTable

/** Scale evidence for manifest data skipping: build manifest tables of
  * 100 and 1000 files (10×) and time a one-partition query through
  * (a) the metadata-pruned [[ManifestTable.readWhere]] and (b) the full
  * read + filter. The pruned path should stay ~flat in file count —
  * it opens only the matching partition's files — while the full path
  * pays the per-file open/footer cost of the whole table.
  *
  * Run: `sbt "runMain graft.PruneSmoke"`; results recorded in
  * SCALE_SMOKE.md.
  */
object PruneSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-prune-smoke",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeIt[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for (nParts <- Seq(100, 1000)) {
      val root = graft.core.TempDirs.create("prune-smoke") + "/t"
      val rowsPerPart = 1000
      val df = spark.range(nParts.toLong * rowsPerPart)
        .select(format_string("d%04d", col("id") % nParts).as("day"),
          col("id"), (col("id") % 97).cast("double").as("v"))
      ManifestTable.write(df.repartition(col("day")), root, partitionCols = Seq("day"))
      val st = ManifestTable.current(spark, root).get
      // warm both paths once (JIT, FS cache), then measure min of 3
      def pruned() = ManifestTable.readWhere(spark, root, col("day") === "d0042").count()
      def full()   = ManifestTable.read(spark, root).filter(col("day") === "d0042").count()
      pruned(); full()
      val pT = (1 to 3).map(_ => timeIt(pruned())._2).min
      val fT = (1 to 3).map(_ => timeIt(full())._2).min
      val prunedFiles = ManifestTable.readWhere(spark, root, col("day") === "d0042")
        .inputFiles.length
      println(f"SCALE prune: files=${st.files.size}%5d pruned-read=$pT%.2fs " +
        f"(scans $prunedFiles files) full-read=$fT%.2fs rows=${pruned()}")
    }

    // z-order vs linear clustering: point/range filters on EACH of two
    // clustered axes — file-skip counts per layout (the multi-dimensional
    // skipping claim, measured)
    locally {
      val root = graft.core.TempDirs.create("prune-smoke-z") + "/t"
      val n = 1 << 20 // 1M rows, 1024x1024 grid, high-entropy padding
      val grid = spark.range(n).select(
        (col("id") % 1024).as("a"), (col("id") / 1024).as("b"),
        concat((0 until 4).map(i => md5(concat(col("id").cast("string"), lit(i)))): _*).as("pad"))
      ManifestTable.write(grid.repartition(32), root)
      val vLin = ManifestTable.cluster(spark, root, sortCols = Seq("a", "b"), targetFileMB = 4)
      val vZ = ManifestTable.cluster(spark, root, sortCols = Seq("a", "b"),
        targetFileMB = 4, zOrder = true)
      val total = ManifestTable.current(spark, root).get.files.size
      def scanned(v: Long, f: org.apache.spark.sql.Column) =
        ManifestTable.readVersionWhere(spark, root, v, f).inputFiles.length
      for ((name, f) <- Seq(
          "a=17" -> (col("a") === 17), "b=17" -> (col("b") === 17),
          "a in [100,120]" -> col("a").between(100, 120),
          "b in [100,120]" -> col("b").between(100, 120))) {
        println(f"SCALE zorder: files=$total%4d filter=$name%-16s " +
          f"linear-scans=${scanned(vLin, f)}%4d z-scans=${scanned(vZ, f)}%4d")
      }
    }
    spark.stop()
  }
}

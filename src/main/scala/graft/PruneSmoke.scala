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
      val root = java.nio.file.Files.createTempDirectory("prune-smoke").toString + "/t"
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
    spark.stop()
  }
}

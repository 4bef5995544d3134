package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.sources.ManifestTable

/** Micro-evidence for the shallow-clone O(metadata) claim: build a
  * manifest table from `orders` at 1× and 10× scale (same file-count
  * shape: 32 shuffle tasks → ~32 files each, 10× the bytes), time
  * `cloneTable` on both. A shallow clone reads one manifest and writes
  * one manifest — its wall time must track the FILE COUNT (flat here),
  * never the data volume, where a deep clone tracks bytes. Run:
  * `sbt "runMain graft.CloneScale"` (expects /tmp/graft_sf1 from
  * graft.ScaleStep); results recorded in SCALE_SMOKE.md. */
object CloneScale {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.builder("graft-clone-scale",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")

    def buildAndTime(src: String, label: String): Unit = {
      val base = graft.core.TempDirs.create("clone-scale")
      val root = s"$base/orders"
      ManifestTable.write(
        spark.read.parquet(s"$src/orders.parquet").repartition(32), root)
      val st = ManifestTable.current(spark, root).get
      val bytes = st.files.map(_.bytes).sum
      // min-of-3: the clone is a driver-side manifest round-trip
      val secs = (1 to 3).map { i =>
        val dst = s"$base/clone$i"
        val t0 = System.nanoTime()
        ManifestTable.cloneTable(spark, root, dst)
        (System.nanoTime() - t0) / 1e9
      }.min
      val deepT0 = System.nanoTime()
      ManifestTable.cloneTable(spark, root, s"$base/deep", deep = true)
      val deepSecs = (System.nanoTime() - deepT0) / 1e9
      println(f"CLONE scale: $label%-6s files=${st.files.size}%3d " +
        f"bytes=$bytes%11d shallow=$secs%6.3fs deep=$deepSecs%6.3fs")
    }

    buildAndTime(small, "1x")
    buildAndTime(big, "10x")
    spark.stop()
  }
}

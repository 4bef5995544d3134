package graft

import org.apache.hadoop.fs.Path

/** Scratch: reproduce the CloneSpec seed and compare on-disk leaf files
  * vs manifest entries. */
object SeedProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.builder("seedprobe", "local[4]", 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-seedprobe").toString + "/t"
    graft.sources.ManifestTable.write(
      Seq(("2026-01-01", 1L, 10.0), ("2026-01-01", 2L, 20.0),
          ("2026-01-02", 3L, 30.0), ("2026-01-02", 4L, 40.0))
        .toDF("date", "key", "v"),
      root, partitionCols = Seq("date"))
    val st = graft.sources.ManifestTable.current(s, root).get
    println(s"manifest entries: ${st.files.size}")
    st.files.foreach(f => println(s"  ${f.relPath} ${f.bytes}"))
    // on-disk census
    import scala.sys.process._
    println("on-disk parquet files:")
    println(Seq("bash", "-c", s"find $root -name '*.parquet' | sort").!!)
    s.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch: file count + footer-read cost of a k45-shaped INSERT. */
object K45Files {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = graft.core.GraftSession.builder("k45files", "local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ns = "k45f_" + java.util.UUID.randomUUID().toString.take(8)
    s.sql(s"CREATE NAMESPACE graft_lake.$ns")
    s.sql(s"CREATE TABLE graft_lake.$ns.e (event_id BIGINT, " +
      "user_id BIGINT, day DATE, b4 INT) PARTITIONED BY (day, b4)")
    graft.core.Tables.table(s, d, "events").select(col("event_id"), col("user_id"),
        to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(4)).cast("int").as("b4"))
      .createOrReplaceTempView("k45f_src")
    val t0 = System.nanoTime()
    s.sql(s"INSERT INTO graft_lake.$ns.e SELECT * FROM k45f_src")
    println(f"insert: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
    val root = new java.io.File(s"$wh/$ns/e")
    require(root.isDirectory, s"warehouse table dir not found: $root")
    val files = new scala.collection.mutable.ArrayBuffer[java.io.File]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles.foreach(walk)
      else if (f.getName.endsWith(".parquet")) files += f
    walk(root)
    println(s"parquet files: ${files.size}, bytes: ${files.map(_.length).sum}")
    // time the footer reads the way listGeneration does them (sequential)
    val conf = s.sparkContext.hadoopConfiguration
    val t1 = System.nanoTime()
    files.foreach { f =>
      graft.sources.DataSkipping.footerInfo(conf,
        new org.apache.hadoop.fs.Path(f.getAbsolutePath))
    }
    println(f"sequential footer reads: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    s.stop()
  }
}

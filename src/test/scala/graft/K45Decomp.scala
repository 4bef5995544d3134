package graft

import org.apache.spark.sql.functions._

/** Scratch: decompose the k45 INSERT — bare partitioned parquet write vs
  * ManifestTable.append on the same frame. */
object K45Decomp {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = graft.core.GraftSession.builder("k45d", "local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); a
    }
    val ev = graft.core.Tables.table(s, d, "events").select(col("event_id"),
      col("user_id"), to_date(col("ts")).as("day"),
      pmod(col("user_id"), lit(4)).cast("int").as("b4"))
    ev.count() // warm
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val base = graft.core.TempDirs.create("graft-k45d")
      time("bare write unshaped") {
        ev.write.partitionBy("day", "b4").parquet(base + "/bare")
      }
      time("bare write rebalanced") {
        ev.hint("rebalance", col("day"), col("b4"))
          .write.partitionBy("day", "b4").parquet(base + "/bare2")
      }
      time("bare write rebalanced 64k") {
        val iso = org.apache.spark.sql.graftshim.SessionIsolation.sessionWithConf(
          s, "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k")
        org.apache.spark.sql.graftshim.SessionIsolation.rebind(
          ev.hint("rebalance", col("day"), col("b4")), iso)
          .write.partitionBy("day", "b4").parquet(base + "/bare3")
      }
      val root = base + "/mt"
      time("createEmpty") {
        graft.sources.ManifestTable.createEmpty(s, root, ev.schema,
          partitionCols = Seq("day", "b4"))
      }
      time("append") {
        graft.sources.ManifestTable.append(s, ev, root)
      }
    }
    s.stop()
  }
}

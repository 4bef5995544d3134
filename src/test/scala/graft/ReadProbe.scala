package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Scratch: how much does constructing a ManifestTable read cost (schema
  * inference, listing), and does it fire Spark jobs per read? */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = graft.core.GraftSession.builder("readprobe", "local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ev = graft.core.Tables.table(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    ev.count()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    def time[A](label: String)(body: => A): A = {
      val j0 = jobCount.get(); val t0 = System.nanoTime(); val a = body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"$label%-36s ${dt}%7.3f s  jobs=${jobCount.get() - j0}"); a
    }
    val base = graft.core.TempDirs.create("graft-readprobe")
    val root = base + "/t"
    time("createEmpty bucket(16)") {
      graft.sources.ManifestTable.createEmpty(s, root, ev.schema,
        partitionCols = Seq("bucket(16, o_orderkey)"))
    }
    time("append (commit)") {
      graft.sources.ManifestTable.append(s, ev, root)
    }
    (1 to 4).foreach { i =>
      val df = time(s"read construct #$i") {
        graft.sources.ManifestTable.read(s, root)
      }
      time(s"  count #$i")(df.count())
    }
    time("append 2nd gen") {
      graft.sources.ManifestTable.append(s, ev.limit(1000), root)
    }
    (1 to 2).foreach { i =>
      val df = time(s"read construct 2gen #$i") {
        graft.sources.ManifestTable.read(s, root)
      }
      time(s"  count 2gen #$i")(df.count())
    }
    s.stop()
  }
}

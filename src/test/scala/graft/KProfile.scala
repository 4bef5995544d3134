package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch: decompose a lifecycle query's wall time into Spark jobs
  * (bucketed by first-stage call site) vs driver-only gaps, and sample the
  * driver thread's stack during the run to attribute the gaps. Usage:
  *   SPARK_GRAFT_PROFILE=k41_rename_native sbt "Test/runMain graft.KProfile"
  */
object KProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "k41_rename_native")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val s = graft.core.GraftSession
      .builder("kprofile", "local[32]", shufflePartitions = 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries("q1_agg")(s, d)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    final case class Job(id: Int, site: String, start: Long, var end: Long = -1L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, site, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      q(s, d).write.mode("overwrite").format("noop").save() // warm rep
      jobs.clear()
      s.sparkContext.addSparkListener(listener)
      // sample the MAIN thread's stack every 10 ms while the query runs
      val main = Thread.currentThread()
      val samples = mutable.HashMap.empty[String, Int]
      val deep = sys.env.get("SPARK_GRAFT_PROFILE_DEEP") // substring to match top frame
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = main.getStackTrace
          // collapse to the topmost "interesting" frame: first graft/spark
          // frame below any Thread/Object wait noise
          val top = st.find { f =>
            val c = f.getClassName
            (c.startsWith("graft.") || c.startsWith("org.apache.spark.") ||
              c.startsWith("org.apache.hadoop.") || c.startsWith("org.apache.parquet.")) &&
              !c.contains("KProfile")
          }
          val key = top
            .map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
            .getOrElse(st.headOption.map(f => f.getClassName + "." + f.getMethodName).getOrElse("idle"))
          val full = deep match {
            case Some(pat) if key.contains(pat) =>
              key + "\n        " + st.drop(st.indexOf(top.orNull)).take(14)
                .map(f => f.getClassName + "." + f.getMethodName + ":" + f.getLineNumber)
                .mkString("\n        ")
            case _ => key
          }
          samples.synchronized { samples(full) = samples.getOrElse(full, 0) + 1 }
          Thread.sleep(10)
        }
      }, "kprofile-sampler")
      sampler.setDaemon(true)
      val t0 = System.nanoTime()
      sampler.start()
      q(s, d).write.mode("overwrite").format("noop").save()
      sampling = false
      val wall = (System.nanoTime() - t0) / 1e9
      sampler.join(500)
      Thread.sleep(300)
      s.sparkContext.removeSparkListener(listener)
      val done = jobs.synchronized { jobs.values.filter(_.end > 0).toSeq }
      val bySite = done.groupBy(_.site).map { case (site, js) =>
        (site, js.size, js.map(j => j.end - j.start).sum / 1e3)
      }.toSeq.sortBy(-_._3)
      val jobSum = done.map(j => j.end - j.start).sum / 1e3
      println(f"=== $name  wall=$wall%.2f s  jobs=${done.size}  jobSum=$jobSum%.2f s  driverGap~=${wall - jobSum}%.2f s")
      println("  -- jobs by site:")
      bySite.foreach { case (site, n, sec) =>
        println(f"  $sec%7.3f s  n=$n%-3d $site")
      }
      println("  -- driver main-thread samples (10ms):")
      samples.synchronized {
        samples.toSeq.sortBy(-_._2).take(20).foreach { case (k, n) =>
          println(f"  ${n * 0.010}%7.2f s  $k")
        }
      }
    }
    s.stop()
  }
}

package graft

/** Round-19 measurement aid: dump `.explain("formatted")` for every
  * declared driver query to plans/<tag>/<query>_<suffix>.txt.
  *
  * `Test/runMain graft.PlanDumpAll <tag> <suffix> [sfDir] [onlyCsv]`
  *
  * Uses the bench session shape (local[32], 32 shuffle partitions) so the
  * dumped plans match what the driver's bench executes. k-series queries
  * run their lifecycle setup (temp-table commits) at build time — that is
  * part of the query by design; the dumped plan is the final read, which
  * is what plan claims are checked against.
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r19"
    val suffix = if (args.length > 1) args(1) else "before"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val out = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(out)
    val s = graft.core.GraftSession.builder("plan-dump", "local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(s, dir)
        val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.explainString(mode)
        java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"dumped $name")
      } catch {
        case e: Throwable =>
          println(s"FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    s.stop()
  }
}

package graft

/** Local iteration aid: print the physical plan of a named driver query.
  * `Test/runMain graft.PlanDump <query> [sfDir]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q1_agg"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = graft.core.GraftSession.builder("plan", "local[4]", 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println(SparkEntry.queries(name)(s, dir).queryExecution.executedPlan.toString)
    s.stop()
  }
}

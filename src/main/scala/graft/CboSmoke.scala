package graft
/** A/B timing smoke for the CBO session posture: the headline query
  * subset 5×-min-timed with cost-based optimization on vs off — the
  * measurement harness class (ScaleSmoke/PruneSmoke family), not a
  * production surface. */
object CboSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("cbo-smoke", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val qs = Seq("q3_shipping", "q4_priority", "q8_market_share", "f3_eq_filter",
      "sf_dates", "a12_rollup", "j5_join_agg", "w5_running_sum", "q1_agg",
      "u2_keep_last", "a2_hourly_stats", "d_exact_dedup")
    def run(): Double = qs.map { n =>
      (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }.sum
    run(); run() // warm twice
    // interleave configs to cancel drift; 3 rounds each
    val res = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 3; (cbo, rq) <- Seq(("true","false"), ("false","false"),
                                       ("true","true"), ("false","true"))) {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", rq)
      val k = s"cbo=$cbo rq=$rq"
      res(k) = run() :: res(k)
    }
    res.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"$k%24s min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

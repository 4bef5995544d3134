package graft

import org.apache.spark.sql.functions._

/** Round-19 measurement scratch: where do k45_typed_partition's seconds
  * go? Replays the query's phases with timers. Test-scope only. */
object K45Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = graft.core.GraftSession.builder("k45probe", "local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); a
    }
    // warm the session like the bench does
    SparkEntry.queries("q1_agg")(s, d).write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val ns = "k45p_" + java.util.UUID.randomUUID().toString.take(8)
      time("create") {
        s.sql(s"CREATE NAMESPACE graft_lake.$ns")
        s.sql(s"CREATE TABLE graft_lake.$ns.e (event_id BIGINT, " +
          "user_id BIGINT, day DATE, b4 INT) PARTITIONED BY (day, b4)")
      }
      graft.core.Tables.table(s, d, "events").select(col("event_id"), col("user_id"),
          to_date(col("ts")).as("day"),
          pmod(col("user_id"), lit(4)).cast("int").as("b4"))
        .createOrReplaceTempView("k45p_src")
      time("insert") {
        s.sql(s"INSERT INTO graft_lake.$ns.e SELECT * FROM k45p_src")
      }
      val grouped = time("grouped") {
        s.sql(s"SELECT day, count(*) AS n_day " +
          s"FROM graft_lake.$ns.e WHERE b4 IN (0, 3) GROUP BY day")
          .localCheckpoint()
      }
      val eq = time("eq") {
        s.sql(s"SELECT count(*) AS n_eq, min(event_id) AS mn_id, " +
          s"max(event_id) AS mx_id FROM graft_lake.$ns.e " +
          s"WHERE day = DATE'2024-01-05'").localCheckpoint()
      }
      val range = time("range") {
        s.sql(s"SELECT count(*) AS n_range FROM graft_lake.$ns.e " +
          s"WHERE day >= DATE'2024-01-10' AND day < DATE'2024-01-20' AND b4 = 2")
          .localCheckpoint()
      }
      time("delete") {
        s.sql(s"DELETE FROM graft_lake.$ns.e WHERE day = DATE'2024-01-01'")
      }
      val after = time("count-after") {
        s.sql(s"SELECT count(*) AS n_after FROM graft_lake.$ns.e").localCheckpoint()
      }
      time("collect+drop") {
        grouped.crossJoin(eq).crossJoin(range).crossJoin(after).collect()
        s.sql(s"DROP TABLE graft_lake.$ns.e")
        s.sql(s"DROP NAMESPACE graft_lake.$ns")
      }
    }
    s.stop()
  }
}

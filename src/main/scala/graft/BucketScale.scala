package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Scale evidence for the storage-partitioned join: at a given SF dir,
  * build co-bucketed orders/lineitem catalog tables with N buckets and
  * time the SPJ join (zero Exchange, parallelism = N) against the same
  * join through the V1 bridge (both sides shuffled across all cores).
  * The point the table makes: the BUCKET COUNT is the parallelism knob
  * — at 10× data an 8-bucket join pays ~the data growth per task, a
  * 32-bucket layout restores task-level parallelism, and at cluster
  * scale you pick N ≈ core count (the Iceberg/Hive bucketing contract).
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.BucketScale 8 32"
  *
  * `skew` mode (SPARK_GRAFT_SF_DIR=… sbt "runMain graft.BucketScale skew"):
  * plants ~40% of the fact rows on ONE key (one hot bucket) and times the
  * SPJ three ways — grouped (default: one task per bucket, so the hot
  * bucket is a straggler serializing the stage), PARTIALLY CLUSTERED
  * (spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  * .enabled: the fact side keeps its per-file partitions, so the hot
  * bucket runs as one task per file), and the shuffled V1 fallback
  * (where AQE's skew-join split handles it). The fact side is written in
  * four commits so every bucket holds four files — the unit partially
  * clustered distribution can split at.
  */
object BucketScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-bucket-scale",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ns = args.headOption.map(_ => args.toSeq).getOrElse(Seq("8", "32"))

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (ns.headOption.contains("skew")) {
      skew(spark, dir, ns.drop(1).headOption.map(_.toInt).getOrElse(16))
      spark.stop()
      return
    }

    println(f"${"buckets"}%8s ${"setup_s"}%8s ${"spj_s"}%8s ${"shuffled_s"}%11s")
    ns.map(_.toInt).foreach { n =>
      val nsName = s"bscale_${n}_${java.util.UUID.randomUUID().toString.take(6)}"
      spark.sql(s"CREATE NAMESPACE graft_lake.$nsName")
      val (_, setup) = time {
        spark.sql(s"CREATE TABLE graft_lake.$nsName.o (o_orderkey BIGINT, " +
          s"o_orderpriority STRING) PARTITIONED BY (bucket($n, o_orderkey))")
        spark.sql(s"CREATE TABLE graft_lake.$nsName.l (l_orderkey BIGINT, " +
          s"l_extendedprice DOUBLE) PARTITIONED BY (bucket($n, l_orderkey))")
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
          .createOrReplaceTempView("bscale_o")
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"))
          .createOrReplaceTempView("bscale_l")
        spark.sql(s"INSERT INTO graft_lake.$nsName.o " +
          "SELECT o_orderkey, o_orderpriority, NULL FROM bscale_o")
        spark.sql(s"INSERT INTO graft_lake.$nsName.l " +
          "SELECT l_orderkey, l_extendedprice, NULL FROM bscale_l")
      }
      val q =
        s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
           |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |FROM graft_lake.$nsName.o o JOIN graft_lake.$nsName.l l
           |  ON o.o_orderkey = l.l_orderkey
           |GROUP BY o.o_orderpriority""".stripMargin
      def run(): Double =
        (1 to 2).map { _ =>
          val (_, t) = time(spark.sql(q).write.mode("overwrite")
            .format("noop").save())
          t
        }.min
      val spj = run()
      spark.conf.set(graft.sources.v2.GraftBatchScan.EnabledKey, "false")
      val shuffled = run()
      spark.conf.unset(graft.sources.v2.GraftBatchScan.EnabledKey)
      println(f"BUCKET scale: $n%8d $setup%8.2f $spj%8.2f $shuffled%11.2f")
      // data-scale temp tables: drop before the next config
      spark.sql(s"DROP TABLE graft_lake.$nsName.o")
      spark.sql(s"DROP TABLE graft_lake.$nsName.l")
      spark.sql(s"DROP NAMESPACE graft_lake.$nsName")
    }
    spark.stop()
  }

  private def skew(spark: SparkSession, dir: String, n: Int): Unit = {
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val nsName = s"bskew_${java.util.UUID.randomUUID().toString.take(6)}"
    spark.sql(s"CREATE NAMESPACE graft_lake.$nsName")
    val (_, setup) = time {
      spark.sql(s"CREATE TABLE graft_lake.$nsName.l (l_orderkey BIGINT, " +
        s"l_extendedprice DOUBLE) PARTITIONED BY (bucket($n, l_orderkey))")
      spark.sql(s"CREATE TABLE graft_lake.$nsName.o (o_orderkey BIGINT, " +
        s"o_orderpriority STRING) PARTITIONED BY (bucket($n, o_orderkey))")
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("bskew_o")
      // ~40% of LINEITEM rows planted on one key → one hot bucket; four
      // commits so the hot bucket holds four files (the split unit)
      Tables.lineitem(spark, dir)
        .select(when(col("l_orderkey") % 5 < 2, lit(42L))
          .otherwise(col("l_orderkey")).as("l_orderkey"),
          col("l_extendedprice"))
        .createOrReplaceTempView("bskew_l")
      spark.sql(s"INSERT INTO graft_lake.$nsName.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM bskew_o")
      (0 until 4).foreach(i =>
        spark.sql(s"INSERT INTO graft_lake.$nsName.l " +
          s"SELECT l_orderkey, l_extendedprice, NULL FROM bskew_l " +
          s"WHERE pmod(hash(l_extendedprice), 4) = $i"))
    }
    val q =
      s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
         |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
         |FROM graft_lake.$nsName.o o JOIN graft_lake.$nsName.l l
         |  ON o.o_orderkey = l.l_orderkey
         |GROUP BY o.o_orderpriority""".stripMargin
    def run(): Double =
      (1 to 2).map { _ =>
        val (_, t) = time(spark.sql(q).write.mode("overwrite")
          .format("noop").save())
        t
      }.min
    val grouped = run()
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
    val partial = run()
    spark.conf.unset(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    spark.conf.set(graft.sources.v2.GraftBatchScan.EnabledKey, "false")
    val shuffled = run()
    spark.conf.unset(graft.sources.v2.GraftBatchScan.EnabledKey)
    println(f"SKEW scale (buckets=$n, 40%% hot key): setup $setup%.2f s, " +
      f"SPJ grouped $grouped%.2f s, SPJ partially-clustered $partial%.2f s, " +
      f"shuffled $shuffled%.2f s")
    spark.sql(s"DROP TABLE graft_lake.$nsName.o")
    spark.sql(s"DROP TABLE graft_lake.$nsName.l")
    spark.sql(s"DROP NAMESPACE graft_lake.$nsName")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.ManifestTable

/** Write-overhead evidence for the DEFAULT bucket-source ndv sketches
  * ([[ManifestTable.AutoNdvKey]]): times the same bucketed INSERT with
  * the auto sketches on and off at two data sizes. The sketch pass
  * re-reads the commit's OWN new files (page-cache warm) for the
  * layout's source columns only, so the overhead should be a small,
  * FLAT fraction of the write — not a new scaling term. */
object NdvSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-ndv-smoke",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"rows"}%10s ${"auto_on_s"}%10s ${"auto_off_s"}%11s ${"overhead"}%9s")
    Seq(1000000L, 4000000L).foreach { rows =>
      val walls = Seq(true, false).map { auto =>
        spark.conf.set(ManifestTable.AutoNdvKey, auto.toString)
        // min-of-2: the first insert of a size pays one-time JIT/IO
        (1 to 2).map { i =>
          val ns = s"ndvs_${java.util.UUID.randomUUID().toString.take(8)}"
          spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
          spark.sql(s"CREATE TABLE graft_lake.$ns.t " +
            "(k BIGINT, s STRING, v DOUBLE) PARTITIONED BY (bucket(16, s))")
          val (_, w) = time {
            spark.sql(s"INSERT INTO graft_lake.$ns.t SELECT id, " +
              "concat('u_', CAST(pmod(hash(id), 50000) AS STRING)), " +
              "CAST(id AS DOUBLE), NULL FROM range(0, " + rows + ")")
          }
          spark.sql(s"DROP TABLE graft_lake.$ns.t")
          spark.sql(s"DROP NAMESPACE graft_lake.$ns")
          w
        }.min
      }
      spark.conf.unset(ManifestTable.AutoNdvKey)
      val Seq(on, off) = walls
      println(f"$rows%10d $on%10.1f $off%11.1f ${(on / off - 1) * 100}%8.1f%%")
    }

    // the MICRO-COMMIT loop (streaming-sink shape): 20 commits of 500
    // rows each. Under the default rows-per-commit floor
    // ([[ManifestTable.AutoNdvMinRowsKey]]) every commit skips the
    // sketch job; minRows=0 forces the pre-r18 behavior (sketch every
    // commit) — the delta is the per-micro-batch tax the floor removes.
    def microLoop(floor: Option[String]): Double = {
      floor.foreach(f => spark.conf.set(ManifestTable.AutoNdvMinRowsKey, f))
      val ns = s"ndvs_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
      spark.sql(s"CREATE TABLE graft_lake.$ns.t " +
        "(k BIGINT, s STRING, v DOUBLE) PARTITIONED BY (bucket(16, s))")
      val (_, w) = time {
        (0 until 20).foreach { i =>
          spark.sql(s"INSERT INTO graft_lake.$ns.t SELECT id, " +
            "concat('u_', CAST(pmod(hash(id), 50000) AS STRING)), " +
            s"CAST(id AS DOUBLE), NULL FROM range(${i * 500}, ${i * 500 + 500})")
        }
      }
      spark.sql(s"DROP TABLE graft_lake.$ns.t")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns")
      spark.conf.unset(ManifestTable.AutoNdvMinRowsKey)
      w
    }
    // one discarded warmup loop, then ALTERNATING min-of-2 per setting:
    // the first measurement of this shape pays JIT/codegen once, and a
    // fixed run order would hand that cost to whichever label ran
    // first (it inverted the first reading of this table)
    microLoop(None)
    val micro = Seq("default" -> None, "minRows=0" -> Some("0"),
        "default" -> None, "minRows=0" -> Some("0"))
      .map { case (label, floor) => label -> microLoop(floor) }
      .groupMapReduce(_._1)(_._2)(math.min)
    val show = Seq("default", "minRows=0").map(l =>
      f"$l ${micro(l)}%.1f s (${micro(l) / 20}%.2f s/commit)")
    println(s"micro-commit loop (20 x 500 rows, min-of-2 alternating): " +
      show.mkString(", "))

    // COVERAGE RESTORATION cost: a micro-commit-built table (zero
    // sketches by the floor's design) regains full CBO ndv either via
    // GRAFT ANALYZE (read the unsketched bytes once, ONE metadata
    // commit) or via OPTIMIZE (full data rewrite that re-sketches as a
    // side effect). Same table shape, min-of-2 each, built fresh per
    // measurement — the ratio is the point.
    def buildMicroTable(): (String, String) = {
      val ns = s"ndvs_${java.util.UUID.randomUUID().toString.take(8)}"
      val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
      spark.sql(s"CREATE NAMESPACE graft_lake.$ns")
      spark.sql(s"CREATE TABLE graft_lake.$ns.t " +
        "(k BIGINT, s STRING, v DOUBLE) PARTITIONED BY (bucket(16, s))")
      // floor raised past the commit size: every commit skips the
      // sketch, leaving the zero-coverage state the restore ops fix
      spark.conf.set(ManifestTable.AutoNdvMinRowsKey, "100000")
      try (0 until 20).foreach { i =>
        spark.sql(s"INSERT INTO graft_lake.$ns.t SELECT id, " +
          "concat('u_', CAST(pmod(hash(id), 50000) AS STRING)), " +
          s"CAST(id AS DOUBLE), NULL FROM range(${i * 50000}, ${(i + 1) * 50000})")
      } finally spark.conf.unset(ManifestTable.AutoNdvMinRowsKey)
      (ns, s"$wh/$ns/t")
    }
    def drop(ns: String): Unit = {
      spark.sql(s"DROP TABLE graft_lake.$ns.t")
      spark.sql(s"DROP NAMESPACE graft_lake.$ns")
    }
    def covered(root: String): Boolean = ManifestTable.current(spark, root)
      .get.files.forall(_.stats.get("s").exists(_.ndv.isDefined))
    val restore = (1 to 2).map { _ =>
      val (nsA, rootA) = buildMicroTable()
      assert(!covered(rootA))
      val (_, analyzeS) = time(spark.sql(s"GRAFT ANALYZE graft_lake.$nsA.t").collect())
      assert(covered(rootA)); drop(nsA)
      val (nsO, rootO) = buildMicroTable()
      val (_, optimizeS) = time(spark.sql(s"GRAFT OPTIMIZE graft_lake.$nsO.t").collect())
      assert(covered(rootO)); drop(nsO)
      (analyzeS, optimizeS)
    }
    val (aMin, oMin) = (restore.map(_._1).min, restore.map(_._2).min)
    println(f"coverage restore (20 x 50k-row micro commits, min-of-2): " +
      f"GRAFT ANALYZE $aMin%.1f s vs OPTIMIZE $oMin%.1f s " +
      f"(${oMin / aMin}%.1f x) — metadata-only vs full rewrite")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.ManifestTable

/** Scale evidence for the round-11 headline: incremental consumption
  * cost tracks the BATCH, not the table. Build manifest tables of 100
  * and 1000 partitions (10×), upsert ONE partition, and time
  * (a) the incremental hop — consumeChanges reads only the change set —
  * against (b) the snapshot hop a pre-incremental pipeline pays
  * (full re-read + re-aggregate). The incremental hop should stay ~flat
  * across the 10× table; the snapshot hop pays the table.
  *
  * Run: `sbt "runMain graft.ScaleSmokeIncremental"`; results recorded in
  * SCALE_SMOKE.md.
  */
object ScaleSmokeIncremental {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-incr-smoke",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (nParts <- Seq(100, 1000)) {
      val base = graft.core.TempDirs.create("incr-smoke")
      val src = base + "/src"
      val dstI = base + "/dst_incremental"
      val dstS = base + "/dst_snapshot"
      val rowsPerPart = 1000
      val df = spark.range(nParts.toLong * rowsPerPart)
        .select(format_string("d%04d", col("id") % nParts).as("day"),
          col("id"), (col("id") % 97).cast("double").as("v"))
      ManifestTable.write(df.repartition(col("day")), src, partitionCols = Seq("day"))

      def freshBatch(tag: Int) = spark.range(rowsPerPart)
        .select(lit("d0042").as("day"), (col("id") + 1000000L * tag).as("id"),
          lit(tag.toDouble).as("v"))

      def hopIncremental(): Option[Long] =
        ManifestTable.consumeChanges(spark, src, dstI, "rollup",
          keys = Seq("day"), order = "total") { ch =>
          ch.groupBy("day").agg(sum("v").as("total"), count(lit(1)).as("n"))
        }

      def hopSnapshot(): Long = {
        val agg = ManifestTable.read(spark, src)
          .groupBy("day").agg(sum("v").as("total"), count(lit(1)).as("n"))
        ManifestTable.write(agg, dstS)
      }

      // bootstrap both consumers, then measure steady-state hops after a
      // one-partition upsert (warm JVM; min of 2)
      hopIncremental(); hopSnapshot()
      val (iT, sT) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (tag <- 1 to 2) {
        ManifestTable.upsertDedup(spark, freshBatch(tag), src,
          keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
        iT += timeIt(hopIncremental())
        sT += timeIt(hopSnapshot())
      }
      println(f"SCALE incr-hop: parts=$nParts%5d incremental=${iT.result().min}%.2fs " +
        f"snapshot-rehop=${sT.result().min}%.2fs")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Ann

/** Measures SemDeDup cell-size SKEW on a CLUSTERED corpus — the
  * SCALE_SMOKE evidence for [[Ann.PairSaltRowsKey]].
  *
  * [[Ann.adaptiveCellCount]] bounds the AVERAGE cell at ⌈√n⌉, and
  * AnnScale's uniform corpus cannot see what real clustered embeddings
  * do to the MAX: a mass of near-identical vectors (exactly the input
  * SemDeDup exists to clean) collapses into one point-dense cell that
  * k-means cannot split, and the pair stage's triangular self-join does
  * m²/2 comparisons for that cell in ONE task. This harness builds a
  * deterministic mixture corpus — `SPARK_ANN_BLOB_PCT`% of rows in
  * 2^-weighted near-duplicate blobs (blob g of B holds 2^(g+1-B) of the
  * blob mass, ε = 1e-3 spread), the rest uniform like AnnScale — trains
  * real k-means centroids at the √n default, and reports:
  *
  *  - the realized cell-size distribution (max, mean, max/mean, top-5),
  *  - the full semanticDedup wall with the pair-stage salt DISABLED
  *    (cap 0: the hot cell is one straggler task) vs the DEFAULT cap,
  *  - kept-count equality between the two runs (the spec pins
  *    bit-equality at unit scale; this re-checks at corpus scale).
  *
  * Env: SPARK_ANN_N (default 1M), SPARK_ANN_BLOB_PCT (default 10),
  * SPARK_ANN_BLOBS (default 4), SPARK_ANN_SKEW_UNSALTED=0 skips the
  * straggler run (for large n where one m² task is the known hour). */
object AnnSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-ann-skew",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_ANN_N", "1000000").toLong
    val blobPct = sys.env.getOrElse("SPARK_ANN_BLOB_PCT", "10").toInt
    val blobs = sys.env.getOrElse("SPARK_ANN_BLOBS", "4").toInt
    val runUnsalted = !sys.env.get("SPARK_ANN_SKEW_UNSALTED").contains("0")
    val dim = 64
    val root = s"/tmp/graft_ann_skew_${n / 1000000}m_${blobPct}p"

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic mixture (hash-derived, no RNG): a row is a blob row
    // iff hash(i,1) % 100 < blobPct; its blob is 2^-weighted via
    // g = floor(log2(1 + hash(i,2) % 2^B)) — blob B-1 carries half the
    // blob mass. Blob vectors are center(g) + ε with ε ≤ 1e-3 per
    // component, so every blob pair clears a 0.99 cosine threshold.
    val (_, buildS) = time {
      if (!new java.io.File(root).exists()) {
        val isBlob = pmod(hash(col("vec_id"), lit(1)), lit(100)) < blobPct
        val g = floor(log2(pmod(hash(col("vec_id"), lit(2)),
          lit(1 << blobs)) + 1)).cast("int")
        val uniformJ = (j: org.apache.spark.sql.Column) =>
          (pmod(hash(col("vec_id"), j), lit(2000)) / lit(1000.0) - 1.0)
        val blobJ = (j: org.apache.spark.sql.Column) =>
          (pmod(hash(g, j, lit(7)), lit(2000)) / lit(1000.0) - 1.0) +
            pmod(hash(col("vec_id"), j, lit(5)), lit(100)) / lit(100000.0)
        spark.range(n).toDF("vec_id")
          .select(col("vec_id"),
            transform(sequence(lit(0), lit(dim - 1)), j =>
              when(isBlob, blobJ(j)).otherwise(uniformJ(j)).cast("float"))
              .as("embedding"))
          .repartition(64)
          .write.mode("overwrite").parquet(root)
      }
    }
    val corpus = spark.read.parquet(root)
    corpus.count() // warm reader + JIT outside the timed passes

    val k = Ann.adaptiveCellCount(n)
    // real k-means at the √n default, trained on a deterministic 5%
    // sample (the documented 100 TB practice) — THE experiment is what
    // its centroids do to cell sizes on clustered data
    val (cents, trainS) = time {
      val c = Ann.trainCentroids(
        corpus.filter(col("vec_id") % 20 === 0), "embedding", k)
      c.cache().count(); c
    }

    val (cellRows, assignS) = time {
      val a = Ann.assignCells(corpus, "vec_id", "embedding", cents)
        .groupBy(col("cell_id")).count()
        .orderBy(col("count").desc)
        .collect().map(r => r.getLong(1))
      a
    }
    val mx = cellRows.head
    val mean = cellRows.sum.toDouble / cellRows.length
    val top5 = cellRows.take(5).mkString("[", ",", "]")

    def dedupKept(cap: String): (Long, Double) = {
      spark.conf.set(Ann.PairSaltRowsKey, cap)
      try time {
        Ann.semanticDedup(corpus, "vec_id", "embedding", cents, 0.99)
          .agg(sum(col("kept"))).head().getLong(0)
      } finally spark.conf.unset(Ann.PairSaltRowsKey)
    }
    val (keptSalted, saltedS) = dedupKept(Ann.PairSaltRowsDefault.toString)
    val (keptUnsalted, unsaltedS) =
      if (runUnsalted) dedupKept("0") else (keptSalted, -1.0)

    println(s"""{"metric":"ann_skew","n":$n,"dim":$dim,"k":$k,""" +
      s""""blob_pct":$blobPct,"blobs":$blobs,""" +
      s""""build_s":${f"$buildS%.1f"},"train_s":${f"$trainS%.1f"},""" +
      s""""assign_s":${f"$assignS%.1f"},""" +
      s""""cells":${cellRows.length},"cell_max":$mx,""" +
      s""""cell_mean":${f"$mean%.1f"},""" +
      s""""max_over_mean":${f"${mx / mean}%.1f"},"cell_top5":$top5,""" +
      s""""dedup_salted_s":${f"$saltedS%.1f"},""" +
      s""""dedup_unsalted_s":${f"$unsaltedS%.1f"},""" +
      s""""kept_salted":$keptSalted,"kept_unsalted":$keptUnsalted,""" +
      s""""kept_equal":${keptSalted == keptUnsalted}}""")
    spark.stop()
  }
}

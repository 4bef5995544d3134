package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Ann

/** Measures the FLAT vs TWO-LEVEL cell-assignment paths at corpus
  * scale — the SCALE_SMOKE evidence for [[Ann.assignCellsTwoLevelTopN]]
  * and the auto-router bound ([[Ann.FlatCentroidMaxBytesKey]]).
  *
  * Synthetic deterministic corpus (hash-derived floats, no RNG state):
  * n vectors (env `SPARK_ANN_N`, default 20M) of dim 64, written once
  * to /tmp parquet so both paths read identical bytes. k centroids =
  * `adaptiveCellCount(n)` (the SemDeDup √n default), sampled from the
  * corpus by stride. Reports wall seconds for: corpus build, flat
  * assignment, coarse k-means training, two-level assignment, and the
  * ASSIGNMENT AGREEMENT rate (fraction of vectors whose two-level cell
  * equals the flat argmin — the recall the coarse probe trades).
  *
  * Expected shape: flat does n·k·dim multiply-adds; two-level does
  * n·(c + w·k/c)·dim with c ≈ √k coarse cells and w probes — at n=20M,
  * k≈4472, c=67, w=8: ~600 vs ~4472 distance evals per vector, ~7×
  * less arithmetic. The payload argument (the reason the router
  * exists) is separate: flat ships k·dim·8 B in every task binary —
  * 2.3 MB here, GBs at n=10¹² — while two-level ships c·dim·8. */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-ann-scale",
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_ANN_N", "20000000").toLong
    val dim = 64
    // 0 = the library's auto rule (max(8, ceil(c/8)) over non-empty
    // coarse cells) — the effective count is resolved and reported below
    val probesEnv = sys.env.getOrElse("SPARK_ANN_PROBES", "0").toInt
    // agreement-only mode: skip the timed full-corpus passes and
    // measure just the 5%-slice agreement + planted-pair co-location —
    // the probes-rule sweep re-runs under several probe counts and the
    // full flat pass (472-794 s at 20M) would dominate for no new info
    val agreeOnly = sys.env.get("SPARK_ANN_AGREE_ONLY").contains("1")
    val root = s"/tmp/graft_ann_${n / 1000000}m"

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic corpus: element j of row i = a hash-derived float
    // in [-1, 1) — no RNG, so reruns and decades are comparable
    val (_, buildS) = time {
      if (!new java.io.File(root).exists()) {
        spark.range(n).toDF("vec_id")
          .select(col("vec_id"),
            transform(sequence(lit(0), lit(dim - 1)),
              j => (pmod(hash(col("vec_id"), j), lit(2000)) / lit(1000.0) - 1.0)
                .cast("float")).as("embedding"))
          .repartition(64)
          .write.mode("overwrite").parquet(root)
      }
    }
    val corpus = spark.read.parquet(root)
    // warm the reader + JIT before any timed pass (the first parquet
    // scan of a fresh JVM costs ~2× — both paths time warm)
    corpus.count()
    // k defaults to the SemDeDup √n regime; SPARK_ANN_K forces the
    // large-k regime the payload router exists for (k grows as √n, so
    // the local corpus can't reach it at honest n — forcing k emulates
    // the 10¹⁰-vector shape: flat scales O(k) per vector, two-level
    // O(√k))
    val k = sys.env.get("SPARK_ANN_K").map(_.toInt)
      .getOrElse(Ann.adaptiveCellCount(n))
    val stride = math.max(1L, n / k)
    val cents = corpus.filter(col("vec_id") % stride === 0)
      .limit(k).select(col("vec_id").as("cell_id"), col("embedding"))
    val coarseK = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)

    val (coarse, trainS) = time {
      val c = Ann.trainCentroids(cents, "embedding", coarseK)
      c.cache().count(); c
    }
    // resolve the effective probe count the same way the operator does:
    // the auto rule applies over the NON-EMPTY (probe-able) coarse cells
    val cNonEmpty = Ann.assignCellsFlatTopN(cents, "cell_id", "embedding",
      coarse, 1).select(col("cell_id")).distinct().count()
    val probes =
      if (probesEnv > 0) probesEnv else Ann.defaultCoarseProbes(cNonEmpty)
    val (_, flatS) = time {
      if (agreeOnly) 0L
      else Ann.assignCellsFlatTopN(corpus, "vec_id", "embedding", cents, 1)
        .count()
    }
    val (_, twoS) = time {
      if (agreeOnly) 0L
      else Ann.assignCellsTwoLevelTopN(corpus, "vec_id", "embedding", cents, 1,
        coarse, probes).count()
    }
    // agreement: fraction of vectors assigned the SAME cell both ways.
    // Assignment is per-row independent, so a deterministic 5% slice
    // measures the same rate at 1/20th the recompute cost.
    val slice = corpus.filter(col("vec_id") % 20 === 0)
    val flat = Ann.assignCellsFlatTopN(slice, "vec_id", "embedding", cents, 1)
      .select(col("vid"), col("cell_id").as("flat_cell"))
    val two = Ann.assignCellsTwoLevelTopN(slice, "vec_id", "embedding", cents, 1,
      coarse, probes)
      .select(col("vid"), col("cell_id").as("two_cell"))
    val agree = flat.join(two, "vid")
      .agg(avg((col("flat_cell") === col("two_cell")).cast("double")))
      .head().getDouble(0)
    // the metric SemDeDup actually depends on: do NEAR-DUPLICATE PAIRS
    // land in the same cell? A near-clone's distances are nearly its
    // original's, so assignment errors CORRELATE — the pair co-cell
    // rate sits far above the per-vector agreement rate. 1000 planted
    // clones (ε = +0.001 per component), assigned through each path.
    val seeds = corpus.filter(col("vec_id") % lit(math.max(1L, n / 1000)) === 0)
      .limit(1000)
    val clones = seeds.select((col("vec_id") + lit(n)).as("vec_id"),
      transform(col("embedding"), x => (x + lit(0.001f)).cast("float"))
        .as("embedding"))
    val planted = seeds.unionByName(clones)
    def coCell(assign: org.apache.spark.sql.DataFrame): Double = {
      val a = assign.select(col("vid"), col("cell_id"))
      val orig = a.filter(col("vid") < n)
      val dup = a.filter(col("vid") >= n)
        .select((col("vid") - n).as("vid"), col("cell_id").as("cell2"))
      orig.join(dup, "vid")
        .agg(avg((col("cell_id") === col("cell2")).cast("double")))
        .head().getDouble(0)
    }
    val pairFlat = coCell(
      Ann.assignCellsFlatTopN(planted, "vec_id", "embedding", cents, 1))
    val pairTwo = coCell(
      Ann.assignCellsTwoLevelTopN(planted, "vec_id", "embedding", cents, 1,
        coarse, probes))

    println(s"""{"metric":"ann_scale","n":$n,"dim":$dim,"k":$k,""" +
      s""""coarse_k":$coarseK,"coarse_nonempty":$cNonEmpty,""" +
      s""""probes":$probes,"probes_auto":${probesEnv == 0},""" +
      s""""agree_only":$agreeOnly,""" +
      s""""build_s":${f"$buildS%.1f"},"flat_s":${f"$flatS%.1f"},""" +
      s""""train_s":${f"$trainS%.1f"},"two_level_s":${f"$twoS%.1f"},""" +
      s""""agreement":${f"$agree%.4f"},""" +
      s""""pair_cocell_flat":${f"$pairFlat%.4f"},""" +
      s""""pair_cocell_two":${f"$pairTwo%.4f"}}""")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling and data-mixing operators for training-corpus
  * assembly: per-stratum downsampling and weighted per-source mixing with
  * epoch upsampling.
  *
  * Everything is content-addressed (md5 of the row key), NOT rand()-based:
  * a sample decision depends only on the key, so re-runs, retries,
  * different partitionings, and incremental extensions of the corpus all
  * agree on which rows are in — and two tables sampled on the same key
  * keep join-compatible row sets. Every operator is a scalar projection +
  * filter (or a row generator bounded by ceil(weight)): no shuffle, no
  * driver state, embarrassingly parallel at any scale.
  */
object Sampling {

  /** Deterministic sampling bucket in [0, denom): 60-bit md5-prefix hash
    * of the key rendered as a string, mod denom. */
  def bucket(key: Column, denom: Long = 1000000L): Column =
    TextFunctions.md5Hash60(key.cast("string")) % lit(denom)

  private val Denom = 1000000L

  private def rateFor(byValue: Column, table: Map[String, Double],
                      default: Double): Column =
    table.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(byValue === k, lit(v)).otherwise(acc)
    }

  /** Per-stratum deterministic sampling: keep a row iff its key's bucket
    * falls below the stratum's rate — e.g. downsample a dominant language
    * to rebalance a corpus. Rates in [0, 1]; strata absent from `rates`
    * use `defaultRate`. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val rate = rateFor(stratum, rates, defaultRate)
    df.filter(bucket(key, Denom).cast("double") < rate * Denom)
  }

  /** Deterministic global shuffle + shard assignment — the "randomize
    * document order once, then stream shards" step of a training-data
    * export. Content-addressed like everything here: shard and position
    * depend only on (seed, key), so re-runs, different partitionings and
    * resumed exports agree row-for-row, and a different `seed` yields an
    * independent permutation (fresh epoch order). `shard` is the 60-bit
    * md5-prefix hash of `seed:key` mod `nShards`; `pos` is the hash's
    * rank inside its shard (key tiebreak, so equal-hash rows still order
    * deterministically).
    *
    * Scale shape: ONE shuffle (the window's partitionBy shard) and a
    * within-shard sort — no global ordering bottleneck; shards write in
    * parallel, each internally a fixed random permutation. Keep
    * nShards ≫ executor count so shard skew is noise. */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Long,
                           nShards: Int): DataFrame = {
    require(nShards > 0, s"deterministicShuffle: nShards must be > 0, got $nShards")
    val hC = s"_shuffle_h_${java.util.UUID.randomUUID().toString.take(8)}"
    val h = TextFunctions.md5Hash60(
      concat_ws(":", lit(seed.toString), key.cast("string")))
    val keyed = df.withColumn(hC, h)
      .withColumn("shard", (col(hC) % nShards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(hC), key)
    keyed.withColumn("pos", (row_number().over(w) - 1).cast("long")).drop(hC)
  }

  /** Fill a per-stratum TOKEN budget with a deterministic sample: rows are
    * ordered by their content-addressed hash (a fixed random permutation)
    * inside each stratum and taken while the running token total stays
    * within `budget`. The standard "give me N billion tokens per
    * language" corpus-assembly step; re-runs pick the same docs, and a
    * raised budget strictly extends the previous selection.
    *
    * One shuffle, keyed on the stratum; the window never sees more than a
    * stratum. (A single GLOBAL budget would funnel the cumsum through one
    * partition — budget per stratum, or pre-shard the budget, instead.) */
  def tokenBudgetSample(df: DataFrame, key: Column, stratum: Column,
                        nTokens: Column, budget: Long): DataFrame = {
    // helper columns get collision-free names: withColumn REPLACES a
    // same-named input column silently, so fixed names like `_h` would
    // corrupt a caller's frame that happens to carry them
    val nonce = graft.core.Cols.nonce
    val (kC, sC, nC, hC) =
      (s"_key_$nonce", s"_stratum_$nonce", s"_n_$nonce", s"_h_$nonce")
    require(!df.columns.contains("cum_tokens"),
      "tokenBudgetSample: input already has a 'cum_tokens' column (reserved output)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sC)).orderBy(col(hC), col(kC))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(kC, key)
      .withColumn(sC, stratum)
      .withColumn(nC, nTokens.cast("long"))
      .withColumn(hC, md5(key.cast("string")))
      .withColumn("cum_tokens", sum(col(nC)).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop(kC, sC, nC, hC)
  }

  /** Exactly-n sampling with probability proportional to a weight column
    * (systematic / PPS sampling): rows are laid out on a line in a fixed
    * content-addressed order, each occupying a segment of length = its
    * weight, and n equally-spaced points (one every `total/n`, centered
    * at half-stride) pick the rows they land in. Rows heavier than a
    * stride can be picked multiple times — `n_picks` carries the
    * multiplicity (standard PPS-with-replacement semantics).
    *
    * The line is sharded: rows are deterministically split into `shards`
    * hash-shards, each selecting n/shards — no global-order funnel (the
    * cumulative sum windows over one shard, same posture as
    * [[tokenBudgetSample]]'s per-stratum budget and packSequences'
    * shards). Weights go through DECIMAL for the running sum (exact,
    * order-independent), and the point arithmetic is plain IEEE division
    * — bit-reproducible across engines.
    *
    * Deterministic: picks depend only on (key, weight) pairs — re-runs
    * and repartitionings agree. Output: input columns + `n_picks` (> 0
    * rows only). */
  def systematicWeightedSample(df: DataFrame, key: Column, weight: Column,
                               n: Int, shards: Int = 8): DataFrame = {
    require(n > 0 && shards > 0 && n % shards == 0,
      s"need n ($n) divisible by shards ($shards)")
    require(!df.columns.contains("n_picks"),
      "systematicWeightedSample: input already has an 'n_picks' column (reserved output)")
    val perShard = n / shards
    val nonce = graft.core.Cols.nonce
    val (hC, sC, wC, cC, tC) = (s"_h_$nonce", s"_shard_$nonce",
      s"_w_$nonce", s"_cum_$nonce", s"_tot_$nonce")
    // weight joins the intra-shard order as a tiebreak: duplicate keys
    // share (md5, key), and without it the per-row n_picks split between
    // equal-position rows of DIFFERENT weight would vary run to run
    // (shard totals are unaffected). Rows identical in (key, weight) are
    // interchangeable — their n_picks multiset is still deterministic.
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sC)).orderBy(col(hC), key, col(wC))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col(sC))
    val stride = col(tC).cast("double") / lit(perShard.toDouble)
    val cumD = col(cC).cast("double")
    val prevD = (col(cC) - col(wC)).cast("double")
    // a shard whose rows all weigh 0 has no pick line (stride 0 would
    // make the quotients NaN, and ANSI casts NaN->long as an error)
    val picks = when(col(tC) === 0, lit(0L))
      .otherwise((floor(cumD / stride - lit(0.5)) -
        floor(prevD / stride - lit(0.5))).cast("long"))
    // a negative weight would silently corrupt the cumulative pick line
    // (non-monotone cum -> negative/shifted picks for OTHER rows): fail
    // loudly per row instead (zero-weight rows are fine — never picked)
    val wChecked = when(weight.cast("double") >= 0.0, weight.cast("decimal(27,6)"))
      .otherwise(raise_error(concat(lit("systematicWeightedSample: negative weight "),
        weight.cast("string"))))
    df.withColumn(hC, md5(key.cast("string")))
      .withColumn(sC, bucket(key, shards))
      .withColumn(wC, wChecked)
      .withColumn(cC, sum(col(wC)).over(ord))
      .withColumn(tC, sum(col(wC)).over(whole))
      .withColumn("n_picks", picks)
      .filter(col("n_picks") > 0)
      .drop(hC, sC, wC, cC, tC)
  }

  /** Weighted source mixing with epoch upsampling: a source with weight w
    * contributes each of its rows floor(w) times (epochs 0..floor(w)-1),
    * plus one more epoch for the deterministic fraction of rows whose
    * bucket < frac(w) — so w=2.5 repeats every row twice and half the
    * rows a third time, and w=0.3 keeps 30%. The output carries an
    * `epoch` column (the training-mixture replica index). */
  def sourceMix(df: DataFrame, key: Column, source: Column,
                weights: Map[String, Double],
                defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mix weights must be non-negative")
    require(!df.columns.contains("epoch"),
      "sourceMix: input already has an 'epoch' column (reserved output)")
    // collision-free helper names (same hazard as tokenBudgetSample)
    val nonce = graft.core.Cols.nonce
    val (wC, bC) = (s"_w_$nonce", s"_b_$nonce")
    val w = rateFor(source, weights, defaultWeight)
    df.withColumn(wC, w)
      .withColumn(bC, bucket(key, Denom).cast("double"))
      .withColumn("epoch",
        // greatest(,1): w=0 must generate [0] (then filter it out), not a
        // DESCENDING sequence(0,-1) that would leak a spurious epoch -1.
        explode(sequence(lit(0), greatest(ceil(col(wC)), lit(1L)).cast("int") - 1)))
      .filter(col("epoch") < floor(col(wC)) ||
        col(bC) < (col(wC) - floor(col(wC))) * Denom)
      .drop(wC, bC)
  }
}

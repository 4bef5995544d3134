package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling and skew-resistant aggregation — the utility
  * operators a 100 TB training-data ingest runs before anything else.
  */
object Profile {

  /** One-pass column profile: per column, null count + distinct count +
    * min/max (numeric/string-safe). Single aggregation over the table —
    * one scan regardless of column count. Output: one row per column.
    *
    * `approxDistinct = true` (the DEFAULT) uses HyperLogLog++
    * approx_count_distinct, which aggregates map-side in constant
    * memory — the right profile shape at 100 TB. `approxDistinct =
    * false` opts into exact countDistinct, which plans an Expand that
    * multiplies the scan by the column count plus a shuffle per column
    * — reserved for oracle checks and small tables (the `prof_columns`
    * query pins it explicitly). */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    approxDistinct: Boolean = true): DataFrame = {
    val distinctAgg: Column => Column =
      if (approxDistinct) c => approx_count_distinct(c) else c => countDistinct(c)
    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        distinctAgg(col(c)).as(s"${c}__distinct")) ++
        (if (isNum) Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
        else Seq(lit(null).cast("double").as(s"${c}__min"),
          lit(null).cast("double").as(s"${c}__max")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per column
    val stack = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(stack: _*)).as("p")).select(col("p.*"))
  }

  /** Heavy-hitter / skew report: for each listed column, the top-`k`
    * values by frequency with their corpus share — the pre-flight check
    * that finds the hot keys a join/aggregate will skew on (and the
    * degenerate values — empty string, sentinel ids — that dominate dirty
    * corpora). Feed the hot values into
    * [[graft.operators.Joins.skewedEquiJoin]] (salted join path) or
    * [[saltedGroupAgg]] to act on what this finds.
    *
    * ONE scan regardless of column count: the columns unpivot to
    * (column, value) pairs in the projection, a single count aggregate
    * (map-side partial, immune to the hot values it is hunting) feeds a
    * two-phase top-k — rank within (column, salt-of-value) buckets first,
    * then a final rank over the ≤ 64·k survivors per column — so no
    * single reducer ever sorts a full distinct-value set. The row total
    * folds in as a broadcast single row (same shape as [[histogram]]'s
    * bounds), not a separate `count()` action: the whole call is the
    * broadcast job plus the main job. Output: (column, value, n, share),
    * value rendered as string, NULLs excluded from the report but counted
    * in the share denominator (they are profiled by [[columnProfile]]). */
  def heavyHitters(df: DataFrame, cols: Seq[String], k: Int = 10): DataFrame = {
    require(cols.nonEmpty && k > 0, s"need columns and k > 0, got $cols / $k")
    import org.apache.spark.sql.expressions.Window
    val total = df.agg(count(lit(1)).cast("double").as("_total"))
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.column").as("column"), col("p.value").as("value"))
      .filter(col("value").isNotNull)
    val counts = pairs.groupBy(col("column"), col("value")).agg(count(lit(1)).as("n"))
    // (n desc, value asc) is a total order within a column (values are
    // distinct post-aggregate), so phase-1 bucket rank ≤ k is a sound
    // superset of the global top-k
    val bucketRank = Window
      .partitionBy(col("column"), pmod(xxhash64(col("value")), lit(64L)))
      .orderBy(col("n").desc, col("value").asc)
    val colRank = Window.partitionBy(col("column"))
      .orderBy(col("n").desc, col("value").asc)
    counts
      .withColumn("_rk", row_number().over(bucketRank)).filter(col("_rk") <= k)
      .withColumn("_rk", row_number().over(colRank)).filter(col("_rk") <= k)
      .crossJoin(broadcast(total))
      .select(col("column"), col("value"), col("n"),
        (col("n").cast("double") / col("_total")).as("share"))
      // deterministic report order (the pre-rewrite API emitted each
      // column's hitters top-down). coalesce(1)+local sort, NOT orderBy:
      // a global sort's RangePartitioning adds a boundary-sampling job,
      // and the report is ≤ |cols|·k rows — one partition is the plan
      .coalesce(1).sortWithinPartitions(col("column"), col("n").desc, col("value"))
  }

  /** Equal-width histogram of a numeric column: `bins` buckets spanning
    * the column's own [min, max], with per-bucket counts and bounds. The
    * distribution snapshot of data profiling — one bounds aggregate (a
    * broadcast single row), then one codegen'd bucket projection +
    * count groupBy on a small integer key (map-side partial, immune to
    * spikes). Values at max land in the last bucket (the standard
    * closed-right convention); NULLs and NaNs are excluded (a single NaN
    * would poison max() and collapse every row into one NaN-bounded
    * bucket). */
  def histogram(df: DataFrame, value: Column, bins: Int = 20): DataFrame = {
    require(bins > 0, s"bins must be > 0, got $bins")
    val v = value.cast("double")
    val clean = df.filter(v.isNotNull && !isnan(v))
    val bounds = clean.agg(min(v).as("_mn"), max(v).as("_mx"))
    val width = (col("_mx") - col("_mn")) / lit(bins.toDouble)
    // degenerate all-equal column: width 0 -> everything in bucket 0
    val bucket = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(lit(bins - 1L),
        floor((v - col("_mn")) / width).cast("long")))
    clean
      .crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"), col("_mn"), col("_mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("_mn") + col("bucket").cast("double") *
          ((col("_mx") - col("_mn")) / lit(bins.toDouble))).as("bucket_low"),
        col("n"))
  }

  /** Per-group IQR outlier gate on a numeric column: rows outside
    * [q1 - 1.5*iqr, q3 + 1.5*iqr] of their group's exact interpolated
    * quartiles are flagged — the robust length-outlier screen of corpus
    * curation (truncated fragments, concatenation blobs). Quartiles are
    * one exact-percentile aggregate per group joined back broadcast
    * (groups are few: languages, sources); the gate itself is a scalar
    * projection. Output: input columns + q1/q3/is_outlier. */
  def iqrOutliers(df: DataFrame, group: Column, value: Column,
                  factor: Double = 1.5): DataFrame = {
    // reserved output names are refused, not silently replaced, and
    // helper columns get collision-free names (same hazard class the
    // sampling operators guard against)
    Seq("q1", "q3", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"iqrOutliers: input already has a '$c' column (reserved output)"))
    val nonce = graft.core.Cols.nonce
    val (gC, q1C, q3C) = (s"_g_$nonce", s"_q1_$nonce", s"_q3_$nonce")
    val q = df.groupBy(group.as(gC)).agg(
      percentile(value, lit(0.25)).as(q1C),
      percentile(value, lit(0.75)).as(q3C))
    // null-safe join: a NULL group is a legitimate group (groupBy keeps
    // it); a plain === would silently DROP all null-group rows
    df.join(broadcast(q), group <=> col(gC))
      .withColumn("q1", col(q1C).cast("double"))
      .withColumn("q3", col(q3C).cast("double"))
      .withColumn("is_outlier",
        (value.cast("double") < col("q1") - lit(factor) * (col("q3") - col("q1"))) ||
          (value.cast("double") > col("q3") + lit(factor) * (col("q3") - col("q1"))))
      .drop(gC, q1C, q3C)
  }

  /** Per-group z-score outlier gate: rows where |value - mean| exceeds
    * `threshold` group standard deviations. The parametric sibling of
    * [[iqrOutliers]] (cheaper — plain moment sums instead of exact
    * percentiles — but assumes roughly normal data).
    *
    * Moments are DECIMAL sums (exact, order-independent — a plain double
    * SUM is accumulation-order-dependent and not reproducible), cast to
    * double at fixed points; variance is the textbook
    * (sumsq - sum²/n)/(n-1) in a fixed expression order, so the whole
    * gate is bit-reproducible across engines. Groups are few; the stats
    * table broadcasts. Output: input columns + mean/stddev/is_outlier.
    * Single-row groups have no sample stddev — flagged false. */
  def zscoreOutliers(df: DataFrame, group: Column, value: Column,
                     threshold: Double = 3.0): DataFrame = {
    Seq("mean", "stddev", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"zscoreOutliers: input already has a '$c' column (reserved output)"))
    val nonce = graft.core.Cols.nonce
    val (gC, nC, sC, qC) = (s"_g_$nonce", s"_n_$nonce", s"_s_$nonce", s"_q_$nonce")
    val v = value.cast("double")
    // NaN/±Inf are excluded from the moment sums (same reason histogram
    // filters them: under ANSI mode a single NaN makes the decimal cast
    // THROW, and even quietly a NaN would poison every row's gate); such
    // rows still flow to the output, flagged false. Finite values with
    // |v| > ~1.5e10 overflow decimal(27,6) when squared — clean-input
    // precondition, by design (widening to decimal(38,6) would cap the
    // SUM's own precision headroom instead).
    val finite = !isnan(v) && abs(v) =!= lit(Double.PositiveInfinity)
    val stats = df.groupBy(group.as(gC)).agg(
      count(when(finite, v)).as(nC),
      sum(when(finite, v).cast("decimal(27,6)")).cast("double").as(sC),
      sum(when(finite, v * v).cast("decimal(27,6)")).cast("double").as(qC))
    val nD = col(nC).cast("double")
    val mean = col(sC) / nD
    // clamp: per-term decimal quantization can push the cancellation
    // formula a hair NEGATIVE for near-constant groups — sqrt would then
    // be NaN here and a hard error in the DuckDB oracle
    val variance = greatest(
      (col(qC) - (col(sC) * col(sC)) / nD) / (nD - lit(1.0)), lit(0.0))
    df.join(broadcast(stats), group <=> col(gC))
      .withColumn("mean", mean)
      .withColumn("stddev",
        when(col(nC) > 1, sqrt(variance)).otherwise(lit(null).cast("double")))
      .withColumn("is_outlier",
        // `finite` gates the flag too: Spark orders NaN above every
        // numeric and Inf-mean stays Inf, so without it a non-finite
        // value would read |v-mean| > t*stddev as TRUE — contradicting
        // the excluded-from-moments contract above
        when(finite && col("stddev").isNotNull && col("stddev") > 0.0,
          // a NULL value yields a NULL comparison — the gate contract is
          // boolean, so NULL-valued rows read false, not null
          coalesce(abs(v - col("mean")) > lit(threshold) * col("stddev"),
            lit(false)))
          .otherwise(lit(false)))
      .drop(gC, nC, sC, qC)
  }

  /** Two-phase (salted) aggregation for skewed keys: phase 1 aggregates on
    * (key, salt) spreading a hot key over `saltBuckets` reducers; phase 2
    * merges the partials. Result is identical to a plain groupBy count/sum
    * — only the shuffle distribution changes. */
  def saltedGroupAgg(df: DataFrame, key: String, valueCol: Column,
                     saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }
}

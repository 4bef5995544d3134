package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Profile
import graft.OracleMath._

/** Join-heavy benchmark shapes (TPC-H Q3/Q5 style), data profiling,
  * skew-resistant aggregation, and the remaining §2.9 scalar families.
  */
object BenchQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping" -> ((s, d) => {
      // TPC-H Q3 shape: selective dim filter, 3-way join, agg, top-10.
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("orderdate"),
          col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    "q6_forecast" -> ((s, d) =>
      // TPC-H Q6 shape: pure scan + selective predicates + single agg —
      // the pushdown showcase (all four predicates reach the parquet
      // reader; ReadSchema is 4 columns of 11).
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.02, 0.06) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 6, 2)
          .as("revenue"))),
    "q5_local_supplier" -> ((s, d) => {
      // TPC-H Q5 shape: 6-way join with co-located customer/supplier
      // nation equality; dims broadcast, facts shuffle on join keys once.
      val asia = t(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2).as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),
    "j9_bloom_join" -> ((s, d) => {
      // selective fact-dim join with an explicit bloom prefilter: urgent
      // 2001+ orders prune the lineitem scan before its shuffle; the
      // exact join removes sketch false positives, so the result is
      // identical to the plain join the oracle runs.
      val small = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_orderkey"))
      val large = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_extendedprice"), col("l_discount"))
      graft.operators.Joins.bloomPrefilterJoin(large, small,
          "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2)
            .as("revenue"))
    }),
    "q10_returns" -> ((s, d) => {
      // TPC-H Q10 shape: returned-item revenue per customer in a quarter;
      // nation broadcast, facts shuffle once on join keys, top-20 after agg.
      val nation = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),
    "q14_promo" -> ((s, d) => {
      // TPC-H Q14 shape: promo revenue share for a shipping window; part
      // dim broadcast, ratio of two decimal-exact sums in fixed order.
      val part = t(s, d, "part").select(col("p_partkey"), col("p_type"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
          col("l_shipdate") < lit("1996-06-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0)), 6, 2).as("promo_revenue"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2)
            .as("total_revenue"))
        .select(
          ((lit(100.0) * col("promo_revenue")) / col("total_revenue"))
            .as("promo_pct"),
          col("promo_revenue"), col("total_revenue"))
    }),
    "q18_large_orders" -> ((s, d) => {
      // TPC-H Q18 shape: orders whose total quantity exceeds a threshold
      // (group-filter on the fact, then enrich) — the HAVING-join pattern.
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity"), 2, 2).as("total_qty"))
        .filter(col("total_qty") > 250.0)
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("orderdate"), col("o_totalprice"))
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),
    "a12_rollup" -> ((s, d) =>
      // hierarchical subtotals (beyond the reference's flat groupBys).
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2, 2).as("qty"))),
    "a13_pivot" -> ((s, d) =>
      // wide reshaping: one count column per order priority, per year.
      // na.fill(0) aligns empty cells with SQL's FILTER-count zeros.
      t(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .groupBy(col("yr"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0)),
    "a14_cube" -> ((s, d) =>
      // full cube with grouping-set id (beyond a12's linear rollup).
      t(s, d, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          grouping_id().cast("long").as("gid"))),
    "w7_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"))
    }),
    "w10_range_frame" -> ((s, d) => {
      // RANGE-framed sliding aggregate: each event's trailing-1-hour sum
      // per type (range on the time AXIS, not row counts — peers at the
      // same ts aggregate together in both engines). Decimal sum keeps
      // the frame total order-independent.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        round(sum(col("value").cast("decimal(27,6)")).over(w), 4)
          .cast("double").as("hour_sum"))
    }),
    "w11_dist_funcs" -> ((s, d) => {
      // distribution + positional window family: cume_dist and the 3rd
      // richest customer's name per segment (explicit full-partition
      // frame — engines default value-function frames differently).
      val ord = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"),
        cume_dist().over(ord).as("cd"),
        nth_value(col("c_name"), 3).over(full).as("third_name"))
    }),
    "a19_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS that are NOT a rollup prefix chain —
      // (flag,status) plus (status) alone — through the SQL surface.
      t(s, d, "lineitem").createOrReplaceTempView("graft_a19_lineitem")
      s.sql(
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  ${dsumSql("l_quantity", 2, 2)} AS qty
           |FROM graft_a19_lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))""".stripMargin)
    }),
    "a21_unpivot" -> ((s, d) =>
      // wide→long reshaping (the pivot inverse): three measure columns
      // melt into (metric, val) rows, then aggregate per metric.
      t(s, d, "lineitem")
        .select(col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), dsum(col("val"), 6, 2).as("total"))),
    "a20_bool_aggs" -> ((s, d) =>
      // modern conditional/boolean aggregate family: count_if + bool
      // conjunction/disjunction per group — deterministic predicates, no
      // float accumulation.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") >= 1.0).as("all_qty_pos"),
          bool_or(col("l_tax") > 0.07).as("any_high_tax"))),
    "j11_full_outer" -> ((s, d) => {
      // FULL OUTER reconciliation: customers' 1996 vs 1997 order counts,
      // keeping customers active in only one of the years on both sides.
      def yearly(y: Int, as: String) = t(s, d, "orders")
        .filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as(as))
      val a = yearly(1996, "n_1996")
      val b = yearly(1997, "n_1997")
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_1996"), lit(0L)).as("n_1996"),
          coalesce(col("n_1997"), lit(0L)).as("n_1997"))
    }),
    "u4_set_ops" -> ((s, d) => {
      // intersect/except on full rows (§2.8 note: inherited from Spark).
      val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val p = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      f.intersect(p).withColumn("src", lit("both"))
        .unionByName(f.except(p).withColumn("src", lit("f_only")))
    }),
    "agg_median" -> ((s, d) =>
      // exact interpolated percentiles per group.
      t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))),
    "prof_columns" -> ((s, d) =>
      // one-pass column profile (nulls/distinct/min/max per column).
      // exact distinct pinned here so the DuckDB oracle can hash-match;
      // the operator DEFAULT is approx (HLL++) — the 100 TB shape.
      Profile.columnProfile(t(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
        approxDistinct = false)),
    "a18_zscore" -> ((s, d) =>
      // parametric outlier gate: |value - mean| > 3 sigma per event type.
      Profile.zscoreOutliers(Tables.events(s, d), col("event_type"),
        col("value"))
        .select(col("event_id"), col("event_type"), col("value"),
          col("mean"), col("stddev"), col("is_outlier").cast("int").as("is_outlier"))),
    "agg_corr" -> ((s, d) => {
      // per-flag Pearson correlation from EXACT integer moment sums:
      // corr() the aggregate is double-accumulation-order-dependent, and
      // even decimal-cast double products round differently per engine —
      // so quantize to integers first (qty is integral; price becomes
      // exact cents — corr is scale-invariant), sum in DECIMAL, and run
      // the formula in fixed double order.
      val x = col("l_quantity").cast("long")
      val y = round(col("l_extendedprice") * lit(100.0)).cast("long")
      val st = t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(38,0)")).cast("double").as("sx"),
        sum(y.cast("decimal(38,0)")).cast("double").as("sy"),
        sum((x * x).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((y * y).cast("decimal(38,0)")).cast("double").as("syy"),
        sum((x * y).cast("decimal(38,0)")).cast("double").as("sxy"))
      val nD = col("n").cast("double")
      // clamp before sqrt (double cancellation can go a hair negative on
      // a constant column — NaN here, a hard error in DuckDB) and NULL
      // out the zero-variance case instead of dividing by zero
      val denom = sqrt(greatest(col("sxx") - (col("sx") * col("sx")) / nD, lit(0.0))) *
        sqrt(greatest(col("syy") - (col("sy") * col("sy")) / nD, lit(0.0)))
      st.select(col("l_returnflag"), col("n"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise((col("sxy") - (col("sx") * col("sy")) / nD) / denom)
          .as("corr_qty_price"))
    }),
    "sf_strsim" -> ((s, d) =>
      // §2.9 string-similarity family: edit distance (same DP definition
      // in both engines).
      t(s, d, "part").select(col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("lev_name_type"),
        levenshtein(lower(col("p_brand")), lit("brand#1")).as("lev_brand"))),
    "q4_priority" -> ((s, d) => {
      // TPC-H Q4 shape: EXISTS correlated subquery through the SQL
      // surface — Catalyst rewrites it to a left-semi join (PlanSpec).
      t(s, d, "orders").createOrReplaceTempView("graft_q4_orders")
      t(s, d, "lineitem").createOrReplaceTempView("graft_q4_lineitem")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM graft_q4_orders
          |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
          |  AND EXISTS (SELECT 1 FROM graft_q4_lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority""".stripMargin)
    }),
    "q2_min_price_supp" -> ((s, d) => {
      // TPC-H Q2 shape: CORRELATED SCALAR subquery (per-part minimum) in
      // the WHERE clause — Catalyst decorrelates it into an aggregate
      // joined back (PlanSpec: no subquery survives the optimized plan,
      // so it runs as two scans + joins, never per-row).
      t(s, d, "part").createOrReplaceTempView("graft_q2_part")
      t(s, d, "supplier").createOrReplaceTempView("graft_q2_supplier")
      t(s, d, "lineitem").createOrReplaceTempView("graft_q2_lineitem")
      s.sql(
        """SELECT p_partkey, s_name, l_extendedprice AS min_price
          |FROM graft_q2_part, graft_q2_supplier, graft_q2_lineitem
          |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          |  AND p_size <= 20
          |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
          |                         FROM graft_q2_lineitem l2
          |                         WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),
    "q21_last_shipper" -> ((s, d) => {
      // TPC-H Q21 shape: suppliers who shipped last (no OTHER supplier
      // shipped later) among multi-supplier orders. The EXISTS +
      // NOT-EXISTS formulation scans lineitem three times (base + semi +
      // anti, three exchanges); here lineitem is scanned and exchanged
      // ONCE — per-order measures come from stacked window functions
      // over the same l_orderkey partitioning, so no self-join exists at
      // all (the 10×-scale fix from the round-10 verdict). Window state
      // is bounded by rows-per-order (~7 in TPC-H shapes).
      //
      // Tie handling via the two-top-values trick: for row (supp s,
      // ship d) the pass test is d >= max-shipdate-over-OTHER-suppliers,
      // which is m1 (the global max) when s is not the max's tie-broken
      // owner, and m2x = max over rows of all OTHER suppliers when it
      // is — so tied last-shippers all pass, exactly like NOT EXISTS.
      val w = Window.partitionBy("l_orderkey")
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), col("l_returnflag"))
      // two stacked windows over the SAME partitioning (m2x needs the
      // first window's tie-broken top supplier) — one exchange feeds both
      val withTop = li
        .withColumn("nsupp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("top", max(struct(col("l_shipdate"), col("l_suppkey"))).over(w))
      val enriched = withTop.withColumn("m2x",
        max(when(col("l_suppkey") =!= col("top.l_suppkey"), col("l_shipdate"))).over(w))
      enriched
        .filter(col("nsupp") >= 2 && col("l_returnflag") === "R" &&
          when(col("l_suppkey") === col("top.l_suppkey"),
            col("l_shipdate") >= col("m2x"))
            .otherwise(col("l_shipdate") === col("top.l_shipdate")))
        .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
    }),
    "q13_custdist" -> ((s, d) => {
      // TPC-H Q13 shape: LEFT OUTER join with an extra ON-clause filter,
      // then a count-of-counts distribution — customers with zero orders
      // must survive as c_count = 0 (the outer join's whole point).
      t(s, d, "customer").createOrReplaceTempView("graft_q13_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_q13_orders")
      s.sql(
        """SELECT c_count, COUNT(*) AS custdist
          |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |      FROM graft_q13_customer LEFT OUTER JOIN graft_q13_orders
          |        ON c_custkey = o_custkey
          |        AND o_orderpriority <> '1-URGENT'
          |      GROUP BY c_custkey) cnt
          |GROUP BY c_count""".stripMargin)
    }),
    "q16_supplier_cnt" -> ((s, d) => {
      // TPC-H Q16 shape: NOT IN subquery — Catalyst plans it as a
      // null-aware anti join (broadcast), then COUNT(DISTINCT) per
      // part attribute group.
      t(s, d, "part").createOrReplaceTempView("graft_q16_part")
      t(s, d, "supplier").createOrReplaceTempView("graft_q16_supplier")
      t(s, d, "lineitem").createOrReplaceTempView("graft_q16_lineitem")
      s.sql(
        """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM graft_q16_part, graft_q16_lineitem
          |WHERE p_partkey = l_partkey
          |  AND p_brand <> 'Brand#1'
          |  AND p_size IN (5, 10, 15, 20)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_q16_supplier
          |                        WHERE s_name LIKE '%33%')
          |GROUP BY p_brand, p_type, p_size""".stripMargin)
    }),
    "q11_important_part" -> ((s, d) => {
      // TPC-H Q11 shape: per-group value filtered against a FRACTION of
      // the scale-free threshold (1.5x the mean per-part value) — the
      // same aggregate runs once as a scalar
      // subquery and once grouped; cents-rounded sums keep both engines'
      // totals bit-identical.
      t(s, d, "lineitem").createOrReplaceTempView("graft_q11_lineitem")
      s.sql(
        """SELECT l_partkey,
          |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
          |    AS DOUBLE) / 100.0 AS value
          |FROM graft_q11_lineitem
          |GROUP BY l_partkey
          |HAVING CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
          |    AS DOUBLE) / 100.0 >
          |  (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
          |     AS DOUBLE) / 100.0 / COUNT(DISTINCT l_partkey) * 1.5
          |   FROM graft_q11_lineitem)""".stripMargin)
    }),
    "q22_idle_balance" -> ((s, d) => {
      // TPC-H Q22 shape: uncorrelated scalar subquery (global average,
      // executed ONCE) + NOT EXISTS anti join — rich customers with no
      // URGENT order. Decimal-via-cents sum keeps the float total
      // hash-stable across engines.
      t(s, d, "customer").createOrReplaceTempView("graft_q22_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_q22_orders")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS numcust,
          |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
          |    AS totacctbal
          |FROM graft_q22_customer c
          |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM graft_q22_customer
          |                   WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM graft_q22_orders
          |                  WHERE o_custkey = c.c_custkey
          |                    AND o_orderpriority = '1-URGENT')
          |GROUP BY c_mktsegment""".stripMargin)
    }),
    "q7_volume_shipping" -> ((s, d) => {
      // TPC-H Q7 shape: bilateral trade volume between two nations by
      // ship year. Both nation dims broadcast; the nation filter lands
      // on supplier AND customer BEFORE their fact joins, so the
      // lineitem/orders shuffles carry only the two nations' slice.
      val pair = t(s, d, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = t(s, d, "supplier").join(broadcast(pair),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer").join(broadcast(pair),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2)
          .as("revenue"))
    }),
    "q8_market_share" -> ((s, d) => {
      // TPC-H Q8 shape: one nation's share of a region's PROMO-part
      // revenue per order year — ratio of two conditional decimal sums
      // in fixed order. part/supplier/nation/region broadcast; the
      // customer-region filter rides the customer dim into the orders
      // join, facts shuffle once each.
      val europe = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t(s, d, "customer").join(broadcast(europe),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val part = t(s, d, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_19", volume).otherwise(lit(0.0)), 6, 2)
            .as("nation_volume"),
          dsum(volume, 6, 2).as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          (col("nation_volume") / col("total_volume")).as("mkt_share"))
    }),
    "q9_product_profit" -> ((s, d) => {
      // TPC-H Q9 shape (no partsupp in this schema: supply cost is
      // derived as 10% of retail price × quantity): profit on widget
      // parts by supplier nation and order year. part + supplier-nation
      // broadcast, single orders shuffle.
      val part = t(s, d, "part").filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(amount, 6, 2).as("sum_profit"))
    }),
    "q12_late_priority" -> ((s, d) => {
      // TPC-H Q12 shape (no shipmode column: line status stands in as
      // the grouping axis): late-shipped 1997 lineitems split into
      // high/low order-priority counts — the conditional-count pair.
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
        .join(orders, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1))
            .cast("long").as("low_line_count"))
    }),
    "q15_top_supplier" -> ((s, d) => {
      // TPC-H Q15 shape: revenue view + scalar-subquery MAX — the
      // classic "top supplier" with the aggregate computed ONCE and
      // broadcast back (PlanSpec: the CTE's aggregate is not re-run per
      // row).
      t(s, d, "lineitem").createOrReplaceTempView("graft_q15_lineitem")
      t(s, d, "supplier").createOrReplaceTempView("graft_q15_supplier")
      s.sql(
        s"""WITH rev AS (
           |  SELECT l_suppkey AS supplier_no,
           |    ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS total_rev
           |  FROM graft_q15_lineitem
           |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_rev
           |FROM graft_q15_supplier JOIN rev ON s_suppkey = supplier_no
           |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin)
    }),
    "q17_small_qty_rev" -> ((s, d) => {
      // TPC-H Q17 shape: correlated scalar AVG against the outer part —
      // Catalyst decorrelates to a per-part aggregate joined back, so
      // lineitem is scanned twice but never per-row. l_quantity is
      // integral, so AVG is accumulation-order-exact in both engines.
      t(s, d, "lineitem").createOrReplaceTempView("graft_q17_lineitem")
      t(s, d, "part").createOrReplaceTempView("graft_q17_part")
      s.sql(
        s"""SELECT ${dsumSql("l_extendedprice", 4, 2)} / 7.0 AS avg_yearly
           |FROM graft_q17_lineitem JOIN graft_q17_part ON p_partkey = l_partkey
           |WHERE p_brand = 'Brand#3' AND p_size < 15
           |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
           |                    FROM graft_q17_lineitem l2
           |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),
    "q19_bracket_rev" -> ((s, d) => {
      // TPC-H Q19 shape: OR of three brand/size/quantity brackets — the
      // disjunctive-pushdown case (each branch's part predicate prunes
      // at the broadcast dim, the residual OR filters post-join).
      val part = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2)
          .as("revenue"))
    }),
    "q20_promo_suppliers" -> ((s, d) => {
      // TPC-H Q20 shape (no partsupp availqty: the volume threshold is
      // absolute): suppliers who shipped > 300 units of PROMO parts in
      // 1997 — nested IN subqueries planned as stacked left-semi joins.
      t(s, d, "lineitem").createOrReplaceTempView("graft_q20_lineitem")
      t(s, d, "part").createOrReplaceTempView("graft_q20_part")
      t(s, d, "supplier").createOrReplaceTempView("graft_q20_supplier")
      s.sql(
        """SELECT s_name, s_acctbal
          |FROM graft_q20_supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM graft_q20_lineitem
          |  WHERE l_partkey IN (SELECT p_partkey FROM graft_q20_part
          |                      WHERE p_type = 'PROMO')
          |    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
          |  GROUP BY l_suppkey
          |  HAVING SUM(l_quantity) > 300)""".stripMargin)
    }),
    "a16_funnel" -> ((s, d) => {
      // funnel conversion: per user, first view and the first purchase
      // AFTER that view; one aggregate + one conditional re-aggregate —
      // no self-join of the event stream.
      val ev = Tables.events(s, d)
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view_ts"))
      ev.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"), "right")
        .groupBy(col("user_id"), col("first_view_ts"))
        .agg(min(when(col("ts") >= col("first_view_ts"), col("ts")))
          .as("first_purchase_ts"))
        .withColumn("converted",
          col("first_purchase_ts").isNotNull.cast("int"))
    }),
    "a17_retention" -> ((s, d) => {
      // cohort retention: users grouped by first-seen day, activity
      // counted per day-offset — two aggregates, second joined back on
      // the (small) per-user cohort table.
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),
    "a15_resample" -> ((s, d) =>
      // gap-filled hourly grid per event type (LOCF forward fill).
      graft.operators.TimeSeries.resample(Tables.events(s, d),
        col("event_type"), col("ts"), col("value"), "1 hour")
        .select(col("key").as("event_type"), col("ts_grid"), col("value"),
          col("is_gap").cast("int").as("is_gap"))),
    "a15_resample_15m" -> ((s, d) =>
      // multi-unit step: same LOCF grid at 15-minute cadence (epoch-floor
      // snapping — date_trunc can't express sub-unit multiples).
      graft.operators.TimeSeries.resample(Tables.events(s, d),
        col("event_type"), col("ts"), col("value"), "15 minutes")
        .select(col("key").as("event_type"), col("ts_grid"), col("value"),
          col("is_gap").cast("int").as("is_gap"))),
    "prof_histogram" -> ((s, d) =>
      // 20-bin equal-width distribution of line revenue.
      Profile.histogram(t(s, d, "lineitem"), col("l_extendedprice"), bins = 20)),
    "k10_scd2" -> ((s, d) =>
      // dimension version history: each customer's order stream as a
      // change feed -> changes-only SCD2 intervals.
      graft.operators.Upsert.scd2History(
        t(s, d, "orders").select(col("o_custkey").as("custkey"),
          col("o_orderdate").as("ts"), col("o_orderkey").as("okey"),
          col("o_totalprice").as("value")),
        "custkey", "ts", "okey", "value")),
    "prof_skew" -> ((s, d) =>
      // pre-flight skew report: top-10 heavy hitters per key column.
      Profile.heavyHitters(Tables.events(s, d),
        Seq("event_type", "user_id"), k = 10)),
    "c_length_outliers" -> ((s, d) =>
      // robust per-language length screen: exact-quartile IQR gate.
      Profile.iqrOutliers(Tables.documents(s, d), col("lang"), col("n_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("q1"), col("q3"), col("is_outlier").cast("int").as("is_outlier"))),
    "agg_salted" -> ((s, d) =>
      // two-phase salted aggregation — result identical to plain groupBy,
      // shuffle spread over 16 buckets for hot keys.
      Profile.saltedGroupAgg(
        t(s, d, "events").withColumn("_v", col("value").cast("decimal(27,6)")),
        "event_type", col("_v"), saltBuckets = 16, saltSource = col("event_id"))
        .withColumn("total", round(col("total"), 4).cast("double"))),
    "j10_skew_join" -> ((s, d) => {
      // skew-hardened join: events enriched with per-type stats.
      // event_type is the prof_skew hot column — in a plain shuffle join
      // its hottest value lands on ONE reducer; skewedEquiJoin salts the
      // hot keys over 8 buckets and the result stays bit-identical to
      // the plain join (the oracle is exactly that plain join).
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val dim = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"),
          round(sum(col("value").cast("decimal(27,6)")), 4).cast("double")
            .as("total_type"))
      // hot set from the data itself (top-2 types), the heavyHitters
      // composition a real pipeline would use
      val hot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("_n"))
        .orderBy(col("_n").desc, col("event_type").asc).limit(2)
        .select(col("event_type"))
      graft.operators.Joins.skewedEquiJoin(ev, dim, Seq("event_type"), hot,
        joinType = "inner", saltBuckets = 8, saltSource = Some(col("event_id")))
    }),
    "j6_asof_join" -> ((s, d) => {
      // as-of join: each purchase matched to the user's latest prior view.
      val purchases = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = t(s, d, "events").filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.Joins.asOfJoin(purchases, views,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightVals = Seq("value"))
        .withColumnRenamed("ts_right", "view_ts")
        .withColumnRenamed("value", "view_value")
    }),
    "sf_epoch" -> ((s, d) =>
      // epoch-ms <-> timestamp round trips (§2.9).
      t(s, d, "events").select(
        col("event_id"),
        unix_millis(col("ts")).as("epoch_ms"),
        unix_micros(col("ts")).as("epoch_us"),
        timestamp_millis(unix_millis(col("ts"))).as("ts_ms_roundtrip"))),
    "sf_json_emit" -> ((s, d) =>
      // json emit (to_json over a struct) — §2.9 json family, emit side.
      t(s, d, "events").select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("payload")))
  )

  val oracle: Map[String, String] = Map(
    "q6_forecast" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount", 6, 2)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
         |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
         |  o_orderpriority,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS revenue,
         |  COUNT(*) AS n_lineitems
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1""".stripMargin,
    "j9_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
         |GROUP BY 1""".stripMargin,
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q14_promo" ->
      s"""WITH a AS (SELECT
         |  ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 6, 2)} AS promo_revenue,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00')
         |SELECT ((100.0 * promo_revenue) / total_revenue) AS promo_pct,
         |  promo_revenue, total_revenue FROM a""".stripMargin,
    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${dsumSql("l_quantity", 2, 2)} AS total_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${dsumSql("l_quantity", 2, 2)} > 250.0)
         |SELECT c_name, c_custkey, o_orderkey,
         |  CAST(o_orderdate AS DATE) AS orderdate, o_totalprice, total_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "a12_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${dsumSql("l_quantity", 2, 2)} AS qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "a13_pivot" ->
      """SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY 1""".stripMargin,
    "a14_cube" ->
      """SELECT lang, source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin,
    "w7_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pr
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "w10_range_frame" ->
      """SELECT event_id, event_type,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))) OVER w, 4) AS DOUBLE)
        |    AS hour_sum
        |FROM events
        |WINDOW w AS (PARTITION BY event_type
        |             -- FLOOR before the cast: Spark's cast-to-long
        |             -- truncates sub-second ts, DuckDB's cast rounds
        |             ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w11_dist_funcs" ->
      """SELECT c_custkey, c_mktsegment,
        |  cume_dist() OVER w AS cd,
        |  nth_value(c_name, 3) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS third_name
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "a19_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${dsumSql("l_quantity", 2, 2)} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))""".stripMargin,
    "a21_unpivot" ->
      s"""SELECT metric, COUNT(*) AS n, ${dsumSql("val", 6, 2)} AS total
         |FROM (UNPIVOT (SELECT l_quantity, l_discount, l_tax FROM lineitem)
         |      ON l_quantity, l_discount, l_tax INTO NAME metric VALUE val)
         |GROUP BY 1""".stripMargin,
    "a20_bool_aggs" ->
      """SELECT l_returnflag,
        |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
        |  bool_and(l_quantity >= 1.0) AS all_qty_pos,
        |  bool_or(l_tax > 0.07) AS any_high_tax
        |FROM lineitem GROUP BY 1""".stripMargin,
    "j11_full_outer" ->
      """WITH a AS (SELECT o_custkey, COUNT(*) AS n_1996 FROM orders
        |           WHERE YEAR(o_orderdate) = 1996 GROUP BY 1),
        |b AS (SELECT o_custkey, COUNT(*) AS n_1997 FROM orders
        |      WHERE YEAR(o_orderdate) = 1997 GROUP BY 1)
        |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
        |  COALESCE(n_1996, 0) AS n_1996,
        |  COALESCE(n_1997, 0) AS n_1997
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""".stripMargin,
    "u4_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |p AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |SELECT o_custkey, 'both' AS src FROM (SELECT * FROM f INTERSECT SELECT * FROM p)
        |UNION ALL
        |SELECT o_custkey, 'f_only' FROM (SELECT * FROM f EXCEPT SELECT * FROM p)""".stripMargin,
    "agg_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "prof_columns" ->
      """SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_orderkey IS NULL AS BIGINT)) AS BIGINT) AS n_nulls,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS DOUBLE) AS min_value,
        |  CAST(MAX(o_orderkey) AS DOUBLE) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_custkey', COUNT(*),
        |  CAST(SUM(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT), COUNT(DISTINCT o_custkey),
        |  CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', COUNT(*),
        |  CAST(SUM(CAST(o_totalprice IS NULL AS BIGINT)) AS BIGINT), COUNT(DISTINCT o_totalprice),
        |  CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*),
        |  CAST(SUM(CAST(o_orderstatus IS NULL AS BIGINT)) AS BIGINT), COUNT(DISTINCT o_orderstatus),
        |  NULL, NULL FROM orders""".stripMargin,
    "a18_zscore" ->
      """WITH st AS (SELECT event_type AS g, COUNT(value) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE) AS q
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_id, event_type, value, n,
        |    s / CAST(n AS DOUBLE) AS mean,
        |    CASE WHEN n > 1 THEN
        |      sqrt(greatest(
        |        (q - (s * s) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0),
        |        0.0))
        |    END AS stddev
        |  FROM events JOIN st ON event_type IS NOT DISTINCT FROM g)
        |SELECT event_id, event_type, value, mean, stddev,
        |  CAST(CASE WHEN stddev IS NOT NULL AND stddev > 0.0
        |    THEN COALESCE(abs(CAST(value AS DOUBLE) - mean) > 3.0 * stddev, FALSE)
        |    ELSE FALSE END AS INT) AS is_outlier
        |FROM m""".stripMargin,
    "agg_corr" ->
      """WITH q AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS y
        |  FROM lineitem),
        |st AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN (sqrt(greatest(sxx - (sx * sx) / CAST(n AS DOUBLE), 0.0)) *
        |             sqrt(greatest(syy - (sy * sy) / CAST(n AS DOUBLE), 0.0))) = 0.0
        |    THEN NULL
        |    ELSE ((sxy - (sx * sy) / CAST(n AS DOUBLE)) /
        |      (sqrt(greatest(sxx - (sx * sx) / CAST(n AS DOUBLE), 0.0)) *
        |       sqrt(greatest(syy - (sy * sy) / CAST(n AS DOUBLE), 0.0))))
        |  END AS corr_qty_price
        |FROM st""".stripMargin,
    "sf_strsim" ->
      """SELECT p_partkey,
        |  levenshtein(p_name, p_type) AS lev_name_type,
        |  levenshtein(lower(p_brand), 'brand#1') AS lev_brand
        |FROM part""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q2_min_price_supp" ->
      """SELECT p_partkey, s_name, l_extendedprice AS min_price
        |FROM part, supplier, lineitem
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND p_size <= 20
        |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q21_last_shipper" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1
        |WHERE l1.l_suppkey = s_suppkey
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |        AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) cnt
        |GROUP BY c_count""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part, lineitem
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1'
        |  AND p_size IN (5, 10, 15, 20)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%33%')
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q11_important_part" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    AS DOUBLE) / 100.0 AS value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    AS DOUBLE) / 100.0 >
        |  (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |     AS DOUBLE) / 100.0 / COUNT(DISTINCT l_partkey) * 1.5
        |   FROM lineitem)""".stripMargin,
    "q22_idle_balance" ->
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  ${dsumSql("volume", 6, 2)} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(YEAR(l_shipdate) AS INT) AS l_year,
         |    l_extendedprice * (1.0 - l_discount) AS volume
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') v
         |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""WITH v AS (
         |  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
         |    l_extendedprice * (1.0 - l_discount) AS volume,
         |    n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
         |a AS (SELECT o_year,
         |  ${dsumSql("CASE WHEN supp_nation = 'NATION_19' THEN volume ELSE 0.0 END", 6, 2)}
         |    AS nation_volume,
         |  ${dsumSql("volume", 6, 2)} AS total_volume
         |FROM v GROUP BY 1)
         |SELECT o_year, nation_volume, total_volume,
         |  nation_volume / total_volume AS mkt_share FROM a""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, o_year, ${dsumSql("amount", 6, 2)} AS sum_profit
         |FROM (
         |  SELECT n.n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
         |    l_extendedprice * (1.0 - l_discount)
         |      - p_retailprice * l_quantity * 0.1 AS amount
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation n ON s_nationkey = n.n_nationkey
         |  WHERE p_name LIKE '%widget%') profit
         |GROUP BY 1, 2""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY 1""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM supplier JOIN rev ON s_suppkey = supplier_no
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin,
    "q17_small_qty_rev" ->
      s"""SELECT ${dsumSql("l_extendedprice", 4, 2)} / 7.0 AS avg_yearly
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#3' AND p_size < 15
         |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
         |                    FROM lineitem l2
         |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q19_bracket_rev" ->
      s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_promo_suppliers" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING SUM(l_quantity) > 300)""".stripMargin,
    "a16_funnel" ->
      """WITH ec AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events),
        |fv AS (SELECT user_id, MIN(ts) AS first_view_ts FROM ec
        |       WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT fv.user_id, fv.first_view_ts,
        |        MIN(CASE WHEN e.ts >= fv.first_view_ts THEN e.ts END)
        |          AS first_purchase_ts
        |      FROM ec e RIGHT JOIN fv ON e.user_id = fv.user_id
        |        AND e.event_type = 'purchase'
        |      GROUP BY 1, 2)
        |SELECT user_id, first_view_ts, first_purchase_ts,
        |  CAST(first_purchase_ts IS NOT NULL AS INT) AS converted
        |FROM p""".stripMargin,
    "a17_retention" ->
      """WITH c AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "a15_resample" ->
      """WITH sn AS (SELECT event_type AS k, date_trunc('hour', ts) AS t,
        |              MAX(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(t) AS mn, MAX(t) AS mx FROM sn GROUP BY 1),
        |g AS (SELECT k, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS t
        |      FROM b),
        |j AS (SELECT g.k, g.t, sn.v
        |      FROM g LEFT JOIN sn ON g.k = sn.k AND g.t = sn.t)
        |SELECT k AS event_type, t AS ts_grid,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  CAST(v IS NULL AS INT) AS is_gap
        |FROM j""".stripMargin,
    // time_bucket's origin (2000-01-03 00:00) is midnight-aligned, so for
    // any step dividing a day it coincides with the engine's epoch floor
    "a15_resample_15m" ->
      """WITH sn AS (SELECT event_type AS k,
        |              time_bucket(INTERVAL '15 minutes', ts) AS t,
        |              MAX(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT k, MIN(t) AS mn, MAX(t) AS mx FROM sn GROUP BY 1),
        |g AS (SELECT k, unnest(generate_series(mn, mx, INTERVAL '15 minutes')) AS t
        |      FROM b),
        |j AS (SELECT g.k, g.t, sn.v
        |      FROM g LEFT JOIN sn ON g.k = sn.k AND g.t = sn.t)
        |SELECT k AS event_type, t AS ts_grid,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  CAST(v IS NULL AS INT) AS is_gap
        |FROM j""".stripMargin,
    "prof_histogram" ->
      """WITH bd AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |              MAX(CAST(l_extendedprice AS DOUBLE)) AS mx
        |            FROM lineitem
        |            WHERE l_extendedprice IS NOT NULL
        |              AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |r AS (SELECT
        |  CASE WHEN mx = mn THEN 0
        |    ELSE LEAST(19, CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn)
        |      / ((mx - mn) / 20.0)) AS BIGINT)) END AS bucket, mn, mx
        |  FROM lineitem, bd
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE)))
        |SELECT bucket,
        |  mn + CAST(bucket AS DOUBLE) * ((mx - mn) / 20.0) AS bucket_low,
        |  COUNT(*) AS n
        |FROM r GROUP BY bucket, mn, mx""".stripMargin,
    "k10_scd2" ->
      """WITH chg AS (
        |  SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS okey,
        |    o_totalprice AS value,
        |    LAG(o_totalprice) OVER w AS prev, ROW_NUMBER() OVER w AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |surv AS (
        |  SELECT custkey, ts, okey, value FROM chg
        |  WHERE rn = 1 OR value IS DISTINCT FROM prev),
        |v AS (
        |  SELECT custkey, ts, okey, value,
        |    LEAD(ts) OVER w2 AS valid_to,
        |    CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
        |  FROM surv
        |  WINDOW w2 AS (PARTITION BY custkey ORDER BY ts, okey))
        |SELECT custkey, ts, okey, value, valid_to, version,
        |  valid_to IS NULL AS is_current
        |FROM v""".stripMargin,
    "prof_skew" ->
      """WITH tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM events),
        |a AS (SELECT 'event_type' AS "column", CAST(event_type AS VARCHAR) AS value,
        |        COUNT(*) AS n FROM events WHERE event_type IS NOT NULL
        |      GROUP BY 2 ORDER BY n DESC, value ASC LIMIT 10),
        |b AS (SELECT 'user_id' AS "column", CAST(user_id AS VARCHAR) AS value,
        |        COUNT(*) AS n FROM events WHERE user_id IS NOT NULL
        |      GROUP BY 2 ORDER BY n DESC, value ASC LIMIT 10)
        |SELECT "column", value, n, CAST(n AS DOUBLE) / t AS share FROM a, tot
        |UNION ALL
        |SELECT "column", value, n, CAST(n AS DOUBLE) / t AS share FROM b, tot""".stripMargin,
    "c_length_outliers" ->
      """WITH q AS (SELECT lang AS g,
        |    quantile_cont(n_chars, 0.25) AS q1, quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, lang, n_chars, q1, q3,
        |  CAST(CAST(n_chars AS DOUBLE) < q1 - 1.5 * (q3 - q1)
        |    OR CAST(n_chars AS DOUBLE) > q3 + 1.5 * (q3 - q1) AS INT) AS is_outlier
        |FROM documents JOIN q ON lang IS NOT DISTINCT FROM g""".stripMargin,
    "agg_salted" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,
    "j10_skew_join" ->
      """SELECT e.event_id, e.event_type, e.value, t.n_type, t.total_type
        |FROM events e
        |JOIN (SELECT event_type, COUNT(*) AS n_type,
        |        CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE) AS total_type
        |      FROM events GROUP BY 1) t USING (event_type)""".stripMargin,
    "j6_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts,
        |       v.value AS view_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin,
    "sf_epoch" ->
      """SELECT event_id,
        |  epoch_ms(ts) AS epoch_ms,
        |  epoch_us(ts) AS epoch_us,
        |  make_timestamp(epoch_ms(ts) * 1000) AS ts_ms_roundtrip
        |FROM events""".stripMargin,
    "sf_json_emit" ->
      """SELECT event_id,
        |  CAST(to_json(struct_pack(event_id := event_id,
        |                           event_type := event_type)) AS VARCHAR) AS payload
        |FROM events""".stripMargin
  )
}

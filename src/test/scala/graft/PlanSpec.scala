package graft

/** Physical-plan assertions: the properties that make these operators
  * survive a 100x scale-up are checked here, not just eyeballed —
  * pushdown reaching the parquet scan, column pruning, broadcast joins on
  * dims, aggregation instead of windows for ordered first/last, and no
  * accidental cartesian products.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("equality filter is pushed to the parquet scan") {
    val p = plan("f3_eq_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(event_type,click)"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("range filter pushes both bounds") {
    val p = plan("f5_range_filter")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
    assert(p.contains("LessThan(o_orderdate"))
  }

  test("q6 pushes all four predicates and reads 4 of 11 lineitem columns") {
    val p = plan("q6_forecast")
    // the PushedFilters list renders truncated; assert the prefix showing
    // all three filter columns reached the scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("q1 prunes columns: reads only the 7 needed lineitem fields") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("dimension join broadcasts the small side") {
    val p = plan("j5_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ordered first/last compiles to hash aggregation, not a window sort") {
    val p = plan("w3_first_last")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window"), p)
  }

  test("hourly stats is a single-shuffle aggregate") {
    val p = plan("a2_hourly_stats")
    assert(!p.contains("Window"))
    // one exchange for the groupBy (AQE may add AQEShuffleRead on top)
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1, p)
  }

  test("top-1-per-group window partitions (no single-partition funnel)") {
    val p = plan("w1_top1_per_group")
    assert(p.contains("windowspecdefinition(event_type"), p.linesIterator.filter(_.contains("window")).mkString("\n"))
    // rank<=1 is pushed below the shuffle as a partial WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("minhash LSH plan has no cartesian product and aggregates map-side") {
    val p = plan("d_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("ann brute force broadcasts queries, never shuffles the corpus") {
    val p = plan("ann_topk")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("exact dedup groups by content hash (16-byte shuffle key)") {
    val p = plan("d_exact_dedup")
    assert(p.contains("md5"))
    assert(p.contains("HashAggregate"))
  }

  test("upsert anti-join broadcasts the fresh key set") {
    val p = plan("k5_upsert_replace")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("range join is an equi-join on (key, cell), not a nested loop") {
    val p = plan("j7_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode") || p.contains("sequence"), p)
  }

  test("decontamination joins on the shingle key, never doc x doc") {
    val p = plan("c_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("graft_shingles"), p)
  }

  test("simhash portable table is a scalar projection — zero exchanges") {
    val p = graft.operators.DedupSuite.simhashTable(
      graft.core.Tables.documents(spark, sf("sf0.001")),
      "doc_id", org.apache.spark.sql.functions.col("text"), portable = true)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("graft_simhash60"), p)
  }

  test("quality rules gate is a pure projection — zero exchanges") {
    val p = plan("c_quality_rules")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("graft_top_token_count"), p)
  }

  test("embedding LSH near-dup never shuffles vectors for verify") {
    val p = plan("d_embed_lsh")
    assert(!p.contains("CartesianProduct"), p)
    // the semi-filter broadcasts candidate ids into the vector scan
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sampling/mixing/repetition are zero-exchange scalar shapes") {
    for (q <- Seq("s_stratified", "s_source_mix", "t_repetition")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q:\n$p")
    }
  }

  test("sequence packing shuffles once, keyed on the shard") {
    val p = plan("s_pack_sequences")
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).length == 1, p)
    assert(p.contains("Window"), p)
  }

  test("chunk dedup winner aggregation is map-side partial (no join back)") {
    val p = plan("d_chunk_dedup")
    assert(p.contains("partial_min"), p) // hot chunks absorbed before shuffle
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q10/q14 broadcast their dims and push fact filters to the scan") {
    val p10 = plan("q10_returns")
    assert(p10.contains("BroadcastHashJoin"), p10)
    assert(p10.contains("EqualTo(l_returnflag,R)"), p10)
    val p14 = plan("q14_promo")
    assert(p14.contains("BroadcastHashJoin"), p14)
    assert(p14.contains("GreaterThanOrEqual(l_shipdate"), p14)
  }

  test("q18 group-filter top-100 finishes as TakeOrderedAndProject") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus top-k stats use per-partition heaps, not a global sort") {
    for (q <- Seq("t_top_ngrams", "t_doc_frequency", "t_bm25")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
    }
  }

  test("bm25 shuffles only matched-term rows (filter below the aggregate)") {
    val p = plan("t_bm25")
    // the isin filter must run below the (doc, term) aggregate's exchange,
    // so the shuffle carries matched-term rows only: in the rendered tree
    // the Filter line is deeper (appears after) the exchange that feeds
    // the partial count
    val lines = p.linesIterator.toSeq
    val exchangeAt = lines.indexWhere(_.contains("Exchange hashpartitioning(_id"))
    val filterAt = lines.indexWhere(_.contains("IN (spark,join,vector)"))
    assert(exchangeAt >= 0 && filterAt > exchangeAt, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bloom join probes the sketch below the large side's exchange") {
    val p = plan("j9_bloom_join")
    val lines = p.linesIterator.toSeq
    val probeAt = lines.indexWhere(_.contains("graft_bloom_contains"))
    assert(probeAt >= 0, p)
    // between the probe filter and the lineitem scan it guards there is
    // no exchange: pruning happens in the scan stage, before rows move
    val scanAt = lines.indexWhere(
      l => l.contains("Scan parquet") && l.contains("lineitem"), probeAt)
    assert(scanAt > probeAt, p)
    assert(!lines.slice(probeAt, scanAt).exists(_.contains("Exchange")), p)
  }

  test("q4 EXISTS subquery plans as a semi join, not a per-row subquery") {
    val p = plan("q4_priority")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  /** No SubqueryExpression may survive optimization anywhere in the plan
    * tree — a surviving one executes per outer row (driver round-trip per
    * row at 100 TB). */
  private def assertDecorrelated(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution
    val survivors = qe.optimizedPlan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s
      })
    }.flatten
    assert(survivors.isEmpty, s"$name kept correlated subqueries: $survivors")
    qe.executedPlan.toString
  }

  test("q2 correlated scalar MIN decorrelates to an aggregate join") {
    val p = assertDecorrelated("q2_min_price_supp")
    // the per-part minimum runs ONCE as its own aggregate, joined back
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("k13 dynamic-pruned star join: broadcast semi + broadcast dim, no cartesian") {
    val p = plan("k13_join_pruned_read")
    // readWhereJoin's exact semi-join and the final dim join both
    // broadcast the bounded dim side; the fact side never shuffles for
    // either join
    assert(p.contains("LeftSemi"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q21 scans and exchanges lineitem exactly once (stacked windows, no self-join)") {
    val p = plan("q21_last_shipper")
    // ONE lineitem scan, ONE lineitem-sized exchange: both per-order
    // windows sit on the same l_orderkey partitioning. The only other
    // exchange allowed is the final tiny s_name rollup.
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, p)
    assert("Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).length == 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p) // supplier side broadcast
  }

  test("q13 outer-join distribution keeps zero-order customers without a subquery") {
    val p = assertDecorrelated("q13_custdist")
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q16 NOT IN plans as a null-aware anti join") {
    val p = assertDecorrelated("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11 HAVING-vs-global-fraction keeps only the run-once scalar subquery") {
    val qe = SparkEntry.queries("q11_important_part")(spark, sf("sf0.001")).queryExecution
    val correlated = qe.optimizedPlan.collect { case n =>
      n.expressions.filter(
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasCorrelatedSubquery)
    }.flatten
    assert(correlated.isEmpty, s"correlated subqueries survived: $correlated")
    assert(qe.executedPlan.toString.contains("HashAggregate"))
  }

  test("q22 keeps only the run-once scalar subquery; NOT EXISTS is an anti join") {
    // the global-average scalar subquery legitimately survives (executed
    // ONCE, broadcast into the filter) — what must NOT survive is
    // anything CORRELATED, which would run per outer row
    val qe = SparkEntry.queries("q22_idle_balance")(spark, sf("sf0.001")).queryExecution
    val correlated = qe.optimizedPlan.collect { case n =>
      n.expressions.filter(
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasCorrelatedSubquery)
    }.flatten
    assert(correlated.isEmpty, s"correlated subqueries survived: $correlated")
    val p = qe.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scd2 history runs both window passes on ONE shuffle and sort") {
    val p = plan("k10_scd2")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.linesIterator.count(_.trim.startsWith("+- Sort")) == 1, p)
  }

  test("PQ scoring joins the codes to a BROADCAST distance table") {
    val p = plan("ann_pq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // corpus never shuffles for dtab
  }

  test("partitioned lead shuffles on the key — no single-reducer sort") {
    val p = plan("w2_lead_by_key")
    // the window's distribution is hashpartitioning(priority, ...); the
    // SinglePartition funnel of the global-window w2_lead form must not
    // appear anywhere in this plan
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(priority"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q7 broadcasts the nation-filtered dims; lineitem scans once with the date pushed") {
    val p = plan("q7_volume_shipping")
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p) // pushed to the scan
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q8 market share: one lineitem scan, part/supplier/nation sides all broadcast") {
    val p = plan("q8_market_share")
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q9 profit: one lineitem scan, dims broadcast, single grouped aggregate") {
    val p = plan("q9_product_profit")
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q15 top supplier: only the run-once scalar MAX survives") {
    val qe = SparkEntry.queries("q15_top_supplier")(spark, sf("sf0.001")).queryExecution
    val correlated = qe.optimizedPlan.collect { case n =>
      n.expressions.filter(
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasCorrelatedSubquery)
    }.flatten
    assert(correlated.isEmpty, s"correlated subqueries survived: $correlated")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }

  test("q17 correlated AVG decorrelates to a per-part aggregate joined back") {
    val p = assertDecorrelated("q17_small_qty_rev")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20 nested INs plan as stacked semi joins, never per-row subqueries") {
    val p = assertDecorrelated("q20_promo_suppliers")
    assert("LeftSemi".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q19 OR-bracket revenue broadcasts part; the residual OR filters post-join") {
    val p = plan("q19_bracket_rev")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("w10/w11 window shapes shuffle once on their partition key, never SinglePartition") {
    for (q <- Seq("w10_range_frame", "w11_dist_funcs")) {
      val p = plan(q)
      assert(p.contains("Window"), p)
      assert(!p.contains("Exchange SinglePartition"), s"$q funnels: $p")
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, s"$q: $p")
    }
  }

  test("j11 full-outer reconciliation aggregates BEFORE the join (two small sides)") {
    val p = plan("j11_full_outer")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both year slices aggregate to per-customer counts pre-join, so the
    // join inputs are the aggregated frames, not raw orders
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("SQL over graft.`path` pushes filters into the manifest relation") {
    // the SQL surface must inherit the programmatic path's pruning: a
    // WHERE over graft.`path` reaches ManifestRelation.buildScan as a
    // pushed filter (file pruning from manifest metadata) AND survives
    // as a post-scan Filter (the handled-filters contract re-applies it)
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("graft-planrel")
      .toString + "/t"
    ManifestTable.write(
      spark.read.parquet(sf("sf0.001") + "/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice"), root)
    val df = spark.sql(
      s"SELECT o_orderkey FROM graft.`$root` WHERE o_custkey = 42")
    val p = df.queryExecution.executedPlan.toString
    // the relation advertises the pushed filter and the pruned columns
    assert(p.contains("ManifestRelation"), p)
    assert("PushedFilters: .*EqualTo\\(o_custkey,42\\)".r.findFirstIn(p).nonEmpty, p)
    // column pruning: o_totalprice never leaves the scan
    assert(!"ReadSchema.*o_totalprice".r.findFirstIn(p).nonEmpty, p)
    assert(df.count() >= 0) // executes
  }

  test("a small manifest dimension auto-broadcasts in SQL joins (manifest-metadata sizing)") {
    // without the sizeInBytes override the relation reports
    // defaultSizeInBytes (effectively infinite) and every star join
    // against a graft.`path` dimension would sort-merge at any scale
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("graft-plansz")
      .toString + "/dim"
    ManifestTable.write(
      spark.read.parquet(sf("sf0.001") + "/nation.parquet"), root)
    spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .createOrReplaceTempView("plansz_cust")
    val df = spark.sql(
      s"""SELECT n.n_name, count(*) AS n
         |FROM plansz_cust c JOIN graft.`$root` n
         |  ON c.c_nationkey = n.n_nationkey
         |GROUP BY n.n_name""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("merge-on-read table read applies DVs as a BROADCAST anti join (no table shuffle)") {
    // k19 ends in a read of a DV-carrying manifest table: the deletion
    // vectors must anti-join via broadcast — a shuffled anti here would
    // re-shuffle the whole table at 100 TB for a 0.1% delete
    val p = plan("k19_mor_roundtrip")
    assert(p.contains("LeftAnti"), p)
    assert("BroadcastHashJoin.*LeftAnti".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bigram LM: map-side partials, hash join on the bigram key, pruned scans") {
    val p = plan("t_bigram_lm")
    // per-doc sums combine map-side before the doc_id shuffle
    assert(p.contains("partial_sum"), p)
    // the model probe is a HASH join keyed on the bigram (broadcast at
    // this SF, sort-merge at scale) — never a nested loop over data
    assert(p.contains("BroadcastHashJoin [bigram") ||
      p.contains("SortMergeJoin [bigram"), p)
    assert(!p.contains("CartesianProduct"), p)
    // scans read only (doc_id, text) of the 5 document columns
    assert(!p.contains("n_chars"), p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n"))
  }
}

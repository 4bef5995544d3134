package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Joins, TimeSeries, Upsert, Windows}
import graft.OracleMath._

/** A-class aggregations, W-class windows, O-class sorts/limits, U-class set
  * ops and the K4/K5 upsert semantics as oracle-checked queries
  * (SURVEY.md §2.5-§2.8, §2.2).
  */
object AggWindowQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  /** Daily order revenue — shared fixture for upsert/sort queries. */
  private def dailyRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("date"))
      .agg(dsum(col("o_totalprice"), 4, 2).as("revenue"))

  private val dailyRevenueSql =
    s"""SELECT CAST(o_orderdate AS DATE) AS date,
       |       ${dsumSql("o_totalprice", 4, 2)} AS revenue
       |FROM orders GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-class --------------------------------------------------------------
    "a2_hourly_stats" -> ((s, d) =>
      // A2/T2/W4: per-hour OHLC-style stats with time-ordered first/last.
      TimeSeries.hourlyStats(t(s, d, "events"), col("ts"), col("value"))),
    "a3_daily_rollup" -> ((s, d) =>
      // A3+A4/T3: daily rollup cascaded over the hourly aggregate.
      TimeSeries.dailyStats(
        TimeSeries.hourlyStats(t(s, d, "events"), col("ts"), col("value")))),
    "a5_sentiment_daily" -> ((s, d) => {
      // A5+X1: lexicon sentiment polarity per doc, aggregated per (lang,source).
      import graft.functions.Sentiment
      t(s, d, "documents")
        .withColumn("polarity", Sentiment.polarity(col("text")))
        .groupBy(col("lang"), col("source"))
        .agg(davg(col("polarity"), 9, 6).as("polarity_mean"),
             count(lit(1)).as("n_docs"))
    }),
    "a6_sql_avg" -> ((s, d) => {
      // A6 (ref: select_pageview_counts.sql): the SQL surface itself —
      // registered temp view + spark.sql text.
      t(s, d, "events").createOrReplaceTempView("graft_events")
      s.sql(
        """SELECT event_type, hour(ts) AS hr,
          |  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value), 6) AS avg_value
          |FROM graft_events GROUP BY event_type, hour(ts)""".stripMargin)
    }),
    "a7_group_count" -> ((s, d) =>
      // A7: key-count map (promotions per product → parts per type).
      t(s, d, "part").groupBy(col("p_type")).agg(count(lit(1)).as("n_parts"))),
    "a8_last_wins" -> ((s, d) =>
      // A8: lookup-accumulate last-wins — last retail price per brand in
      // partkey order (pandas dict-overwrite re-specified as max_by).
      t(s, d, "part").groupBy(col("p_brand")).agg(
        Windows.orderedLast(col("p_retailprice"), col("p_partkey")).as("last_price"),
        count(lit(1)).as("n_parts"))),
    "a11_fan_in" -> ((s, d) => {
      // A11/J4/U1: fan-in over parallel branches — three filtered extracts
      // union-merged then aggregated.
      val clicks = t(s, d, "events").filter(col("event_type") === "click")
      val views = t(s, d, "events").filter(col("event_type") === "view")
      val purchases = t(s, d, "events").filter(col("event_type") === "purchase")
      Joins.unionMerge(Seq(clicks, views, purchases))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6, 4).as("total_value"))
    }),
    // W-class --------------------------------------------------------------
    "w3_first_last" -> ((s, d) =>
      // W3: ordered first/last per user (min_by/max_by, no window shuffle).
      t(s, d, "events").groupBy(col("user_id")).agg(
        Windows.orderedFirst(col("value"), col("ts")).as("first_value"),
        Windows.orderedLast(col("value"), col("ts")).as("last_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))),
    "w5_running_sum" -> ((s, d) => {
      // Running cumulative count per user over days (rows-frame window).
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_events", sum(col("n")).over(w))
    }),
    "w9_rolling_avg" -> ((s, d) => {
      // Trailing 1-hour RANGE window per user: event-time rolling count
      // and average (decimal-exact sum so the frame aggregation is
      // order-independent across partial evaluation).
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events").select(
        col("event_id"), col("user_id"), col("ts"),
        count(col("value")).over(w).as("n_1h"),
        round(sum(col("value").cast("decimal(27,6)")).over(w).cast("double") /
          count(col("value")).over(w), 6).as("avg_1h"))
    }),
    "w6_sessionize" -> ((s, d) =>
      // Gap-based sessionization (30-min gap) — lag + running-sum session
      // numbering, then per-session aggregate.
      graft.operators.Sessionize.sessions(
        t(s, d, "events").select(col("user_id"), col("ts")),
        "user_id", "ts", java.time.Duration.ofMinutes(30))),
    "j8_interval_overlap" -> ((s, d) => {
      // interval x interval: which users' daily activity spans overlap,
      // and by how much — same cell-binning as j7, both sides exploded.
      val spans = t(s, d, "events").filter(col("user_id") < 20)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      val a = spans.select(col("day"), col("user_id").as("u1"),
        col("s").as("s1"), col("e").as("e1"))
      val b = spans.select(col("day"), col("user_id").as("u2"),
        col("s").as("s2"), col("e").as("e2"))
      Joins.intervalOverlapJoin(a, b, Seq("day"), "s1", "e1", "s2", "e2",
          java.time.Duration.ofHours(6))
        .filter(col("u1") < col("u2"))
        .select(col("day"), col("u1"), col("u2"),
          (least(unix_micros(col("e1")), unix_micros(col("e2"))) -
            greatest(unix_micros(col("s1")), unix_micros(col("s2"))))
            .as("overlap_us"))
    }),
    "j7_range_join" -> ((s, d) => {
      // Bucketized point-in-interval join: events back into their own
      // sessions (disjoint intervals), counted per session — the equi-join
      // binning shape, exactness restored by the residual BETWEEN filter.
      val ev = t(s, d, "events").select(col("user_id"), col("ts"))
      val sess = graft.operators.Sessionize.sessions(
        ev, "user_id", "ts", java.time.Duration.ofMinutes(30))
      Joins.rangeJoin(ev, sess, Seq("user_id"), "ts",
          "session_start", "session_end", java.time.Duration.ofMinutes(30))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_points"))
    }),
    // O-class --------------------------------------------------------------
    "o1_sort" -> ((s, d) =>
      // O1: ordered report output (driver sorts rows anyway; the operator
      // here is the total sort itself).
      dailyRevenue(s, d).orderBy(col("date"))),
    "o2_topk" -> ((s, d) =>
      // O2/O3: top-k with deterministic tiebreak.
      t(s, d, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .limit(10)),
    "o4_first_row" -> ((s, d) =>
      // O4: first upcoming row (limit 1 after order).
      t(s, d, "orders")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("date"))
        .limit(1)),
    // U-class + upserts ----------------------------------------------------
    "u1_union_merge" -> ((s, d) => {
      // U1/J3: heterogeneous union with schema alignment (missing cols null).
      val e = t(s, d, "events").select(
        to_date(col("ts")).as("date"), lit("event").as("src"), col("value").as("amount"))
      val o = t(s, d, "orders").select(
        to_date(col("o_orderdate")).as("date"), lit("order").as("src"),
        col("o_totalprice").as("amount"), col("o_orderpriority").as("priority"))
      Joins.unionMerge(Seq(e, o))
        .groupBy(col("src"), col("priority"))
        .agg(count(lit(1)).as("n"), dsum(col("amount"), 6, 2).as("total"))
    }),
    "u2_keep_last" -> ((s, d) =>
      // U2: dedup keep-last by key under explicit ts order.
      Dedup.keepLastBy(t(s, d, "events"), Seq("user_id"), col("ts"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))),
    "k5_upsert_replace" -> ((s, d) => {
      // K5: replace-by-key upsert — fresh recomputation of 1998 replaces
      // the stale 1998 rows in the existing daily table.
      val existing = dailyRevenue(s, d).withColumn("version", lit(1))
      val fresh = t(s, d, "orders")
        .filter(year(col("o_orderdate")) === 1998)
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(dsum(col("o_totalprice"), 4, 2).as("revenue"))
        .withColumn("version", lit(2))
      Upsert.replaceByKey(existing, fresh, Seq("date"))
    }),
    "k4_append_dedup" -> ((s, d) => {
      // K4: append + dedup keep-last, fresh side wins on key collision.
      val existing = dailyRevenue(s, d).withColumn("version", lit(1))
      val fresh = t(s, d, "orders")
        .filter(year(col("o_orderdate")) === 1998)
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg((dsum(col("o_totalprice"), 4, 2) + 0.5).as("revenue"))
        .withColumn("version", lit(2))
      Upsert.appendDedup(existing, fresh, Seq("date"), col("version"))
    }),
    "k11_pruned_read" -> ((s, d) => {
      // K11 (beyond-reference B4): manifest data skipping end-to-end —
      // land orders in a manifest table partitioned by priority, read it
      // back through readWhere so the partition value + the per-file
      // o_totalprice min/max stats prune files BEFORE the scan. The
      // oracle sees only the final relational result, which pruning (by
      // contract, spec'd in DataSkippingSpec) can never change.
      val root = graft.core.TempDirs.create("graft-k11") + "/orders_lake"
      graft.sources.ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")),
        root, partitionCols = Seq("o_orderpriority"))
      graft.sources.ManifestTable.readWhere(s, root,
          col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
    }),
    "k12_incremental_read" -> ((s, d) => {
      // K12 (beyond-reference): incremental read of a manifest table —
      // seed years ≤1995, upsert years ≥1995 (1995 overlaps), then
      // readChanges over the upsert window. File-level change granularity
      // re-emits the touched 1995 partition's full merged content plus
      // the new years — exactly "every order of a year ≥ 1995", which the
      // oracle recomputes relationally. A compact() in between proves
      // rewrites contribute nothing to the window.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k12") + "/orders_inc"
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"),
        year(col("o_orderdate")).cast("string").as("o_year"))
      ManifestTable.write(orders.filter(col("o_year") <= "1995"), root,
        partitionCols = Seq("o_year"))
      val v1 = ManifestTable.compact(s, root, targetFileMB = 64) // rewrite: no changes
      ManifestTable.upsertDedup(s, orders.filter(col("o_year") >= "1995"), root,
        keys = Seq("o_orderkey"), order = "o_totalprice",
        partitionCols = Seq("o_year"))
      val v3 = ManifestTable.currentVersion(s, root).get
      ManifestTable.readChanges(s, root, v1 - 1, v3)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_year"))
    }),
    "k13_join_pruned_read" -> ((s, d) => {
      // K13 (beyond-reference): dynamic file pruning — a q10-class
      // star-schema query where the manifest FACT table (orders,
      // clustered on the join key) is pruned by the FILTERED dim's key
      // set before the scan; the semi-join inside readWhereJoin keeps
      // the result identical to the relational plan the oracle runs.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k13") + "/orders_fact"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        root)
      ManifestTable.cluster(s, root, sortCols = Seq("o_custkey"), targetFileMB = 4)
      val dim = t(s, d, "customer").filter(col("c_nationkey") === 5)
        .select(col("c_custkey"), col("c_name"))
      val fact = ManifestTable.readWhereJoin(s, root, dim, Seq("o_custkey" -> "c_custkey"))
      fact.join(broadcast(dim), fact("o_custkey") === dim("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice"), 4, 2).as("revenue"))
    }),
    "k14_stats_agg" -> ((s, d) => {
      // K14 (beyond-reference): metadata-only aggregates — COUNT/MIN/MAX
      // answered from the manifest alone without touching a data file.
      // The table is HIVE-PARTITIONED on o_orderpriority, so that
      // column's count/bounds come from the partition directory values
      // + per-file row counts (they have no parquet footer stats at
      // all), n_rows comes from the dedicated rowCount fast path, and
      // the rest from per-column footer stats. The oracle recomputes the
      // same aggregates relationally.
      import s.implicits._
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k14") + "/orders_stats"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")).repartition(8),
        root, partitionCols = Seq("o_orderpriority"))
      val stats = ManifestTable.statsOnly(s, root)
      val cust = stats.filter(col("column") === "o_custkey")
        .select("value_count", "null_count").collect().head
      val prio = stats.filter(col("column") === "o_orderpriority")
        .select("value_count", "null_count").collect().head
      Seq((ManifestTable.rowCount(s, root).get,
        cust.getLong(0) - cust.getLong(1),
        prio.getLong(0) - prio.getLong(1),
        ManifestTable.statDouble(stats, "o_totalprice", "min").get,
        ManifestTable.statDouble(stats, "o_totalprice", "max").get,
        ManifestTable.statString(stats, "o_orderpriority", "min").get,
        ManifestTable.statString(stats, "o_orderpriority", "max").get))
        .toDF("n_rows", "n_cust", "n_prio", "min_price", "max_price",
          "min_prio", "max_prio")
    }),
    "k15_delete" -> ((s, d) => {
      // K15 (beyond-reference): copy-on-write DELETE WHERE — only files
      // whose stats might match are rewritten (partitioned by priority,
      // so the predicate prunes to one partition's files); the oracle
      // recomputes the surviving rows relationally.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k15") + "/orders_del"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root, partitionCols = Seq("o_orderpriority"))
      ManifestTable.delete(s, root,
        col("o_orderpriority") === "1-URGENT" && col("o_totalprice") < 150000.0)
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),
    "k16_update" -> ((s, d) => {
      // K16 (beyond-reference): copy-on-write UPDATE ... SET evaluated
      // against the OLD row; non-matching rows byte-identical.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k16") + "/orders_upd"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root, partitionCols = Seq("o_orderpriority"))
      ManifestTable.update(s, root, col("o_orderpriority") === "5-LOW",
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)))
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),
    "k17_merge" -> ((s, d) => {
      // K17 (beyond-reference): MERGE INTO — target is orders ≤1996,
      // source is 1996-1997 with shifted prices; matched rows combine
      // OLD target and source values (the _src_ seam), unmatched source
      // rows insert. The oracle replays the same arithmetic with CASE.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k17") + "/orders_merge"
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      ManifestTable.write(orders.filter(col("o_year") <= 1996), root)
      val src = orders.filter(col("o_year").isin(1996, 1997))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      ManifestTable.merge(s, root, src, keys = Seq("o_orderkey"),
        whenMatched = ManifestTable.MatchUpdate(
          Map("o_totalprice" -> (col("o_totalprice") + col("_src_o_totalprice")))))
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_year"))
    }),
    "k18_zorder_read" -> ((s, d) => {
      // K18 (beyond-reference): z-order clustering end-to-end — orders
      // clustered on the Morton-interleaved (o_custkey, o_totalprice)
      // key, then filtered on EACH axis independently through readWhere;
      // by contract (DataSkippingSpec) pruning never changes results, so
      // the oracle is the plain relational filter.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k18") + "/orders_z"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartition(8),
        root)
      ManifestTable.cluster(s, root, sortCols = Seq("o_custkey", "o_totalprice"),
        targetFileMB = 1, zOrder = true)
      ManifestTable.readWhere(s, root, col("o_totalprice") > 350000.0)
        .unionByName(ManifestTable.readWhere(s, root,
          col("o_custkey") < 100 && col("o_totalprice") <= 350000.0))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),
    "k19_mor_roundtrip" -> ((s, d) => {
      // K19 (beyond-reference): MERGE-ON-READ mutation via deletion
      // vectors — a DELETE then an UPDATE mark row positions in dv-*
      // sidecars instead of rewriting files; every read anti-joins the
      // positions out, so the oracle sees plain relational semantics.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k19") + "/orders_mor"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")).repartition(6),
        root)
      ManifestTable.deleteMoR(s, root, col("o_totalprice") < 100000.0)
      ManifestTable.updateMoR(s, root, col("o_orderpriority") === "5-LOW",
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)))
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),
    "k20_bloom_read" -> ((s, d) => {
      // K20 (beyond-reference): point-lookup file skipping via the
      // per-file bloom index — orderkeys are hash-scattered across files
      // (every file's min/max spans the key space, so range stats prune
      // NOTHING), then an IN probe reads only the bloom-positive files.
      // By contract pruning never changes results, so the oracle is the
      // plain IN filter.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k20") + "/orders_bloom"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")).repartition(8, col("o_orderkey")),
        root)
      ManifestTable.buildBloomIndex(s, root, Seq("o_orderkey"))
      ManifestTable.readWhere(s, root,
          col("o_orderkey").isin(1L, 42L, 500L, 1337L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),
    "k21_sql_dml" -> ((s, d) => {
      // K21 (beyond-reference): the full DML lifecycle through
      // `spark.sql` alone — the injected GRAFT grammar plans DELETE
      // (copy-on-write), UPDATE (merge-on-read deletion vectors) and
      // MERGE INTO (t/s alias arithmetic, insert-unmatched) onto the
      // manifest-table mutators; the oracle replays the same three
      // mutations relationally. The MERGE source is every 1-URGENT
      // order with a shifted price: survivors of the DELETE match (2×
      // price + 1000), deleted ones re-insert (price + 1000).
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k21") + "/orders_sqldml"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)
      s.sql(s"GRAFT DELETE FROM '$root' WHERE o_totalprice < 50000.0")
      s.sql(s"GRAFT UPDATE MOR '$root' SET o_totalprice = o_totalprice * 1.05 " +
        "WHERE o_orderpriority = '5-LOW'")
      t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"), col("o_orderpriority"))
        .createOrReplaceTempView("k21_src")
      s.sql(s"GRAFT MERGE INTO '$root' USING k21_src ON (o_orderkey) " +
        "WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + s.o_totalprice " +
        "WHEN NOT MATCHED THEN INSERT ALL")
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),
    "k22_rename_read" -> ((s, d) => {
      // K22 (beyond-reference): column rename WITHOUT rewrite (name
      // mapping) — orders lands with o_totalprice, the column renames to
      // `price` in one metadata-only commit, then a SQL UPDATE and a
      // pruned read both speak the NEW name against the ORIGINAL,
      // untouched files. The oracle replays the arithmetic relationally
      // with the rename as a projection alias.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k22") + "/orders_ren"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)
      s.sql(s"GRAFT ALTER '$root' RENAME COLUMN o_totalprice TO price")
      s.sql(s"GRAFT UPDATE '$root' SET price = price * 2.0 " +
        "WHERE o_orderpriority = '1-URGENT'")
      ManifestTable.readWhere(s, root, col("price") > 100000.0)
        .select(col("o_orderkey"), col("price"), col("o_orderpriority"))
    }),
    "k23_change_feed" -> ((s, d) => {
      // K23 (beyond-reference): row-level change data feed — the table
      // opts in (GRAFT FEED ENABLE), a SQL DELETE and a SQL MERGE
      // mutate it, and the feed (consumed through the graft-manifest
      // relation's feedFrom option) replays every row-level change with
      // _change_type/_commit_version. The oracle recomputes the same
      // change rows relationally.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k23") + "/orders_cdf"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)                                                     // v1
      s.sql(s"GRAFT FEED '$root' ENABLE")                         // v2
      s.sql(s"GRAFT DELETE FROM '$root' WHERE o_totalprice < 30000.0") // v3
      t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"), col("o_orderpriority"))
        .createOrReplaceTempView("k23_src")
      s.sql(s"GRAFT MERGE INTO '$root' USING k23_src ON (o_orderkey)") // v4
      s.read.format("graft-manifest").option("feedFrom", 2).load(root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
    }),
    "k24_sql_table" -> ((s, d) => {
      // K24 (beyond-reference): manifest tables as first-class SQL
      // relations — zero format() calls: the table grows by an
      // `INSERT INTO graft.`path` SELECT … FROM graft.`path`` (an
      // O(batch) append commit that carries every live file by
      // reference), and the final read joins the current snapshot
      // against a `FOR VERSION AS OF 1` time-traveled count, all via
      // the injected resolution rule. The oracle replays the insert
      // relationally with the pre-insert count as a scalar.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k24") + "/orders_sqlrel"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)                                                     // v1
      s.sql(s"INSERT INTO graft.`$root` " +
        "SELECT o_orderkey + 10000000, o_totalprice + 5000.0, o_orderpriority " +
        s"FROM graft.`$root` WHERE o_orderpriority = '1-URGENT'") // v2: append
      s.sql(
        s"""SELECT t.o_orderkey, t.o_totalprice, t.o_orderpriority, v1.base_rows
           |FROM graft.`$root` t
           |CROSS JOIN (SELECT count(*) AS base_rows
           |            FROM graft.`$root` FOR VERSION AS OF 1) v1
           |WHERE t.o_totalprice > 150000.0""".stripMargin)
    }),
    "k25_merge_sync" -> ((s, d) => {
      // K25 (beyond-reference): WHEN NOT MATCHED BY SOURCE — the Delta
      // clause that lets one MERGE touch BOTH sides of the match: urgent
      // orders (the source) fold their shifted price into the target,
      // while every order the source does NOT name is price-negated in
      // the same atomic commit. By-source semantics force a full-table
      // pass (each row must prove it has no match), so this also pins
      // the honest plan: one rewrite, no pruning pretense. The oracle
      // replays both branches as one CASE.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k25") + "/orders_sync"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)                                                     // v1
      t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"), col("o_orderpriority"))
        .createOrReplaceTempView("k25_src")
      s.sql(s"GRAFT MERGE INTO '$root' USING k25_src ON (o_orderkey) " +
        "WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + s.o_totalprice " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET " +
        "o_totalprice = t.o_totalprice * -1.0")                   // v2
      ManifestTable.read(s, root)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),
    "k26_sql_window" -> ((s, d) => {
      // K26 (beyond-reference): incremental windows as SQL relations —
      // `graft_changes.`path@v`` is "rows added since v" and
      // `graft_feed.`path@v`` the row-level CDF, both resolved by the
      // injected rule, so a SQL-only consumer can build an incremental
      // hop with zero format() calls. A SQL insert grows the table; the
      // two windows must agree row-for-row on what changed. The oracle
      // replays the insert relationally.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k26") + "/orders_win"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        root)                                                     // v1
      s.sql(s"GRAFT FEED '$root' ENABLE")                         // v2
      s.sql(s"INSERT INTO graft.`$root` " +
        "SELECT o_orderkey + 20000000, o_totalprice * 0.5, o_orderpriority " +
        s"FROM graft.`$root` WHERE o_orderpriority = '5-LOW'")    // v3
      s.sql(
        s"""SELECT o_orderkey, c.o_totalprice, c.o_orderpriority, f.change_type
           |FROM graft_changes.`$root@2` c
           |JOIN (SELECT o_orderkey, _change_type AS change_type
           |      FROM graft_feed.`$root@2`) f USING (o_orderkey)""".stripMargin)
    }),
    "k27_catalog_sql" -> ((s, d) => {
      // K27 (beyond-reference): the graft_lake TableCatalog — NAMED
      // manifest tables through Spark's native SQL machinery, zero GRAFT
      // grammar and zero format() calls: CREATE NAMESPACE + CREATE TABLE
      // (schema-only seed, hive-partitioned), INSERT INTO (O(batch)
      // append commit), DELETE FROM (copy-on-write via SupportsDelete),
      // ALTER TABLE RENAME COLUMN (metadata-only name mapping), dynamic
      // INSERT OVERWRITE (replaces ONLY the partition present in the
      // query; every other partition carries forward by reference), and
      // a VERSION AS OF time-traveled scalar. The oracle replays the
      // lifecycle relationally.
      val ns = "k27_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"graft_lake.$ns.orders"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
        s"o_orderpriority STRING) PARTITIONED BY (o_orderpriority)")  // v1
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")).createOrReplaceTempView("k27_src")
      s.sql(s"INSERT INTO $tbl SELECT o_orderkey, o_totalprice, " +
        "o_orderpriority FROM k27_src")                               // v2
      s.sql(s"DELETE FROM $tbl WHERE o_totalprice < 20000.0")         // v3
      s.sql(s"ALTER TABLE $tbl RENAME COLUMN o_totalprice TO price")  // v4
      s.sql(s"INSERT OVERWRITE $tbl SELECT o_orderkey, " +
        "o_totalprice * 2.0, o_orderpriority FROM k27_src " +
        "WHERE o_orderpriority = '1-URGENT'")                         // v5
      s.sql(
        s"""SELECT t.o_orderkey, t.price, t.o_orderpriority, v2.rows_v2
           |FROM $tbl t
           |CROSS JOIN (SELECT count(*) AS rows_v2
           |            FROM $tbl VERSION AS OF 2) v2
           |WHERE t.price > 100000.0""".stripMargin)
    }),
    "k28_dynamic_overwrite" -> ((s, d) => {
      // K28 (beyond-reference): dynamic partition overwrite through the
      // catalog — INSERT OVERWRITE under Spark's dynamic mode replaces
      // EXACTLY the partitions present in the query (the analyzer
      // rewrite onto ManifestTable.replacePartitions); every other
      // partition carries forward BY REFERENCE, which the time-traveled
      // pre-overwrite count in the output also pins. The oracle replays
      // partition replacement relationally.
      val ns = "k28_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"graft_lake.$ns.orders"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
        s"o_orderpriority STRING) PARTITIONED BY (o_orderpriority)")    // v1
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")).createOrReplaceTempView("k28_src")
      s.sql(s"INSERT INTO $tbl SELECT o_orderkey, o_totalprice, " +
        "o_orderpriority FROM k28_src")                                 // v2
      // replaces ONLY the 2-HIGH and 4-NOT SPECIFIED partitions
      s.sql(s"INSERT OVERWRITE $tbl SELECT o_orderkey + 30000000, " +
        "o_totalprice * 0.25, o_orderpriority FROM k28_src " +
        "WHERE o_orderpriority IN ('2-HIGH', '4-NOT SPECIFIED')")       // v3
      s.sql(
        s"""SELECT t.o_orderkey, t.o_totalprice, t.o_orderpriority, pre.rows_pre
           |FROM $tbl t
           |CROSS JOIN (SELECT count(*) AS rows_pre
           |            FROM $tbl VERSION AS OF 2) pre
           |WHERE t.o_totalprice > 90000.0""".stripMargin)
    }),
    "k29_schema_evolution" -> ((s, d) => {
      // K29 (beyond-reference): metadata-only schema evolution through
      // native catalog SQL — ALTER TABLE ADD COLUMN widens the declared
      // schema in one commit (zero files touched), reads pad the column
      // as typed NULLs, two native UPDATEs backfill it (the second
      // predicated ON the added column), and a later INSERT carries it.
      // A second table pins TRUNCATE: its post-truncate COUNT(*) (a
      // zero-scan metadata answer) rides along as a column. The oracle
      // replays the evolution relationally.
      val ns = "k29_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"graft_lake.$ns.orders"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE)") // v1
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("k29_src")
      s.sql(s"INSERT INTO $tbl SELECT o_orderkey, o_totalprice " +
        "FROM k29_src WHERE o_orderkey % 7 = 0")                           // v2
      s.sql(s"ALTER TABLE $tbl ADD COLUMN band STRING")                    // v3
      s.sql(s"UPDATE $tbl SET band = 'high' WHERE o_totalprice > 150000.0") // v4
      s.sql(s"UPDATE $tbl SET band = 'low' WHERE band IS NULL")            // v5
      s.sql(s"INSERT INTO $tbl SELECT o_orderkey + 50000000, " +
        "o_totalprice * 0.5, 'new' FROM k29_src WHERE o_orderkey % 11 = 0") // v6
      val u = s"graft_lake.$ns.scratch"
      s.sql(s"CREATE TABLE $u AS SELECT o_orderkey FROM k29_src " +
        "WHERE o_orderkey % 3 = 0")
      s.sql(s"TRUNCATE TABLE $u")
      s.sql(
        s"""SELECT t.o_orderkey, t.o_totalprice, t.band, u.rows_trunc
           |FROM $tbl t
           |CROSS JOIN (SELECT count(*) AS rows_trunc FROM $u) u
           |WHERE t.o_totalprice > 100000.0""".stripMargin)
    }),
    "k30_stream_write" -> ((s, d) => {
      // K30 (beyond-reference): the DSv2 streaming write —
      // writeStream.toTable with keyed-upsert options. Two AvailableNow
      // passes on ONE checkpoint: the first streams the base rows in,
      // the second (after more source files land) must apply ONLY the
      // new files and upsert them over the base by (key, order) — the
      // exactly-once replay watermark and the keep-max-order merge are
      // both on the board. Rows stage on executors (parquet codec),
      // never the driver. The oracle replays the upsert relationally.
      val ns = "k30_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"graft_lake.$ns.t"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, v DOUBLE, seq BIGINT)")
      val src = t(s, d, "orders").filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val srcDir = graft.core.TempDirs.create("k30-src") + "/in"
      val ck = graft.core.TempDirs.create("k30-ck")
      src.select(col("o_orderkey"), col("o_totalprice").as("v"),
        lit(1L).as("seq")).write.parquet(srcDir)
      def drain(): Unit = {
        val q = s.readStream.schema("o_orderkey BIGINT, v DOUBLE, seq BIGINT")
          .parquet(srcDir)
          .writeStream.option("checkpointLocation", ck)
          .option("keys", "o_orderkey").option("order", "seq")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(tbl)
        q.awaitTermination()
      }
      drain()
      src.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2.0).as("v"),
          lit(2L).as("seq")).write.mode("append").parquet(srcDir)
      drain()
      s.sql(s"SELECT o_orderkey, v, seq FROM $tbl WHERE v > 50000.0")
    }),
    "k31_clone" -> ((s, d) => {
      // K31 (beyond-reference): zero-copy shallow CLONE — one metadata
      // commit references the source's files (a 100 TB clone costs a
      // manifest write, not a copy), then BOTH sides mutate
      // independently: the clone takes a CoW delete plus a
      // merge-on-read UPDATE whose deletion vector addresses files that
      // physically live under the SOURCE root (the cross-root position
      // plumbing is the thing under test); the source takes its own
      // delete. The oracle replays both lineages relationally.
      import graft.sources.ManifestTable
      val base = graft.core.TempDirs.create("graft-k31")
      val src = base + "/orders_src"; val dst = base + "/orders_clone"
      ManifestTable.write(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority")),
        src)
      s.sql(s"GRAFT CLONE '$src' TO '$dst'")
      s.sql(s"GRAFT DELETE FROM '$dst' WHERE o_totalprice < 50000.0")
      s.sql(s"GRAFT UPDATE MOR '$dst' SET o_totalprice = o_totalprice * 2.0 " +
        "WHERE o_orderpriority = '1-URGENT'")
      s.sql(s"GRAFT DELETE FROM '$src' WHERE o_totalprice >= 200000.0")
      s.sql(
        s"""SELECT o_orderkey, o_totalprice, 'src' AS side FROM graft.`$src`
           |UNION ALL
           |SELECT o_orderkey, o_totalprice, 'clone' AS side FROM graft.`$dst`
           |""".stripMargin)
    }),
    "k32_optimize" -> ((s, d) => {
      // K32 (beyond-reference): incremental OPTIMIZE — orders lands as
      // four small-file commits (the steady-state small-file problem),
      // a merge-on-read UPDATE leaves deletion vectors behind, then
      // GRAFT OPTIMIZE bin-packs the small files AND folds the DVs in
      // one delta commit; the read must be byte-identical to the
      // relational replay, proving the rewrite conserved every row
      // (the commit carries an exact row-conservation guard).
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k32") + "/orders_opt"
      val src = t(s, d, "orders").select(col("o_orderkey"),
        col("o_totalprice"), col("o_orderpriority"))
      ManifestTable.write(src.filter(col("o_orderkey") % 4 === 0), root)
      (1 to 3).foreach { i =>
        ManifestTable.append(s, src.filter(col("o_orderkey") % 4 === i), root)
      }
      s.sql(s"GRAFT UPDATE MOR '$root' SET o_totalprice = o_totalprice * 1.1 " +
        "WHERE o_orderpriority = '2-HIGH'")
      s.sql(s"GRAFT OPTIMIZE '$root' TARGET 64")
      s.sql(s"SELECT o_orderkey, o_totalprice, o_orderpriority FROM graft.`$root`")
    }),
    "k33_generated" -> ((s, d) => {
      // K33 (beyond-reference): generated partition columns — the table
      // is PARTITIONED BY days(ts) (Iceberg hidden-partitioning
      // semantics, Delta generated-column mechanics): the seed write,
      // an append that never mentions ts_day, and a dynamic overwrite
      // of exactly one derived day all land in the right partitions
      // because every write boundary derives the column. The oracle
      // replays the lineages relationally with strftime.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k33") + "/events_days"
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      // optimized writes: each batch REBALANCE-shuffles by the derived
      // day, so a T-task batch lands ~one file per day, not T × days
      // splinters — file counts stay O(partitions), not O(input tasks)
      ManifestTable.createEmpty(s, root, ev.schema,
        partitionCols = Seq("days(ts)"),
        tags = Map(ManifestTable.OptimizedWriteProp -> "true"))
      ManifestTable.append(s, ev.filter(col("event_id") % 2 === 0), root)
      // append derives ts_day; no layout spelled
      ManifestTable.append(s, ev.filter(col("event_id") % 2 === 1), root)
      // dynamic overwrite of the single busiest day: replace its rows
      // with per-type rollup markers (value = day total for the type)
      val day = ManifestTable.read(s, root).groupBy(col("ts_day"))
        .count().orderBy(col("count").desc, col("ts_day").asc)
        .limit(1).collect().head.getString(0)
      val rolled = ManifestTable.read(s, root)
        .filter(col("ts_day") === day)
        .groupBy(col("event_type"))
        .agg(graft.OracleMath.dsum(col("value"), 4, 2).as("value"),
          min(col("event_id")).as("event_id"), min(col("ts")).as("ts"))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      ManifestTable.replacePartitions(s, rolled, root)
      ManifestTable.read(s, root)
        .select(col("event_id"), col("ts_day"), col("event_type"), col("value"))
    }),
    "k35_spec_evolution" -> ((s, d) => {
      // K35 (beyond-reference): partition-spec EVOLUTION — the table is
      // born PARTITIONED BY days(ts), half the rows land under that
      // era, one metadata commit evolves the spec to (months(ts),
      // event_type), and the other half lands under the new layout.
      // The mixed-era read must repair BOTH generated columns on every
      // row: era-1 rows predate ts_month (read-time derivation from the
      // defining expression), era-2 rows carry ts_day as a data column
      // derived at their write boundary. The oracle computes both
      // transforms relationally for all rows — era-blind.
      import graft.sources.ManifestTable
      val root = graft.core.TempDirs.create("graft-k35") + "/events_evo"
      val ev = t(s, d, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      ManifestTable.createEmpty(s, root, ev.schema,
        partitionCols = Seq("days(ts)"))                                // v1
      ManifestTable.append(s, ev.filter(col("event_id") % 2 === 0), root) // era 1
      ManifestTable.evolvePartitionSpec(s, root,
        Seq("months(ts)", "event_type"))                                // v3
      ManifestTable.append(s, ev.filter(col("event_id") % 2 === 1), root) // era 2
      ManifestTable.readWhere(s, root, col("event_id") % 7 === 0)
        .select(col("event_id"), col("ts_day"), col("ts_month"),
          col("event_type"), col("value"))
    }),
    "k34_bucket_join" -> ((s, d) => {
      // K34 (beyond-reference): storage-partitioned join — two catalog
      // tables created PARTITIONED BY (bucket(32, key)) report
      // KeyGroupedPartitioning from their DSv2 scans, so the fact-fact
      // join below runs with ZERO Exchange on either side (the plan pin
      // lives in BucketedJoinSpec; HERE the oracle pins that the
      // shuffle-free plan returns exactly the shuffled answer). Bucket
      // equality is implied by key equality — same murmur3, same count
      // — so it never appears in the oracle's join.
      val ns = "k34_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_orderpriority STRING) PARTITIONED BY (bucket(32, o_orderkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.l (l_orderkey BIGINT, " +
        "l_extendedprice DOUBLE) PARTITIONED BY (bucket(32, l_orderkey))")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("k34_o")
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
        .createOrReplaceTempView("k34_l")
      // the generated bucket column derives at the write boundary
      s.sql(s"INSERT INTO graft_lake.$ns.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM k34_o")
      s.sql(s"INSERT INTO graft_lake.$ns.l " +
        "SELECT l_orderkey, l_extendedprice, NULL FROM k34_l")
      val joined = s.sql(
        s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
           |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |FROM graft_lake.$ns.o o JOIN graft_lake.$ns.l l
           |  ON o.o_orderkey = l.l_orderkey
           |  AND o.o_orderkey_bucket = l.l_orderkey_bucket
           |GROUP BY o.o_orderpriority""".stripMargin)
      // the result is a handful of priority-level rows; materialize it
      // and DROP the (data-scale) temp tables before returning — a
      // repeated run at sf100-equivalent would otherwise accumulate
      // tens of GB of warehouse dirs per repetition
      val rows = joined.collect()
      val schema = joined.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP TABLE graft_lake.$ns.l")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k37_dv_bucket_join" -> ((s, d) => {
      // K37 (beyond-reference): the k34 storage-partitioned join under
      // MERGE-ON-READ deletes. Deletion vectors planted on BOTH legs
      // keep the NATIVE batch scan — DVs only REMOVE rows, so the
      // KeyGroupedPartitioning stays valid, the join still runs with
      // zero Exchange (plan pin: BucketedJoinSpec "deletion vectors
      // stay NATIVE"), and the reader applies each file's positions
      // inline. The oracle replays both deletes relationally as
      // join-side filters.
      val ns = "k37_" + java.util.UUID.randomUUID().toString.take(8)
      val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_orderpriority STRING) PARTITIONED BY (bucket(16, o_orderkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.l (l_orderkey BIGINT, " +
        "l_extendedprice DOUBLE) PARTITIONED BY (bucket(16, l_orderkey))")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("k37_o")
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
        .createOrReplaceTempView("k37_l")
      s.sql(s"INSERT INTO graft_lake.$ns.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM k37_o")
      s.sql(s"INSERT INTO graft_lake.$ns.l " +
        "SELECT l_orderkey, l_extendedprice, NULL FROM k37_l")
      graft.sources.ManifestTable.deleteMoR(s, s"$wh/$ns/o",
        col("o_orderkey") % 7 === 2)
      graft.sources.ManifestTable.deleteMoR(s, s"$wh/$ns/l",
        col("l_orderkey") % 10 === 3)
      val joined = s.sql(
        s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
           |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |FROM graft_lake.$ns.o o JOIN graft_lake.$ns.l l
           |  ON o.o_orderkey = l.l_orderkey
           |  AND o.o_orderkey_bucket = l.l_orderkey_bucket
           |GROUP BY o.o_orderpriority""".stripMargin)
      val rows = joined.collect()
      val schema = joined.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP TABLE graft_lake.$ns.l")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k36_cdf_by_name" -> ((s, d) => {
      // K36 (beyond-reference): the Delta-shaped BATCH CDF surface by
      // catalog NAME — spark.read.option("readChangeFeed", true)
      // .option("startingVersion", n).table("graft_lake.ns.t") with an
      // INCLUSIVE version window, resolved through the same analyzer
      // rule family as the path/format feed surfaces so the three
      // spellings cannot drift. The oracle replays the row-level
      // lifecycle (insert → update pre/post images → post-update
      // deletes) relationally.
      val ns = "k36_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"graft_lake.$ns.o"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
        "o_orderpriority STRING)")                                          // v1
      s.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('cdf.enabled'='true')")   // v2
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")).createOrReplaceTempView("k36_src")
      s.sql(s"INSERT INTO $tbl SELECT * FROM k36_src")                      // v3
      s.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice + 1000.0 " +
        "WHERE o_orderpriority = '1-URGENT'")                               // v4
      s.sql(s"DELETE FROM $tbl WHERE o_totalprice < 30000.0")               // v5
      s.read.option("readChangeFeed", "true").option("startingVersion", "3")
        .table(tbl)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
    }),
    "k38_agg_pushdown" -> ((s, d) => {
      // K38 (beyond-reference): DSv2 AGGREGATE pushdown through the
      // catalog — k14's metadata-only aggregates, now negotiated by
      // Spark itself (SupportsPushDownAggregates). Phase 1: grouped
      // MIN/MAX/COUNT over the hive-partitioned table answer COMPLETE
      // from the manifest's per-file footer stats + directory values
      // (zero data files read — AggPushdownSpec pins the plan). String
      // MIN/MAX (o_orderstatus) rides the commit-time exactness marker:
      // engine-written footers record untruncated bounds, so the bound
      // IS the value. Phase 2: a MoR delete plants deletion vectors on
      // ONE partition's files, and the global aggregate degrades to
      // PARTIAL pushdown — only the DV'd files are re-read and folded
      // (including the string extremes), every clean file stays
      // metadata. The oracle recomputes both phases relationally.
      val ns = "k38_" + java.util.UUID.randomUUID().toString.take(8)
      val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderstatus STRING, " +
        "o_orderpriority STRING) PARTITIONED BY (o_orderpriority)")
      t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_orderstatus"), col("o_orderpriority"))
        .createOrReplaceTempView("k38_src")
      s.sql(s"INSERT INTO graft_lake.$ns.o SELECT * FROM k38_src")
      val grouped = s.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
           |  MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
           |  MAX(o_orderdate) AS mx_date,
           |  MIN(o_orderstatus) AS mn_status, MAX(o_orderstatus) AS mx_status
           |FROM graft_lake.$ns.o GROUP BY o_orderpriority""".stripMargin)
      val groupedRows = grouped.collect()
      graft.sources.ManifestTable.deleteMoR(s, s"$wh/$ns/o",
        col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 13 === 5)
      val after = s.sql(
        s"""SELECT MAX(o_orderkey) AS mx_after, COUNT(*) AS n_after,
           |  MAX(o_orderstatus) AS mx_status_after
           |FROM graft_lake.$ns.o""".stripMargin)
      val out = s.createDataFrame(java.util.Arrays.asList(groupedRows: _*),
        grouped.schema).crossJoin(after)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k39_topn_pruned" -> ((s, d) => {
      // K39 (beyond-reference): TopN + LIMIT pushdown through the
      // catalog scan. The table is CLUSTERED on the sort key, so
      // `ORDER BY o_orderkey DESC LIMIT 50` prunes to the files whose
      // stats range can reach the top-50 (the cutoff-bound proof in
      // GraftBatchScan.topNFiles — AggPushdownSpec pins the plan and
      // the opened-file bound); a bare LIMIT plans only a row-covering
      // file prefix. Both keep Spark's own TopN/Limit above the scan,
      // so the pruning is an I/O bound, never a semantics change — the
      // oracle recomputes both relationally.
      val ns = "k39_" + java.util.UUID.randomUUID().toString.take(8)
      val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_totalprice DOUBLE)")
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("k39_src")
      s.sql(s"INSERT INTO graft_lake.$ns.o SELECT * FROM k39_src")
      graft.sources.ManifestTable.cluster(s, s"$wh/$ns/o",
        sortCols = Seq("o_orderkey"), targetFileMB = 1)
      val top = s.sql(s"SELECT o_orderkey, o_totalprice " +
        s"FROM graft_lake.$ns.o ORDER BY o_orderkey DESC LIMIT 50")
      val limited = s.sql(s"SELECT CAST(count(*) AS BIGINT) AS n_limited " +
        s"FROM (SELECT * FROM graft_lake.$ns.o LIMIT 100)")
      val out = top.crossJoin(limited)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k41_rename_native" -> ((s, d) => {
      // K41 (beyond-reference): PERMANENT metadata states keep the
      // NATIVE scan. Two co-bucketed tables get a data column RENAMED
      // and another DROPPED (metadata-only commits), then join through
      // the storage-partitioned path — BucketedJoinSpec pins zero
      // Exchange + BatchScan through the rename; here the driver pins
      // the ANSWERS. A third table evolves its partition spec mid-life
      // (era 1 unpartitioned, era 2 identity dirs) and reads back
      // through the native per-era scan (eras(2) pin in the same spec).
      // The oracle reconstructs all three relationally.
      val ns = "k41_" + java.util.UUID.randomUUID().toString.take(8)
      val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_orderpriority STRING) PARTITIONED BY (bucket(16, o_orderkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.l (l_orderkey BIGINT, " +
        "l_extendedprice DOUBLE, l_tax DOUBLE) " +
        "PARTITIONED BY (bucket(16, l_orderkey))")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("k41_o")
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"),
        col("l_tax")).createOrReplaceTempView("k41_l")
      s.sql(s"INSERT INTO graft_lake.$ns.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM k41_o")
      s.sql(s"INSERT INTO graft_lake.$ns.l " +
        "SELECT l_orderkey, l_extendedprice, l_tax, NULL FROM k41_l")
      // metadata-only evolution: no file rewritten, the scan translates
      s.sql(s"ALTER TABLE graft_lake.$ns.o RENAME COLUMN o_orderpriority TO priority")
      s.sql(s"ALTER TABLE graft_lake.$ns.l DROP COLUMN l_tax")
      // mixed-era table: era 1 unpartitioned, era 2 identity-partitioned
      s.sql(s"CREATE TABLE graft_lake.$ns.e (o_orderpriority STRING, " +
        "o_orderkey BIGINT)")
      s.sql(s"INSERT INTO graft_lake.$ns.e SELECT o_orderpriority, " +
        "o_orderkey FROM k41_o WHERE o_orderkey % 2 = 0")
      graft.sources.ManifestTable.evolvePartitionSpec(s, s"$wh/$ns/e",
        Seq("o_orderpriority"))
      s.sql(s"INSERT INTO graft_lake.$ns.e SELECT o_orderpriority, " +
        "o_orderkey FROM k41_o WHERE o_orderkey % 2 = 1")
      val out = s.sql(
        s"""WITH j AS (
           |  SELECT o.priority, COUNT(*) AS n_items,
           |    ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |  FROM graft_lake.$ns.o o JOIN graft_lake.$ns.l l
           |    ON o.o_orderkey = l.l_orderkey
           |    AND o.o_orderkey_bucket = l.l_orderkey_bucket
           |  GROUP BY o.priority),
           |e AS (
           |  SELECT o_orderpriority AS priority, COUNT(*) AS n_era
           |  FROM graft_lake.$ns.e GROUP BY o_orderpriority)
           |SELECT j.priority, j.n_items, j.revenue, e.n_era
           |FROM j JOIN e ON j.priority = e.priority""".stripMargin)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP TABLE graft_lake.$ns.l")
      s.sql(s"DROP TABLE graft_lake.$ns.e")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k42_multikey_bucket" -> ((s, d) => {
      // K42 (beyond-reference): MULTI-COLUMN bucket layouts —
      // bucket(16, l_partkey, l_suppkey) hashes the source TUPLE, so a
      // composite-key fact-fact join (the partsupp-shaped key) runs as
      // a storage-partitioned join with zero Exchange; a single-column
      // layout could only co-locate one member's equality. The natural
      // join shape (both member equalities) gets the tuple-bucket
      // conjunct injected by the optimizer rule; BucketedJoinSpec pins
      // the plan (zero Exchange + the single-member refusal), the
      // driver pins the ANSWERS against a relational DuckDB replay.
      val ns = "k42_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.li (l_partkey BIGINT, " +
        "l_suppkey BIGINT, l_linestatus STRING, l_extendedprice DOUBLE) " +
        "PARTITIONED BY (bucket(16, l_partkey, l_suppkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.ret (l_partkey BIGINT, " +
        "l_suppkey BIGINT, l_quantity DOUBLE) " +
        "PARTITIONED BY (bucket(16, l_partkey, l_suppkey))")
      t(s, d, "lineitem").createOrReplaceTempView("k42_l")
      s.sql(s"INSERT INTO graft_lake.$ns.li SELECT l_partkey, l_suppkey, " +
        "l_linestatus, l_extendedprice, NULL FROM k42_l")
      s.sql(s"INSERT INTO graft_lake.$ns.ret SELECT l_partkey, l_suppkey, " +
        "CAST(l_quantity AS DOUBLE), NULL FROM k42_l WHERE l_returnflag = 'R'")
      val out = s.sql(
        s"""SELECT li.l_linestatus, COUNT(*) AS n_pairs,
           |  ${OracleMath.dsumSql("li.l_extendedprice", 4, 2)} AS revenue,
           |  ${OracleMath.dsumSql("r.l_quantity", 4, 2)} AS ret_qty
           |FROM graft_lake.$ns.li li JOIN graft_lake.$ns.ret r
           |  ON li.l_partkey = r.l_partkey AND li.l_suppkey = r.l_suppkey
           |GROUP BY li.l_linestatus""".stripMargin)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.li")
      s.sql(s"DROP TABLE graft_lake.$ns.ret")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k44_compat_bucket" -> ((s, d) => {
      // K44 (beyond-reference): COMPATIBLE bucket counts — a 32-bucket
      // fact joins a 16-bucket table with ZERO Exchange on the NATURAL
      // shape (ON l_orderkey = o_orderkey, no generated column spelled
      // anywhere). The scans report the bucket TRANSFORM over the
      // source key (a ReducibleFunction served by the catalog's
      // FunctionCatalog), so the planner reduces the finer side's
      // partition values — pmod(h,32) mod 16 = pmod(h,16) — instead of
      // shuffling both sides (plan pin: BucketedJoinSpec "COMPATIBLE
      // bucket counts"; the non-divisible refusal is pinned next to
      // it). The oracle is the plain relational join.
      val ns = "k44_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_orderpriority STRING) PARTITIONED BY (bucket(16, o_orderkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.l (l_orderkey BIGINT, " +
        "l_extendedprice DOUBLE) PARTITIONED BY (bucket(32, l_orderkey))")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("k44_o")
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
        .createOrReplaceTempView("k44_l")
      s.sql(s"INSERT INTO graft_lake.$ns.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM k44_o")
      s.sql(s"INSERT INTO graft_lake.$ns.l " +
        "SELECT l_orderkey, l_extendedprice, NULL FROM k44_l")
      val out = s.sql(
        s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
           |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |FROM graft_lake.$ns.l l JOIN graft_lake.$ns.o o
           |  ON l.l_orderkey = o.o_orderkey
           |GROUP BY o.o_orderpriority""".stripMargin)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP TABLE graft_lake.$ns.l")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k43_clone_native" -> ((s, d) => {
      // K43 (beyond-reference): the k34 storage-partitioned join where
      // the fact leg is a zero-copy SHALLOW CLONE under a merge-on-read
      // delete. The clone commit copies manifest metadata only, so the
      // cloned table's scan keeps KeyGroupedPartitioning/stats/DPP from
      // its FIRST read — no OPTIMIZE rewrite re-earns the tier — while
      // its inherited parquet bytes still live under the SOURCE root
      // and its deletion vector lands locally (per-generation base
      // resolution composing with relPath-keyed DV positions; plan pin:
      // BucketedJoinSpec "clone chains keep the NATIVE scan"). The
      // oracle replays the clone lineage relationally: source rows
      // minus the MoR delete.
      val ns = "k43_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_orderpriority STRING) PARTITIONED BY (bucket(16, o_orderkey))")
      s.sql(s"CREATE TABLE graft_lake.$ns.l (l_orderkey BIGINT, " +
        "l_extendedprice DOUBLE) PARTITIONED BY (bucket(16, l_orderkey))")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("k43_o")
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
        .createOrReplaceTempView("k43_l")
      s.sql(s"INSERT INTO graft_lake.$ns.o " +
        "SELECT o_orderkey, o_orderpriority, NULL FROM k43_o")
      s.sql(s"INSERT INTO graft_lake.$ns.l " +
        "SELECT l_orderkey, l_extendedprice, NULL FROM k43_l")
      s.sql(s"GRAFT CLONE graft_lake.$ns.o TO graft_lake.$ns.oc")
      s.sql(s"GRAFT DELETE MOR FROM graft_lake.$ns.oc WHERE o_orderkey % 5 = 1")
      val out = s.sql(
        s"""SELECT o.o_orderpriority, COUNT(*) AS n_items,
           |  ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
           |FROM graft_lake.$ns.oc o JOIN graft_lake.$ns.l l
           |  ON o.o_orderkey = l.l_orderkey
           |  AND o.o_orderkey_bucket = l.l_orderkey_bucket
           |GROUP BY o.o_orderpriority""".stripMargin)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.oc")
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP TABLE graft_lake.$ns.l")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k45_typed_partition" -> ((s, d) => {
      // K45 (beyond-reference): TYPED identity-partition literals
      // consumed exactly. The table declares day DATE / b4 INT layout
      // columns — they read back in their declared types (r18 pinned
      // every layout column to STRING, so `day = DATE'…'` arrived as
      // `cast(day) = …` and nothing pushed), so the typed predicates
      // push plain, the row-exact file prune CONSUMES them (no
      // post-scan Filter), and count/min/max under a typed WHERE stays
      // a zero-file metadata fold at any table size — AggPushdownSpec
      // pins the plans; the driver pins the ANSWERS, including a typed
      // GROUP BY (DATE group key from directory values), a typed
      // range + IN + INT equality, and a typed DELETE lifecycle. The
      // oracle recomputes everything relationally from events.
      val ns = "k45_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.e (event_id BIGINT, " +
        "user_id BIGINT, day DATE, b4 INT) PARTITIONED BY (day, b4)")
      t(s, d, "events").select(col("event_id"), col("user_id"),
          to_date(col("ts")).as("day"),
          pmod(col("user_id"), lit(4)).cast("int").as("b4"))
        .createOrReplaceTempView("k45_src")
      s.sql(s"INSERT INTO graft_lake.$ns.e SELECT * FROM k45_src")
      // MATERIALIZE the pre-delete answers (localCheckpoint pins the
      // rows): a lazy frame re-scans the table when the final collect
      // runs, which is AFTER the DELETE below — the oracle's CTEs see
      // the pre-delete state
      val grouped = s.sql(s"SELECT day, count(*) AS n_day " +
        s"FROM graft_lake.$ns.e WHERE b4 IN (0, 3) GROUP BY day")
        .localCheckpoint()
      val eq = s.sql(s"SELECT count(*) AS n_eq, min(event_id) AS mn_id, " +
        s"max(event_id) AS mx_id FROM graft_lake.$ns.e " +
        s"WHERE day = DATE'2024-01-05'").localCheckpoint()
      val range = s.sql(s"SELECT count(*) AS n_range FROM graft_lake.$ns.e " +
        s"WHERE day >= DATE'2024-01-10' AND day < DATE'2024-01-20' AND b4 = 2")
        .localCheckpoint()
      s.sql(s"DELETE FROM graft_lake.$ns.e WHERE day = DATE'2024-01-01'")
      val after = s.sql(s"SELECT count(*) AS n_after FROM graft_lake.$ns.e")
      val out = grouped.crossJoin(eq).crossJoin(range).crossJoin(after)
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.e")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    "k40_replace_where" -> ((s, d) => {
      // K40 (beyond-reference): atomic REPLACE WHERE — static-mode
      // `INSERT OVERWRITE … PARTITION (…)` lands as ONE
      // ManifestTable.replaceWhere commit: the named partition's rows
      // out, the batch in, every other file carried by REFERENCE
      // (ReplaceWhereSpec pins the by-reference economics, the
      // outside-region refusal and the delete+insert change feed). The
      // oracle recomputes the final table relationally.
      val ns = "k40_" + java.util.UUID.randomUUID().toString.take(8)
      s.sql(s"CREATE NAMESPACE graft_lake.$ns")
      s.sql(s"CREATE TABLE graft_lake.$ns.o (o_orderkey BIGINT, " +
        "o_totalprice DOUBLE, o_orderpriority STRING) " +
        "PARTITIONED BY (o_orderpriority)")
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")).createOrReplaceTempView("k40_src")
      s.sql(s"INSERT INTO graft_lake.$ns.o SELECT * FROM k40_src")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      try s.sql(s"INSERT OVERWRITE graft_lake.$ns.o " +
        "PARTITION (o_orderpriority='1-URGENT') " +
        "SELECT o_orderkey, o_totalprice + 1000.0 FROM k40_src " +
        "WHERE o_orderpriority = '1-URGENT'")
      finally s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val out = s.table(s"graft_lake.$ns.o")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      val rows = out.collect()
      val schema = out.schema
      s.sql(s"DROP TABLE graft_lake.$ns.o")
      s.sql(s"DROP NAMESPACE graft_lake.$ns")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    })
  )

  private val hourlySql =
    """SELECT date_trunc('hour', ts) AS hour_start,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      |  MIN(value) AS min_price,
      |  MAX(value) AS max_price,
      |  arg_min(value, ts) AS first_price,
      |  arg_max(value, ts) AS last_price,
      |  COUNT(*) AS data_points
      |FROM events GROUP BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "a2_hourly_stats" -> hourlySql,
    "a3_daily_rollup" ->
      s"""WITH hourly AS ($hourlySql)
         |SELECT date_trunc('day', hour_start) AS day_start,
         |  ROUND(CAST(SUM(CAST(avg_price AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
         |  MIN(min_price) AS min_price,
         |  MAX(max_price) AS max_price,
         |  arg_min(first_price, hour_start) AS opening_price,
         |  arg_max(last_price, hour_start) AS closing_price,
         |  CAST(SUM(data_points) AS BIGINT) AS total_data_points,
         |  COUNT(*) AS hours_with_data,
         |  ROUND(arg_max(last_price, hour_start) - arg_min(first_price, hour_start), 6) AS price_change,
         |  ROUND(CASE WHEN arg_min(first_price, hour_start) > 0
         |    THEN (arg_max(last_price, hour_start) - arg_min(first_price, hour_start))
         |         / arg_min(first_price, hour_start) * 100.0
         |    ELSE 0.0 END, 6) AS price_change_pct
         |FROM hourly GROUP BY 1""".stripMargin,
    "a5_sentiment_daily" -> SentimentOracle.dailySql,
    "a6_sql_avg" ->
      """SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a7_group_count" ->
      "SELECT p_type, COUNT(*) AS n_parts FROM part GROUP BY 1",
    "a8_last_wins" ->
      """SELECT p_brand, arg_max(p_retailprice, p_partkey) AS last_price,
        |       COUNT(*) AS n_parts
        |FROM part GROUP BY 1""".stripMargin,
    "a11_fan_in" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${dsumSql("value", 6, 4)} AS total_value
         |FROM events WHERE event_type IN ('click', 'view', 'purchase')
         |GROUP BY 1""".stripMargin,
    "w3_first_last" ->
      """SELECT user_id,
        |  arg_min(value, ts) AS first_value,
        |  arg_max(value, ts) AS last_value,
        |  MIN(ts) AS first_ts,
        |  MAX(ts) AS last_ts
        |FROM events GROUP BY 1""".stripMargin,
    "w9_rolling_avg" ->
      """SELECT event_id, user_id, ts,
        |  COUNT(value) OVER w AS n_1h,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
        |        / COUNT(value) OVER w, 6) AS avg_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w5_running_sum" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS date, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, date, n,
        |  CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY date
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
        |FROM daily""".stripMargin,
    "w6_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq, MIN(ts) AS session_start,
        |       MAX(ts) AS session_end, COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,
    "j8_interval_overlap" ->
      """WITH sp AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS s, MAX(ts) AS e
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2)
        |SELECT a.day, a.user_id AS u1, b.user_id AS u2,
        |  CAST(least(epoch_us(a.e), epoch_us(b.e))
        |       - greatest(epoch_us(a.s), epoch_us(b.s)) AS BIGINT) AS overlap_us
        |FROM sp a JOIN sp b
        |  ON a.day = b.day AND a.user_id < b.user_id
        | AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    "j7_range_join" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM f),
        |sess AS (
        |  SELECT user_id, session_seq, MIN(ts) AS session_start,
        |         MAX(ts) AS session_end
        |  FROM s GROUP BY 1, 2)
        |SELECT e.user_id, sess.session_seq, COUNT(*) AS n_points
        |FROM events e JOIN sess
        |  ON e.user_id = sess.user_id
        | AND e.ts >= sess.session_start AND e.ts <= sess.session_end
        |GROUP BY 1, 2""".stripMargin,
    "o1_sort" -> s"$dailyRevenueSql ORDER BY date",
    "o2_topk" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "o4_first_row" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS date FROM orders
        |ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1""".stripMargin,
    "u1_union_merge" ->
      s"""WITH u AS (
         |  SELECT CAST(ts AS DATE) AS date, 'event' AS src, value AS amount,
         |         NULL AS priority
         |  FROM events
         |  UNION ALL
         |  SELECT CAST(o_orderdate AS DATE), 'order', o_totalprice, o_orderpriority
         |  FROM orders)
         |SELECT src, priority, COUNT(*) AS n,
         |  ${dsumSql("amount", 6, 2)} AS total
         |FROM u GROUP BY 1, 2""".stripMargin,
    "u2_keep_last" ->
      """WITH ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, value FROM ranked WHERE rn = 1""".stripMargin,
    "k5_upsert_replace" ->
      s"""WITH existing AS (SELECT date, revenue, 1 AS version FROM ($dailyRevenueSql)),
         |fresh AS (
         |  SELECT CAST(o_orderdate AS DATE) AS date,
         |         ${dsumSql("o_totalprice", 4, 2)} AS revenue, 2 AS version
         |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998 GROUP BY 1)
         |SELECT * FROM existing WHERE date NOT IN (SELECT date FROM fresh)
         |UNION ALL SELECT * FROM fresh""".stripMargin,
    "k4_append_dedup" ->
      s"""WITH existing AS (SELECT date, revenue, 1 AS version FROM ($dailyRevenueSql)),
         |fresh AS (
         |  SELECT CAST(o_orderdate AS DATE) AS date,
         |         ${dsumSql("o_totalprice", 4, 2)} + 0.5 AS revenue, 2 AS version
         |  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998 GROUP BY 1),
         |u AS (SELECT * FROM existing UNION ALL SELECT * FROM fresh),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY date ORDER BY version DESC) AS rn
         |  FROM u)
         |SELECT date, revenue, version FROM ranked WHERE rn = 1""".stripMargin,
    "k11_pruned_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.0""".stripMargin,
    "k12_incremental_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        |FROM orders
        |WHERE EXTRACT(year FROM o_orderdate) >= 1995""".stripMargin,
    "k13_join_pruned_read" ->
      s"""SELECT c_custkey, c_name, COUNT(*) AS order_cnt,
         |       ${dsumSql("o_totalprice", 4, 2)} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_nationkey = 5
         |GROUP BY 1, 2""".stripMargin,
    "k14_stats_agg" ->
      """SELECT COUNT(*) AS n_rows, COUNT(o_custkey) AS n_cust,
        |       COUNT(o_orderpriority) AS n_prio,
        |       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        |       MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio
        |FROM orders""".stripMargin,
    "k15_delete" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE NOT (o_orderpriority = '1-URGENT' AND o_totalprice < 150000.0)""".stripMargin,
    "k16_update" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderpriority = '5-LOW'
        |            THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
        |       o_orderpriority
        |FROM orders""".stripMargin,
    "k17_merge" ->
      """SELECT o_orderkey,
        |       CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
        |              THEN o_totalprice + (o_totalprice + 1000.0)
        |            WHEN EXTRACT(year FROM o_orderdate) = 1997
        |              THEN o_totalprice + 1000.0
        |            ELSE o_totalprice END AS o_totalprice,
        |       EXTRACT(year FROM o_orderdate) AS o_year
        |FROM orders
        |WHERE EXTRACT(year FROM o_orderdate) <= 1997""".stripMargin,
    "k18_zorder_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 350000.0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey < 100 AND o_totalprice <= 350000.0""".stripMargin,
    "k19_mor_roundtrip" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice * 1.1
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderpriority
        |FROM orders
        |WHERE NOT (o_totalprice < 100000.0)""".stripMargin,
    "k20_bloom_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (1, 42, 500, 1337)""".stripMargin,
    "k21_sql_dml" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |         THEN o_totalprice + (o_totalprice + 1000.0)
        |       WHEN o_orderpriority = '5-LOW' THEN o_totalprice * 1.05
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderpriority
        |FROM orders WHERE NOT (o_totalprice < 50000.0)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 50000.0""".stripMargin,
    "k22_rename_read" ->
      """WITH renamed AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2.0
        |         ELSE o_totalprice END AS price,
        |    o_orderpriority
        |  FROM orders)
        |SELECT o_orderkey, price, o_orderpriority
        |FROM renamed WHERE price > 100000.0""".stripMargin,
    "k23_change_feed" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority,
        |       'delete' AS change_type, CAST(3 AS BIGINT) AS commit_version
        |FROM orders WHERE o_totalprice < 30000.0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderpriority,
        |       'update_preimage', 4
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND NOT (o_totalprice < 30000.0)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 1000.0, o_orderpriority,
        |       'update_postimage', 4
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND NOT (o_totalprice < 30000.0)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 1000.0, o_orderpriority,
        |       'insert', 4
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 30000.0""".stripMargin,
    "k24_sql_table" ->
      """WITH grown AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice + 5000.0, o_orderpriority
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT g.o_orderkey, g.o_totalprice, g.o_orderpriority, v1.base_rows
        |FROM grown g
        |CROSS JOIN (SELECT count(*) AS base_rows FROM orders) v1
        |WHERE g.o_totalprice > 150000.0""".stripMargin,
    "k25_merge_sync" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |         THEN o_totalprice + (o_totalprice + 1000.0)
        |       ELSE o_totalprice * -1.0 END AS o_totalprice,
        |  o_orderpriority
        |FROM orders""".stripMargin,
    "k26_sql_window" ->
      """SELECT o_orderkey + 20000000 AS o_orderkey,
        |  o_totalprice * 0.5 AS o_totalprice,
        |  o_orderpriority, 'insert' AS change_type
        |FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,
    "k27_catalog_sql" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
        |survivors AS (
        |  SELECT * FROM src WHERE NOT (o_totalprice < 20000.0)),
        |final AS (
        |  SELECT o_orderkey, o_totalprice AS price, o_orderpriority
        |  FROM survivors WHERE o_orderpriority <> '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 2.0 AS price, o_orderpriority
        |  FROM src WHERE o_orderpriority = '1-URGENT')
        |SELECT f.o_orderkey, f.price, f.o_orderpriority, v2.rows_v2
        |FROM final f
        |CROSS JOIN (SELECT count(*) AS rows_v2 FROM src) v2
        |WHERE f.price > 100000.0""".stripMargin,
    "k28_dynamic_overwrite" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
        |final AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM src
        |  WHERE o_orderpriority NOT IN ('2-HIGH', '4-NOT SPECIFIED')
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_totalprice * 0.25, o_orderpriority
        |  FROM src
        |  WHERE o_orderpriority IN ('2-HIGH', '4-NOT SPECIFIED'))
        |SELECT f.o_orderkey, f.o_totalprice, f.o_orderpriority, pre.rows_pre
        |FROM final f
        |CROSS JOIN (SELECT count(*) AS rows_pre FROM src) pre
        |WHERE f.o_totalprice > 90000.0""".stripMargin,
    "k29_schema_evolution" ->
      """WITH src AS (SELECT o_orderkey, o_totalprice FROM orders),
        |final AS (
        |  SELECT o_orderkey, o_totalprice,
        |         CASE WHEN o_totalprice > 150000.0 THEN 'high' ELSE 'low' END AS band
        |  FROM src WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 50000000, o_totalprice * 0.5, 'new'
        |  FROM src WHERE o_orderkey % 11 = 0)
        |SELECT f.o_orderkey, f.o_totalprice, f.band,
        |       CAST(0 AS BIGINT) AS rows_trunc
        |FROM final f
        |WHERE f.o_totalprice > 100000.0""".stripMargin,
    "k30_stream_write" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 0),
        |final AS (
        |  SELECT o_orderkey, o_totalprice AS v, CAST(1 AS BIGINT) AS seq
        |  FROM src WHERE o_orderkey % 3 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 2.0, CAST(2 AS BIGINT) FROM src
        |  WHERE o_orderkey % 3 = 0)
        |SELECT o_orderkey, v, seq FROM final WHERE v > 50000.0""".stripMargin,
    "k31_clone" ->
      """SELECT o_orderkey, o_totalprice, 'src' AS side
        |FROM orders WHERE NOT (o_totalprice >= 200000.0)
        |UNION ALL
        |SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  'clone' AS side
        |FROM orders WHERE NOT (o_totalprice < 50000.0)""".stripMargin,
    "k32_optimize" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice * 1.1
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderpriority
        |FROM orders""".stripMargin,
    "k33_generated" ->
      """WITH ev AS (
        |  SELECT event_id, ts, event_type, value,
        |         strftime(ts, '%Y-%m-%d') AS ts_day
        |  FROM events),
        |busy AS (
        |  SELECT ts_day FROM ev GROUP BY 1
        |  ORDER BY COUNT(*) DESC, ts_day ASC LIMIT 1),
        |keep AS (
        |  SELECT event_id, ts_day, event_type, value FROM ev
        |  WHERE ts_day <> (SELECT ts_day FROM busy)),
        |roll AS (
        |  SELECT MIN(event_id) AS event_id,
        |         strftime(MIN(ts), '%Y-%m-%d') AS ts_day, event_type,
        |         CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 2) AS DOUBLE) AS value
        |  FROM ev WHERE ts_day = (SELECT ts_day FROM busy)
        |  GROUP BY event_type)
        |SELECT event_id, ts_day, event_type, value FROM keep
        |UNION ALL
        |SELECT event_id, ts_day, event_type, value FROM roll""".stripMargin,
    "k34_bucket_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${OracleMath.dsumSql("l_extendedprice", 4, 2)} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY 1""".stripMargin,
    "k37_dv_bucket_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${OracleMath.dsumSql("l_extendedprice", 4, 2)} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey % 7 <> 2 AND l_orderkey % 10 <> 3
         |GROUP BY 1""".stripMargin,
    "k43_clone_native" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${OracleMath.dsumSql("l_extendedprice", 4, 2)} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE NOT (o_orderkey % 5 = 1)
         |GROUP BY 1""".stripMargin,
    "k44_compat_bucket" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${OracleMath.dsumSql("l_extendedprice", 4, 2)} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY 1""".stripMargin,
    "k35_spec_evolution" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS ts_day,
        |       strftime(ts, '%Y-%m') AS ts_month, event_type, value
        |FROM events WHERE event_id % 7 = 0""".stripMargin,
    "k36_cdf_by_name" ->
      """SELECT o_orderkey, o_totalprice,
        |       'insert' AS change_type, CAST(3 AS BIGINT) AS commit_version
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'update_preimage', 4
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 1000.0, 'update_postimage', 4
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey,
        |       CASE WHEN o_orderpriority = '1-URGENT'
        |            THEN o_totalprice + 1000.0 ELSE o_totalprice END,
        |       'delete', 5
        |FROM orders
        |WHERE CASE WHEN o_orderpriority = '1-URGENT'
        |           THEN o_totalprice + 1000.0 ELSE o_totalprice END < 30000.0""".stripMargin,
    "k38_agg_pushdown" ->
      """WITH g AS (
        |  SELECT o_orderpriority, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
        |         MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
        |         MAX(o_orderdate) AS mx_date,
        |         MIN(o_orderstatus) AS mn_status, MAX(o_orderstatus) AS mx_status
        |  FROM orders GROUP BY 1),
        |a AS (
        |  SELECT MAX(o_orderkey) AS mx_after, COUNT(*) AS n_after,
        |         MAX(o_orderstatus) AS mx_status_after
        |  FROM orders
        |  WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 13 = 5))
        |SELECT g.*, a.* FROM g CROSS JOIN a""".stripMargin,
    "k39_topn_pruned" ->
      """SELECT o_orderkey, o_totalprice, CAST(100 AS BIGINT) AS n_limited
        |FROM orders ORDER BY o_orderkey DESC LIMIT 50""".stripMargin,
    "k42_multikey_bucket" ->
      s"""SELECT li.l_linestatus, COUNT(*) AS n_pairs,
         |  ${OracleMath.dsumSql("li.l_extendedprice", 4, 2)} AS revenue,
         |  ${OracleMath.dsumSql("r.l_quantity", 4, 2)} AS ret_qty
         |FROM lineitem li
         |JOIN (SELECT l_partkey, l_suppkey, CAST(l_quantity AS DOUBLE) AS l_quantity
         |      FROM lineitem WHERE l_returnflag = 'R') r
         |  ON li.l_partkey = r.l_partkey AND li.l_suppkey = r.l_suppkey
         |GROUP BY li.l_linestatus""".stripMargin,
    "k41_rename_native" ->
      s"""WITH j AS (
         |  SELECT o.o_orderpriority AS priority, COUNT(*) AS n_items,
         |    ${OracleMath.dsumSql("l.l_extendedprice", 4, 2)} AS revenue
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1),
         |e AS (
         |  SELECT o_orderpriority AS priority, COUNT(*) AS n_era
         |  FROM orders GROUP BY 1)
         |SELECT j.priority, j.n_items, j.revenue, e.n_era
         |FROM j JOIN e ON j.priority = e.priority""".stripMargin,
    "k40_replace_where" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
        |  o_orderpriority
        |FROM orders""".stripMargin,
    "k45_typed_partition" ->
      """WITH base AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS day,
        |         CAST(user_id % 4 AS INT) AS b4
        |  FROM events),
        |g AS (SELECT day, COUNT(*) AS n_day FROM base
        |      WHERE b4 IN (0, 3) GROUP BY day),
        |eq AS (SELECT COUNT(*) AS n_eq, MIN(event_id) AS mn_id,
        |              MAX(event_id) AS mx_id
        |       FROM base WHERE day = DATE '2024-01-05'),
        |r AS (SELECT COUNT(*) AS n_range FROM base
        |      WHERE day >= DATE '2024-01-10' AND day < DATE '2024-01-20'
        |        AND b4 = 2),
        |a AS (SELECT COUNT(*) AS n_after FROM base
        |      WHERE day <> DATE '2024-01-01')
        |SELECT g.day, g.n_day, eq.n_eq, eq.mn_id, eq.mx_id, r.n_range,
        |       a.n_after
        |FROM g CROSS JOIN eq CROSS JOIN r CROSS JOIN a""".stripMargin
  )
}

/** DuckDB replication of the sentiment lexicon, generated from the same
  * Map so the two implementations cannot drift. */
object SentimentOracle {
  private val cases = graft.functions.Sentiment.lexicon
    .toSeq.sortBy(_._1)
    .map { case (w, v) => s"WHEN '$w' THEN $v" }
    .mkString(" ")

  val polaritySql: String =
    s"""(CASE WHEN len(toks) > 0
       |  THEN list_sum(list_transform(toks,
       |         t -> CASE t $cases ELSE 0.0 END)) / (len(toks) * 4.0)
       |  ELSE 0.0 END)""".stripMargin

  val dailySql: String =
    s"""WITH tokenized AS (
       |  SELECT lang, source,
       |    list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
       |                x -> len(x) > 0) AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT lang, source, $polaritySql AS polarity FROM tokenized)
       |SELECT lang, source,
       |  ROUND(CAST(SUM(CAST(polarity AS DECIMAL(27,9))) AS DOUBLE) / COUNT(polarity), 6) AS polarity_mean,
       |  COUNT(*) AS n_docs
       |FROM scored GROUP BY 1, 2""".stripMargin
}

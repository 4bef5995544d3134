package graft

import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** DSv2 aggregate pushdown on graft_lake catalog tables: MIN / MAX /
  * COUNT answered from the manifest's per-file footer stats — ZERO data
  * files read when every file is answerable ("complete"), only the
  * stat-less/DV'd remainder read when not ("partial"). Every pinned
  * plan is paired with a value check against the same query computed
  * with pushdown disabled. */
class AggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def ns(): String = "agg_" + UUID.randomUUID().toString.take(8)

  private def leafOf(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")

  /** Rows of `sql`, with aggregate pushdown ON, and the plan leaf. */
  private def run(sql: String): (Seq[org.apache.spark.sql.Row], String) = {
    val df = spark.sql(sql)
    (df.collect().toSeq, leafOf(df))
  }

  /** The same rows computed through the normal scan (pushdown off). */
  private def oracle(sql: String): Seq[org.apache.spark.sql.Row] = {
    spark.conf.set("spark.graft.aggPushdown.enabled", "false")
    try spark.sql(sql).collect().toSeq
    finally spark.conf.unset("spark.graft.aggPushdown.enabled")
  }

  test("MIN/MAX/COUNT answer complete from metadata — zero files read") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, d DATE, ts TIMESTAMP, " +
      "s STRING, x DOUBLE)")
    Seq.tabulate(500)(i => (i.toLong, java.sql.Date.valueOf("2026-01-01").toLocalDate
        .plusDays(i % 90).toString, s"2026-02-0${1 + i % 9} 12:0${i % 6}:00",
        if (i % 7 == 0) null else s"s$i", i * 1.5))
      .toDF("k", "d", "ts", "s", "x")
      .select(col("k"), col("d").cast("date"), col("ts").cast("timestamp"),
        col("s"), col("x"))
      .repartition(4).createOrReplaceTempView("agg_src")
    spark.sql(s"CREATE TABLE graft_lake.$n.t2 AS SELECT * FROM agg_src")
    // min(s)/max(s): STRING extremes answer from metadata too — the
    // commit-time exactness marker proves the recorded bounds are the
    // exact values (engine-written footers, untruncated)
    val q = s"SELECT max(ts) AS mx_ts, min(ts) AS mn_ts, min(k) AS mn_k, " +
      s"max(d) AS mx_d, count(s) AS n_s, count(*) AS n, " +
      s"min(s) AS mn_s, max(s) AS mx_s FROM graft_lake.$n.t2"
    val (rows, leaf) = run(q)
    assert(leaf.contains("agg-pushdown") && leaf.contains("complete"),
      s"expected complete metadata aggregate, got:\n$leaf")
    assert(rows == oracle(q))
    assert(rows.head.getString(6) == "s1" && rows.head.getString(7) == "s99")
    // a WHERE clause disables pushdown (filters must see rows)
    val (rowsW, leafW) = run(
      s"SELECT max(k) AS mx FROM graft_lake.$n.t2 WHERE k < 100")
    assert(!leafW.contains("agg-pushdown"))
    assert(rowsW.head.getLong(0) == 99L)
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP TABLE graft_lake.$n.t2")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("GROUP BY a partition column answers complete from directory values") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.p (k BIGINT, x BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    Seq.tabulate(300)(i => (i.toLong, i.toLong * 3,
        if (i % 11 == 0) null else s"c${i % 3}"))
      .toDF("k", "x", "cat").createOrReplaceTempView("agg_psrc")
    spark.sql(s"INSERT INTO graft_lake.$n.p SELECT * FROM agg_psrc")
    val q = s"SELECT cat, count(*) AS cnt, count(cat) AS n_cat, " +
      s"min(k) AS mn, max(x) AS mx FROM graft_lake.$n.p GROUP BY cat"
    val (rows, leaf) = run(q)
    assert(leaf.contains("agg-pushdown") && leaf.contains("complete"),
      s"expected complete grouped metadata aggregate, got:\n$leaf")
    val sortKey = (r: org.apache.spark.sql.Row) => Option(r.getString(0)).getOrElse("")
    assert(rows.sortBy(sortKey) == oracle(q).sortBy(sortKey))
    // null-partition rows: count(cat) excludes them, count(*) keeps them
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) > 0L && nullRow.getLong(2) == 0L)
    spark.sql(s"DROP TABLE graft_lake.$n.p")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("deletion vectors degrade to PARTIAL pushdown: only DV'd files re-read") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    Seq.tabulate(400)(i => (i.toLong, if (i % 5 == 0) null else s"v$i"))
      .toDF("k", "v").repartition(4).createOrReplaceTempView("agg_dsrc")
    spark.sql(s"CREATE TABLE graft_lake.$n.d AS SELECT * FROM agg_dsrc")
    val root = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(n), "d"))
      .properties().get("location")
    // a targeted MoR delete: the max row (k=399) dies, so a stats-only
    // answer would be WRONG — the partial fold must re-read DV'd files
    ManifestTable.deleteMoR(spark, root, col("k") >= 390 || col("k") % 97 === 3)
    val q = s"SELECT max(k) AS mx, min(k) AS mn, count(v) AS nv, " +
      s"count(*) AS n FROM graft_lake.$n.d"
    val (rows, leaf) = run(q)
    assert(leaf.contains("agg-pushdown") && leaf.contains("partial"),
      s"expected partial pushdown under deletion vectors, got:\n$leaf")
    assert(rows == oracle(q))
    assert(rows.head.getLong(0) == 389L) // the deleted max is gone
    spark.sql(s"DROP TABLE graft_lake.$n.d")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("unservable shapes decline: float/double MIN/MAX, unmarked string bounds, renamed tables") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    Seq.tabulate(50)(i => (i.toLong, i * 1.5, s"s$i")).toDF("k", "x", "s")
      .createOrReplaceTempView("agg_usrc")
    spark.sql(s"CREATE TABLE graft_lake.$n.u AS SELECT * FROM agg_usrc")
    // double MIN/MAX: NaN ordering makes writer stats untrustworthy
    val (rx, lx) = run(s"SELECT max(x) AS mx FROM graft_lake.$n.u")
    assert(!lx.contains("agg-pushdown"), s"double max must not push:\n$lx")
    assert(rx.head.getDouble(0) == 49 * 1.5)
    // string MIN/MAX pushes on engine-written files (exactness marker);
    // a LEGACY file whose stats lack the marker (pre-flag 6-part spec —
    // simulated by stripping `exact` off the builder-resolved state)
    // falls to the scanned remainder: the fold goes PARTIAL, never a
    // stats-as-answer guess. Non-string aggregates are unaffected — the
    // integral kinds never needed the marker.
    val (rs, ls) = run(s"SELECT min(s) AS mn FROM graft_lake.$n.u")
    assert(ls.contains("agg-pushdown") && ls.contains("complete"),
      s"marked string min should answer from metadata:\n$ls")
    assert(rs.head.getString(0) == "s0")
    val root = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(n), "u"))
      .properties().get("location")
    val st = ManifestTable.current(spark, root).get
    val legacy = st.copy(files = st.files.map(f =>
      f.copy(stats = f.stats.view.mapValues(_.copy(exact = false)).toMap)))
    val schema = spark.table(s"graft_lake.$n.u").schema
    import org.apache.spark.sql.connector.expressions.{Expressions => E}
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Min, Max}
    val strAgg = new Aggregation(
      Array(new Min(E.column("s")), new Max(E.column("s"))), Array.empty)
    val planned = graft.sources.v2.GraftAggScan.plan(
      root, legacy, schema, Array.empty, strAgg)
    assert(planned.exists(p => !p.complete && p.scanFiles.nonEmpty),
      s"unmarked string bounds must fold by scanning, got $planned")
    val intAgg = new Aggregation(
      Array(new Min(E.column("k")), new Max(E.column("k"))), Array.empty)
    assert(graft.sources.v2.GraftAggScan.plan(
      root, legacy, schema, Array.empty, intAgg).exists(_.complete))
    // COUNT(*) still pushes on the same table
    val (_, lc) = run(s"SELECT count(*) AS n FROM graft_lake.$n.u")
    assert(lc.contains("agg-pushdown"))
    // a renamed column rides the rename map: stats keys are physical,
    // the answer reports under the logical name — still metadata-only
    spark.sql(s"ALTER TABLE graft_lake.$n.u RENAME COLUMN k TO kk")
    val (rr, lr) = run(s"SELECT max(kk) AS mx, count(*) AS n FROM graft_lake.$n.u")
    assert(lr.contains("agg-pushdown") && lr.contains("complete"),
      s"renamed table should still answer from metadata:\n$lr")
    assert(rr.head.getLong(0) == 49L && rr.head.getLong(1) == 50L)
    // and the PARTIAL path reads the remainder under physical names: a
    // renamed string column folds by scanning when its marker is gone
    val st2 = ManifestTable.current(spark, root).get
    val legacy2 = st2.copy(files = st2.files.map(f =>
      f.copy(stats = f.stats.view.mapValues(_.copy(exact = false)).toMap)))
    import org.apache.spark.sql.connector.expressions.{Expressions => E2}
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation => Agg2, Max => Max2}
    val renamedAgg = new Agg2(Array(new Max2(E2.column("kk"))), Array.empty)
    val planned2 = graft.sources.v2.GraftAggScan.plan(
      root, legacy2, spark.table(s"graft_lake.$n.u").schema, Array.empty, renamedAgg)
    assert(planned2.exists(_.complete), "integral max under rename stays metadata")
    spark.sql(s"DROP TABLE graft_lake.$n.u")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("PARTIAL pushdown on a shallow clone resolves inherited files at their source roots") {
    // the r17 review catch: the metadata fold needs no paths, but a
    // clone's MoR delete makes the DV'd INHERITED file unanswerable —
    // partial mode must open its bytes under the SOURCE root, not the
    // clone's (where only the deletion vector lives).
    val n = ns()
    val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse"
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.src (k BIGINT, x DOUBLE)")
    spark.sql(s"INSERT INTO graft_lake.$n.src SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 1000)")
    spark.sql(s"GRAFT CLONE graft_lake.$n.src TO graft_lake.$n.c")
    spark.sql(s"GRAFT DELETE MOR FROM graft_lake.$n.c WHERE k >= 990")
    try {
      val q = s"SELECT min(k) AS mn, max(k) AS mx, count(*) AS cnt " +
        s"FROM graft_lake.$n.c"
      val (rows, leaf) = run(q)
      assert(leaf.contains("partial"),
        s"a DV'd inherited file must force the partial fold:\n$leaf")
      assert(rows == oracle(q))
      assert(rows.head.getLong(2) == 990L)
    } finally {
      spark.sql(s"DROP TABLE graft_lake.$n.c")
      spark.sql(s"DROP TABLE graft_lake.$n.src")
      spark.sql(s"DROP NAMESPACE graft_lake.$n")
    }
  }

  test("empty table answers (count = 0, min/max = null) complete") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.e (k BIGINT, v STRING)")
    val q = s"SELECT count(*) AS n, count(v) AS nv, max(k) AS mx " +
      s"FROM graft_lake.$n.e"
    val (rows, leaf) = run(q)
    assert(leaf.contains("agg-pushdown") && leaf.contains("complete"),
      s"empty table should answer from metadata, got:\n$leaf")
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 0L &&
      rows.head.isNullAt(2))
    spark.sql(s"DROP TABLE graft_lake.$n.e")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("a WHERE of exact partition predicates keeps aggregates metadata-only") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.f (k BIGINT, x BIGINT, day STRING, " +
      "cat STRING) PARTITIONED BY (day, cat)")
    Seq.tabulate(400)(i => (i.toLong, i.toLong * 7,
        s"2026-01-0${1 + i % 3}", if (i % 13 == 0) null else s"c${i % 2}"))
      .toDF("k", "x", "day", "cat").createOrReplaceTempView("agg_fsrc")
    spark.sql(s"INSERT INTO graft_lake.$n.f SELECT * FROM agg_fsrc")
    // the filtered 100 TB count: the string-equality partition predicate
    // is consumed ENTIRELY by the exact file prune, so Spark still
    // offers the aggregate and it answers from metadata — zero files
    for (q <- Seq(
      s"SELECT count(*) AS n, min(k) AS mn, max(x) AS mx " +
        s"FROM graft_lake.$n.f WHERE day = '2026-01-02'",
      s"SELECT count(*) AS n, min(k) AS mn, max(x) AS mx " +
        s"FROM graft_lake.$n.f WHERE day IN ('2026-01-01', '2026-01-03') " +
        s"AND cat = 'c1'",
      s"SELECT count(*) AS n, min(k) AS mn, max(x) AS mx " +
        s"FROM graft_lake.$n.f WHERE cat IS NULL",
      s"SELECT count(*) AS n, min(k) AS mn, max(x) AS mx " +
        s"FROM graft_lake.$n.f WHERE day LIKE '2026%' AND cat IS NOT NULL",
      // grouped + filtered, still metadata
      s"SELECT day, count(*) AS n FROM graft_lake.$n.f " +
        s"WHERE cat = 'c0' GROUP BY day")) {
      val (rows, leaf) = run(q)
      assert(leaf.contains("agg-pushdown") && leaf.contains("complete"),
        s"filtered aggregate should stay metadata-only for [$q], got:\n$leaf")
      assert(rows.toSet == oracle(q).toSet, s"value mismatch for [$q]")
    }
    // a data-column predicate keeps the normal scan (rows must be seen)
    val (rowsD, leafD) = run(
      s"SELECT count(*) AS n FROM graft_lake.$n.f WHERE x > 70")
    assert(!leafD.contains("agg-pushdown"))
    assert(rowsD == oracle(s"SELECT count(*) AS n FROM graft_lake.$n.f WHERE x > 70"))
    // an empty partition selection answers (0, null, null)
    val (rowsE, leafE) = run(s"SELECT count(*) AS n, max(k) AS mx " +
      s"FROM graft_lake.$n.f WHERE day = '1999-12-31'")
    assert(leafE.contains("agg-pushdown"))
    assert(rowsE.head.getLong(0) == 0L && rowsE.head.isNullAt(1))
    spark.sql(s"DROP TABLE graft_lake.$n.f")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("exactly-consumed partition predicates drop the post-scan Filter") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.s (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    Seq.tabulate(300)(i => (i.toLong, s"2026-02-0${1 + i % 4}"))
      .toDF("k", "day").createOrReplaceTempView("agg_ssrc")
    spark.sql(s"INSERT INTO graft_lake.$n.s SELECT * FROM agg_ssrc")
    val q = spark.sql(s"SELECT k, day FROM graft_lake.$n.s WHERE day = '2026-02-03'")
    val plan = q.queryExecution.executedPlan.toString
    // the day-equality is fully consumed by the exact file prune: no
    // Filter node survives above the scan
    assert(!plan.contains("Filter ("),
      s"exact partition predicate must not re-filter rows:\n$plan")
    assert(q.collect().forall(_.getString(1) == "2026-02-03"))
    assert(q.count() == 75)
    // mixed predicates: only the data-column half survives as a Filter
    val m = spark.sql(
      s"SELECT k FROM graft_lake.$n.s WHERE day = '2026-02-03' AND k < 50")
    assert(m.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 50L).filter(i => 1 + i % 4 == 3))
    spark.sql(s"DROP TABLE graft_lake.$n.s")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("LIMIT pushdown bounds the files opened from manifest row counts") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.l (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    // four commits → four files of 100 known rows each
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft_lake.$n.l " +
        s"SELECT id, '2026-03-0${i + 1}' FROM range(${i * 100}, ${i * 100 + 100})"))
    val q = spark.sql(s"SELECT k, day FROM graft_lake.$n.l LIMIT 150")
    val rows = q.collect()
    assert(rows.length == 150)
    val plan = q.queryExecution.executedPlan
    val leaf = plan.collectLeaves().map(_.toString).mkString("\n")
    assert(leaf.contains("limit(150)"),
      s"expected the pushed limit on the native scan:\n$leaf")
    // the scan planned a two-file prefix (2 x 100 rows covers 150): the
    // source emits at most 200 rows no matter what the executor reads
    val scanRows = plan.collectLeaves().flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
    assert(scanRows <= 200,
      s"limit must bound the opened files (got $scanRows source rows)")
    // composed with an exactly-consumed partition predicate: still
    // pushed, still correct
    val f = spark.sql(s"SELECT k FROM graft_lake.$n.l " +
      s"WHERE day = '2026-03-03' LIMIT 5")
    assert(f.collect().forall(r => r.getLong(0) >= 200 && r.getLong(0) < 300))
    assert(f.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString.contains("limit(5)"))
    spark.sql(s"DROP TABLE graft_lake.$n.l")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("TopN pushdown prunes to the files that can hold a top-n row") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, v STRING)")
    // four commits of contiguous k ranges → clustered-by-construction
    // files with disjoint [min, max]; the FIRST range also carries nulls
    spark.sql(s"INSERT INTO graft_lake.$n.t " +
      "SELECT CASE WHEN id % 10 = 7 THEN NULL ELSE id END, concat('v', id) " +
      "FROM range(0, 100)")
    (1 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft_lake.$n.t " +
        s"SELECT id, concat('v', id) FROM range(${i * 100}, ${i * 100 + 100})"))
    // DESC: only the top file's range can reach the top-5
    val d = spark.sql(s"SELECT k, v FROM graft_lake.$n.t ORDER BY k DESC LIMIT 5")
    val rows = d.collect()
    assert(rows.map(_.getLong(0)).toSeq == (395L to 399L).reverse)
    val plan = d.queryExecution.executedPlan
    assert(plan.collectLeaves().map(_.toString).mkString.contains("topn(k desc, 5)"),
      s"expected the pushed TopN on the scan:\n${plan.toString}")
    val scanRows = plan.collectLeaves().flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
    assert(scanRows <= 100,
      s"top-5 desc should open only the top file (got $scanRows source rows)")
    // ASC with NULLS FIRST (the default): nulls order first, so the
    // null-bearing file must be kept and the answer is the null rows
    val a = spark.sql(s"SELECT k FROM graft_lake.$n.t ORDER BY k LIMIT 12")
    val ka = a.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(ka.count(_ == -1L) == 10 && ka.filter(_ >= 0).sorted == Seq(0L, 1L))
    // value parity with the scan disabled (V1 path, no pruning)
    val ref = withConf(graft.sources.v2.GraftBatchScan.EnabledKey -> "false") {
      spark.sql(s"SELECT k, v FROM graft_lake.$n.t ORDER BY k DESC LIMIT 5")
        .collect().toSeq
    }
    assert(rows.toSeq == ref)
    // STRING sort keys prune too: bounds are valid bounds even under a
    // truncating writer (the cutoff proof needs bounds, not values —
    // unlike MIN/MAX answers). `s` is zero-padded so string order =
    // insertion order and the per-commit [min, max] ranges are disjoint.
    spark.sql(s"CREATE TABLE graft_lake.$n.s (s STRING, k BIGINT)")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft_lake.$n.s " +
        s"SELECT concat('id_', lpad(CAST(id AS STRING), 4, '0')), id " +
        s"FROM range(${i * 100}, ${i * 100 + 100})"))
    val sd = spark.sql(s"SELECT s FROM graft_lake.$n.s ORDER BY s DESC LIMIT 5")
    assert(sd.collect().map(_.getString(0)).toSeq ==
      (395 to 399).reverse.map(i => f"id_$i%04d"))
    val sPlan = sd.queryExecution.executedPlan
    assert(sPlan.collectLeaves().map(_.toString).mkString.contains("topn(s desc, 5)"),
      s"expected the pushed string TopN on the scan:\n${sPlan.toString}")
    val sScanRows = sPlan.collectLeaves().flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
    assert(sScanRows <= 100,
      s"string top-5 desc should open only the top file (got $sScanRows source rows)")
    spark.sql(s"DROP TABLE graft_lake.$n.s")
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("typed identity-partition literals are consumed exactly: DATE/INT predicates, agg under WHERE, typed GROUP BY") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.t (k BIGINT, x BIGINT, " +
      "day DATE, hr INT) PARTITIONED BY (day, hr)")
    Seq.tabulate(400)(i => (i.toLong, i.toLong * 3,
        java.sql.Date.valueOf("2026-01-01").toLocalDate.plusDays(i % 3).toString,
        i % 4))
      .toDF("k", "x", "day", "hr")
      .select(col("k"), col("x"), col("day").cast("date"), col("hr").cast("int"))
      .createOrReplaceTempView("agg_tsrc")
    spark.sql(s"INSERT INTO graft_lake.$n.t SELECT * FROM agg_tsrc")
    // the DECLARED types read back (the r18 state read them as STRING)
    val sch = spark.table(s"graft_lake.$n.t").schema
    assert(sch("day").dataType == org.apache.spark.sql.types.DateType &&
      sch("hr").dataType == org.apache.spark.sql.types.IntegerType,
      s"typed layout columns must read back declared: $sch")
    // the 100 TB shape this exists for: count(*) under a typed WHERE is
    // a zero-file metadata fold, exactly like its string-typed twin
    for (q <- Seq(
      s"SELECT count(*) AS n, min(k) AS mn, max(x) AS mx " +
        s"FROM graft_lake.$n.t WHERE day = DATE'2026-01-02'",
      s"SELECT count(*) AS n, min(k) AS mn FROM graft_lake.$n.t " +
        s"WHERE day >= DATE'2026-01-02' AND day < DATE'2026-01-03' AND hr = 2",
      s"SELECT count(*) AS n FROM graft_lake.$n.t " +
        s"WHERE day IN (DATE'2026-01-01', DATE'2026-01-03') AND hr IN (0, 3)",
      s"SELECT count(*) AS n FROM graft_lake.$n.t WHERE day IS NOT NULL",
      // typed GROUP BY: the group key surfaces as a real DATE
      s"SELECT day, count(*) AS n, max(k) AS mx FROM graft_lake.$n.t " +
        s"WHERE hr = 1 GROUP BY day")) {
      val (rows, leaf) = run(q)
      assert(leaf.contains("agg-pushdown") && leaf.contains("complete"),
        s"typed-filtered aggregate should stay metadata-only for [$q], got:\n$leaf")
      assert(rows.toSet == oracle(q).toSet, s"value mismatch for [$q]")
    }
    val g = spark.sql(s"SELECT day, count(*) AS n FROM graft_lake.$n.t GROUP BY day")
    assert(g.schema("day").dataType == org.apache.spark.sql.types.DateType)
    // exactly-consumed typed predicates drop the post-scan Filter on a
    // plain row read too
    val r = spark.sql(s"SELECT k, day, hr FROM graft_lake.$n.t " +
      s"WHERE day = DATE'2026-01-02' AND hr = 2")
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("),
      s"typed partition predicates must not re-filter rows:\n$plan")
    assert(r.collect().forall(row =>
      row.getDate(1).toString == "2026-01-02" && row.getInt(2) == 2))
    // composition with LIMIT pushdown survives typed consumption
    val l = spark.sql(s"SELECT k FROM graft_lake.$n.t " +
      s"WHERE day = DATE'2026-01-03' LIMIT 5")
    assert(l.collect().length == 5)
    assert(l.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString.contains("limit(5)"))
    // typed DELETE routes through the exact conversion; re-reads agree
    spark.sql(s"DELETE FROM graft_lake.$n.t WHERE day = DATE'2026-01-01'")
    val (afterRows, afterLeaf) = run(
      s"SELECT count(*) AS n FROM graft_lake.$n.t")
    assert(afterLeaf.contains("agg-pushdown"))
    assert(afterRows.head.getLong(0) ==
      400L - Seq.tabulate(400)(identity).count(_ % 3 == 0))
    // INSERT OVERWRITE is a full rewrite: the typed declaration
    // RE-DERIVES from the incoming (typed) frame — read-back must stay
    // DATE/INT, and typed consumption must survive the overwrite
    spark.sql(s"INSERT OVERWRITE graft_lake.$n.t SELECT * FROM agg_tsrc")
    val schO = spark.table(s"graft_lake.$n.t").schema
    assert(schO("day").dataType == org.apache.spark.sql.types.DateType &&
      schO("hr").dataType == org.apache.spark.sql.types.IntegerType,
      s"overwrite must not flip typed layout columns to string: $schO")
    val (oRows, oLeaf) = run(s"SELECT count(*) AS n FROM graft_lake.$n.t " +
      s"WHERE day = DATE'2026-01-02'")
    assert(oLeaf.contains("agg-pushdown") && oLeaf.contains("complete"))
    assert(oRows.head.getLong(0) ==
      Seq.tabulate(400)(identity).count(_ % 3 == 1))
    spark.sql(s"DROP TABLE graft_lake.$n.t")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("typed-partition refusals are pinned: TIMESTAMP stays string, non-canonical encodings decline") {
    // TIMESTAMP: directory encodings escape ':' and vary by zone — the
    // round-trip can't be proven, so the declaration keeps the engine's
    // string-pinned read-back (advisory prune + re-filter, never a
    // wrong answer)
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.ts (k BIGINT, t TIMESTAMP) " +
      "PARTITIONED BY (t)")
    spark.sql(s"INSERT INTO graft_lake.$n.ts " +
      "SELECT id, TIMESTAMP'2026-01-01 07:00:00' + make_interval(0,0,0,0,CAST(id % 3 AS INT),0,0) " +
      "FROM range(0, 30)")
    val sch = spark.table(s"graft_lake.$n.ts").schema
    assert(sch("t").dataType == org.apache.spark.sql.types.StringType,
      s"timestamp partition must keep the string-pinned read-back: $sch")
    val q = spark.sql(s"SELECT count(*) AS n FROM graft_lake.$n.ts " +
      "WHERE t = '2026-01-01 08:00:00'")
    assert(q.head().getLong(0) == 10L)
    // canonical-rendering proof: the unit surface the consumption and
    // the native scan both gate on
    import org.apache.spark.sql.types._
    import graft.sources.PartitionTypes
    assert(PartitionTypes.canonical("7", IntegerType).contains(7))
    assert(PartitionTypes.canonical("07", IntegerType).isEmpty)   // pad
    assert(PartitionTypes.canonical(" 7", IntegerType).isEmpty)   // trim
    assert(PartitionTypes.canonical("7.0", IntegerType).isEmpty)  // cast-only
    assert(PartitionTypes.canonical("-5", LongType).contains(-5L))
    assert(PartitionTypes.canonical("2026-01-02", DateType)
      .contains(java.time.LocalDate.parse("2026-01-02").toEpochDay.toInt))
    assert(PartitionTypes.canonical("2026-1-2", DateType).isEmpty)
    assert(PartitionTypes.canonical("x", DateType).isEmpty)
    assert(PartitionTypes.canonical("2026-01-02", TimestampType).isEmpty)
    // a canonically-RENDERED far-future date whose epoch day overflows
    // Int must DECLINE (advisory path), never throw from scan planning
    assert(PartitionTypes.canonical("+999999999-12-31", DateType).isEmpty)
    // advisory IS NULL pruning under a typed declaration: a
    // non-canonical directory value reads back NULL via the typed cast,
    // so the prune must KEEP that file (no residual can resurrect a
    // pruned file); the string-pinned read keeps only the null dir
    locally {
      import graft.sources.{DataSkipping, ManifestTable => MT}
      val fNonCanon = MT.FileEntry("g1/hr=01/p0.parquet", 1L)
      val fNullDir  = MT.FileEntry("g1/hr=__HIVE_DEFAULT_PARTITION__/p1.parquet", 1L)
      val fCanon    = MT.FileEntry("g1/hr=1/p2.parquet", 1L)
      val files = Seq(fNonCanon, fNullDir, fCanon)
      val typed = Map("hr" -> (IntegerType: DataType))
      assert(DataSkipping.prune(files, col("hr").isNull, typed)
        .map(_.relPath) == Seq(fNonCanon.relPath, fNullDir.relPath))
      assert(DataSkipping.prune(files, col("hr") <=> lit(null), typed)
        .map(_.relPath) == Seq(fNonCanon.relPath, fNullDir.relPath))
      assert(DataSkipping.prune(files, col("hr").isNull)
        .map(_.relPath) == Seq(fNullDir.relPath))
    }
    // a non-canonical directory value anywhere declines the NATIVE scan
    // for that column (the V1 bridge's cast semantics own the odd case)
    spark.sql(s"CREATE TABLE graft_lake.$n.c (k BIGINT, hr INT) " +
      "PARTITIONED BY (hr)")
    spark.sql(s"INSERT INTO graft_lake.$n.c SELECT id, CAST(id % 2 AS INT) " +
      "FROM range(0, 20)")
    val root = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(n), "c"))
      .properties().get("location")
    val st = graft.sources.ManifestTable.current(spark, root).get
    val forged = st.copy(files = st.files.map(f =>
      f.copy(relPath = f.relPath.replace("hr=1", "hr=01"))))
    val schema = spark.table(s"graft_lake.$n.c").schema
    val native = graft.sources.v2.GraftBatchScan.tryBuild(root, None, forged,
      Array.empty, schema, schema)
    assert(native.isEmpty,
      "a non-canonical typed partition value must decline the native scan")
    // the untampered state builds natively
    assert(graft.sources.v2.GraftBatchScan.tryBuild(root, None, st,
      Array.empty, schema, schema).nonEmpty)
    spark.sql(s"DROP TABLE graft_lake.$n.ts")
    spark.sql(s"DROP TABLE graft_lake.$n.c")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }

  test("time travel aggregates the PINNED version's metadata") {
    val n = ns()
    spark.sql(s"CREATE NAMESPACE graft_lake.$n")
    spark.sql(s"CREATE TABLE graft_lake.$n.v (k BIGINT)")
    spark.sql(s"INSERT INTO graft_lake.$n.v SELECT id FROM range(0, 100)")
    spark.sql(s"INSERT INTO graft_lake.$n.v SELECT id FROM range(100, 150)")
    val q = s"SELECT max(k) AS mx, count(*) AS n " +
      s"FROM graft_lake.$n.v VERSION AS OF 2"
    val (rows, leaf) = run(q)
    assert(leaf.contains("agg-pushdown") && leaf.contains("complete"))
    assert(rows.head.getLong(0) == 99L && rows.head.getLong(1) == 100L)
    spark.sql(s"DROP TABLE graft_lake.$n.v")
    spark.sql(s"DROP NAMESPACE graft_lake.$n")
  }
}

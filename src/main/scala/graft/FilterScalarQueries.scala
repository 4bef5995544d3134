package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.core.Tables
import graft.operators.Cleaners

/** F-class projections/filters/cleaners and the §2.9 scalar-function
  * surface, each as an oracle-checked query (SURVEY.md §2.3, §2.9).
  */
object FilterScalarQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_select" -> ((s, d) =>
      // F1: plain column projection (pruned at the parquet scan).
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),
    "f2_nested_json" -> ((s, d) => {
      // F2+S12-ish: semi-structured payload — parse the JSON props column,
      // project a nested field, aggregate on it.
      val schema = StructType(Seq(StructField("k", IntegerType)))
      t(s, d, "events")
        .withColumn("p", from_json(col("props"), schema))
        .groupBy(col("p.k").as("k"))
        .agg(count(lit(1)).as("n"))
    }),
    "f3_eq_filter" -> ((s, d) =>
      // F3: equality filter, pushed to the scan.
      t(s, d, "events").filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"))),
    "f4_neq_filter" -> ((s, d) =>
      // F4: inequality + negated set-membership.
      t(s, d, "orders")
        .filter(col("o_orderstatus") =!= "O" && !col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))),
    "f5_range_filter" -> ((s, d) =>
      // F5: half-open date interval (ref: events-api app.py:61-66).
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("date"), col("o_totalprice"))),
    "f6_isin_filter" -> ((s, d) =>
      // F6: set-membership + comparison (ref: stocksense page filter).
      t(s, d, "part")
        .filter(col("p_brand").isin("Brand#4", "Brand#2", "Brand#19") && col("p_size") > 20)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
    "f7_keyword_filter" -> ((s, d) =>
      // F7 (ref: gold_war_etl_dag.py:96-97): keyword predicate over text.
      t(s, d, "documents")
        .filter(Seq("vector", "stream", "merge").map(k => lower(col("text")).contains(k)).reduce(_ || _))
        .select(col("doc_id"), col("lang"), col("n_chars"))),
    "f8_trim_clean" -> ((s, d) =>
      // F8: trim + empty→null string cleaning over an inflated-whitespace col.
      Cleaners.trimStrings(
        t(s, d, "customer").select(
          col("c_custkey"),
          concat(lit("  "), col("c_name"), lit("  ")).as("c_name"),
          lit(" ").as("blank")))),
    "f9_required_fields" -> ((s, d) => {
      // F9: warn-and-drop required-field validation. The left join leaves
      // n_purchases null for (date,user) cells without purchases;
      // requireFields drops those records like the reference's validator.
      val daily = t(s, d, "events")
        .groupBy(to_date(col("ts")).as("date"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val purchases = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("date"), col("user_id"))
        .agg(count(lit(1)).as("n_purchases"))
      Cleaners.requireFields(daily.join(purchases, Seq("date", "user_id"), "left"), Seq("n_purchases"))
    }),
    "f13_rename" -> ((s, d) =>
      // F13: snake_case column normalization.
      Cleaners.normalizeColumnNames(
        t(s, d, "nation").select(col("n_nationkey").as("Nation Key"), col("n_name").as("Nation Name")))),
    "f14_enrich" -> ((s, d) =>
      // F14: enrichment metadata (injected clock for determinism).
      Cleaners.enrich(t(s, d, "region").select(col("r_regionkey"), col("r_name")),
        java.time.Instant.parse("2026-01-01T00:00:00Z"))),
    // §2.9 scalar-function batteries ---------------------------------------
    "sf_strings" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        col("p_name").contains("red").cast("int").as("has_red"))),
    "sf_dates" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("ymd"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(lit("2000-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_y2k"))),
    "sf_math" -> ((s, d) =>
      // guarded division, casts, conditional math (A4/F12 semantics).
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // raw IEEE double ops (no ROUND): bit-identical across engines,
        // unlike round-of-quotient whose half-up boundary differs
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        when(col("l_quantity") > 0,
          col("l_extendedprice") / col("l_quantity")).otherwise(lit(0.0)).as("unit_price"),
        ceil(col("l_quantity")).as("qty_ceil"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        (col("l_tax") > col("l_discount")).cast("int").as("tax_gt_disc"))),
    "sf_case_when" -> ((s, d) =>
      // CASE bucketing + conditional counts.
      t(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_bucket")))
  )

  val oracle: Map[String, String] = Map(
    "f1_select" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "f2_nested_json" ->
      """SELECT CAST(props->>'k' AS INT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "f3_eq_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'click'",
    "f4_neq_filter" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderstatus <> 'O'
        |  AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')""".stripMargin,
    "f5_range_filter" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS date, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "f6_isin_filter" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#4', 'Brand#2', 'Brand#19') AND p_size > 20""".stripMargin,
    "f7_keyword_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lower(text) LIKE '%vector%' OR lower(text) LIKE '%stream%'
        |   OR lower(text) LIKE '%merge%'""".stripMargin,
    "f8_trim_clean" ->
      """SELECT c_custkey,
        |  NULLIF(TRIM('  ' || c_name || '  '), '') AS c_name,
        |  NULLIF(TRIM(' '), '') AS blank
        |FROM customer""".stripMargin,
    "f9_required_fields" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS date, user_id, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT CAST(ts AS DATE) AS date, user_id, COUNT(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT daily.date, daily.user_id, n_events, n_purchases
        |FROM daily LEFT JOIN p ON daily.date = p.date AND daily.user_id = p.user_id
        |WHERE n_purchases IS NOT NULL""".stripMargin,
    "f13_rename" ->
      "SELECT n_nationkey AS nation_key, n_name AS nation_name FROM nation",
    "f14_enrich" ->
      """SELECT r_regionkey, r_name,
        |  (SELECT COUNT(*) FROM region) AS record_count,
        |  TIMESTAMP '2026-01-01 00:00:00' AS processed_at
        |FROM region""".stripMargin,
    "sf_strings" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_upper,
        |  SUBSTRING(p_name, 1, 5) AS name_prefix,
        |  REPLACE(p_name, ' ', '_') AS name_snake,
        |  p_brand || '|' || p_type AS brand_type,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(p_name LIKE '%red%' AS INT) AS has_red
        |FROM part""".stripMargin,
    "sf_dates" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |  strftime(o_orderdate, '%Y-%m-%d') AS ymd,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(DATE '2000-01-01' - CAST(o_orderdate AS DATE) AS INT) AS days_to_y2k
        |FROM orders""".stripMargin,
    "sf_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  CASE WHEN l_quantity > 0
        |       THEN l_extendedprice / l_quantity ELSE 0.0 END AS unit_price,
        |  CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
        |  ABS(l_discount - 0.05) AS disc_dev,
        |  CAST(l_tax > l_discount AS INT) AS tax_gt_disc
        |FROM lineitem""".stripMargin,
    "sf_case_when" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_bucket
        |FROM customer""".stripMargin
  )
}

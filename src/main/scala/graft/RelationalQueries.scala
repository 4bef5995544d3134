package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Cleaners, Dedup, Joins, Upsert, Windows}
import graft.OracleMath._

/** Typed-API row/result shapes for the Dataset[T] surface (top level so
  * Encoder derivation is stable). */
final case class PartRow(p_partkey: Long, p_name: String, p_brand: String,
                         p_type: String, p_size: Long, p_retailprice: Double)
final case class PartTypeStats(p_type: String, n_parts: Long,
                               total_retail: Double, max_size: Long)

/** Relational operator inventory (SURVEY.md §2.3-§2.8) exercised as
  * driver-checkable queries over the testdata star schema. Each query is
  * the public-API combinator applied to real tables; the oracle is
  * independent DuckDB SQL.
  */
object RelationalQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-class aggregations -------------------------------------------------
    "q1_agg" -> ((s, d) => {
      // TPC-H Q1 shape (pricing summary): the flagship agg (A2/A10 family).
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2, 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 4, 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6, 2).as("sum_disc_price"),
          davg(col("l_quantity"), 2, 6).as("avg_qty"),
          davg(col("l_discount"), 4, 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "a1_user_counts" -> ((s, d) =>
      // A1 (ref: lecture3/05_query_with_dates.py:33): events per (date,user).
      t(s, d, "events")
        .groupBy(to_date(col("ts")).as("date"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))),
    "a9_distinct" -> ((s, d) =>
      // A9/A10: distinct days + users + total value over events.
      t(s, d, "events").agg(
        countDistinct(to_date(col("ts"))).as("n_days"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value"), 6, 4).as("total_value"))),
    "a19_typed_agg" -> ((s, d) => {
      // the typed Dataset[T] surface: case-class rows, lambda filter,
      // groupByKey + mapGroups with compile-time field access. mapGroups
      // has no partial aggregation — the typed demo runs on a DIM table
      // (parts); fact-scale aggregation stays in the untyped combinators.
      // Decimal accumulation mirrors OracleMath (6-decimal values, exact
      // sum, round-at-2 while exact) so the oracle hash-matches.
      import s.implicits._
      t(s, d, "part").as[PartRow]
        .filter(_.p_size >= 10)
        .groupByKey(_.p_type)
        .mapGroups { (tpe, it) =>
          var n = 0L
          var total = BigDecimal(0)
          var maxSize = Long.MinValue
          it.foreach { p =>
            n += 1
            total += BigDecimal(p.p_retailprice)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
            maxSize = math.max(maxSize, p.p_size)
          }
          PartTypeStats(tpe, n,
            total.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, maxSize)
        }
        .toDF()
    }),
    // J-class joins --------------------------------------------------------
    "j5_join_agg" -> ((s, d) => {
      // J5 3-way join: revenue per nation; nation broadcast (dim table).
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
      val nation = t(s, d, "nation")
      orders
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice"), 4, 2).as("revenue"))
    }),
    "j1_left_join" -> ((s, d) => {
      // J1+F12 (ref: gold_war_etl_dag.py:148-150): left join + fillna(0).
      val daily = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(dsum(col("o_totalprice"), 4, 2).as("day_revenue"))
      val purchases = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n_purchases"))
      Joins.leftBroadcast(daily, purchases, Seq("date"))
        .na.fill(0L, Seq("n_purchases"))
    }),
    "j2_anti_join" -> ((s, d) => {
      // J2/U3: customers with no completed ('F') orders — left_anti as
      // set-difference of keys. Status filter guarantees a non-empty result.
      val cust = t(s, d, "customer")
      val fOrders = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      cust.join(fOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    // W-class windows ------------------------------------------------------
    "w1_top1_per_group" -> ((s, d) => {
      // W1 (ref: select_pageview_counts.sql:7-11): busiest hour per
      // event_type; rank on exact integer count, hour as tiebreak.
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      Windows.topOnePerGroup(hourly, Seq("event_type"), Seq(col("n").desc, col("hr").asc))
    }),
    "w2_lead" -> ((s, d) => {
      // W2 (ref: gold_war_etl_dag.py:144-145): next-day value + up/down
      // target — the reference's single bounded daily series (global window).
      val daily = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(dsum(col("o_totalprice"), 4, 2).as("close"))
      Windows.leadShift(daily, Nil, col("date"), col("close"), 1, "close_next")
        .withColumn("target", (col("close_next") > col("close")).cast("int"))
        .na.drop(Seq("close_next"))
    }),
    "w2_lead_by_key" -> ((s, d) => {
      // W2 at scale: the multi-series form — one daily close series PER
      // order priority, each shifted independently (partitioned window,
      // parallel, no single-reducer sort).
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("date"))
        .agg(dsum(col("o_totalprice"), 4, 2).as("close"))
      Windows.leadShift(daily, Seq("priority"), col("date"), col("close"), 1, "close_next")
        .withColumn("target", (col("close_next") > col("close")).cast("int"))
        .na.drop(Seq("close_next"))
    })
  )

  val oracle: Map[String, String] = Map(
    "a19_typed_agg" ->
      s"""SELECT p_type, COUNT(*) AS n_parts,
         |  ${dsumSql("p_retailprice", 6, 2)} AS total_retail,
         |  CAST(MAX(p_size) AS BIGINT) AS max_size
         |FROM part WHERE p_size >= 10 GROUP BY 1""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity", 2, 2)} AS sum_qty,
         |  ${dsumSql("l_extendedprice", 4, 2)} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6, 2)} AS sum_disc_price,
         |  ${davgSql("l_quantity", 2, 6)} AS avg_qty,
         |  ${davgSql("l_discount", 4, 6)} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a1_user_counts" ->
      """SELECT CAST(ts AS DATE) AS date, user_id, COUNT(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a9_distinct" ->
      s"""SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${dsumSql("value", 6, 4)} AS total_value
         |FROM events""".stripMargin,
    "j5_join_agg" ->
      s"""SELECT n_name, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice", 4, 2)} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,
    "j1_left_join" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS date,
         |         ${dsumSql("o_totalprice", 4, 2)} AS day_revenue
         |  FROM orders GROUP BY 1),
         |p AS (
         |  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n_purchases
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT daily.date, day_revenue, COALESCE(n_purchases, 0) AS n_purchases
         |FROM daily LEFT JOIN p ON daily.date = p.date""".stripMargin,
    "j2_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "w1_top1_per_group" ->
      """WITH hourly AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |                               ORDER BY n DESC, hr ASC) AS rn
        |  FROM hourly)
        |SELECT event_type, hr, n FROM ranked WHERE rn = 1""".stripMargin,
    "w2_lead" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS date,
         |         ${dsumSql("o_totalprice", 4, 2)} AS close
         |  FROM orders GROUP BY 1),
         |led AS (
         |  SELECT date, close, LEAD(close, 1) OVER (ORDER BY date) AS close_next
         |  FROM daily)
         |SELECT date, close, close_next,
         |       CAST(close_next > close AS INT) AS target
         |FROM led WHERE close_next IS NOT NULL""".stripMargin,
    "w2_lead_by_key" ->
      s"""WITH daily AS (
         |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS date,
         |         ${dsumSql("o_totalprice", 4, 2)} AS close
         |  FROM orders GROUP BY 1, 2),
         |led AS (
         |  SELECT priority, date, close,
         |         LEAD(close, 1) OVER (PARTITION BY priority ORDER BY date) AS close_next
         |  FROM daily)
         |SELECT priority, date, close, close_next,
         |       CAST(close_next > close AS INT) AS target
         |FROM led WHERE close_next IS NOT NULL""".stripMargin
  )
}

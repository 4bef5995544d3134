package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate aggregates — the sketches a 100 TB pipeline substitutes for
  * exact distinct/percentile when the exact form would shuffle every value
  * (BASELINE.json north-star note; SURVEY.md §2.12 HLL remark). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL) within 5% of exact") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val (approx, exact) = li.agg(
      approx_count_distinct($"l_partkey", 0.02).as("a"),
      countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx percentile within one unit of exact for integer-valued qty") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val (app, ex) = li.agg(
      percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("a"),
      expr("percentile(l_quantity, 0.5)").as("e"))
      .as[(Double, Double)].head()
    assert(math.abs(app - ex) <= 1.0, s"approx=$app exact=$ex")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.core.Tables

/** Pins the schema posture of every driver testdata table so the NEXT
  * testdata regeneration that drifts a type breaks ONE targeted test here,
  * not N queries at verify time (round-9 lesson: events `ts` went
  * TIMESTAMP(NANOS) → un-adjusted TIMESTAMP(MICROS) and 7 queries died).
  *
  * Also pins all three accepted `ts` encodings for events: nanos-as-long,
  * TIMESTAMP_NTZ, and plain TIMESTAMP — `Tables.events` must normalize each
  * to a session-TZ TimestampType with identical wall-clock values.
  */
class TablesSpec extends SparkSpec {

  private def fieldTypes(name: String): Map[String, DataType] =
    Tables.table(spark, sf(), name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events.ts normalizes to TimestampType regardless of parquet encoding") {
    assert(Tables.events(spark, sf()).schema("ts").dataType === TimestampType)
  }

  test("all three ts encodings normalize to identical wall-clock timestamps") {
    import spark.implicits._
    val base = Tables.events(spark, sf()).select("event_id", "ts").limit(500)

    val dir = Files.createTempDirectory("tables-ts-enc").toString
    // NTZ encoding: parquet TIMESTAMP(MICROS) without UTC adjustment.
    base.selectExpr("event_id", "cast(ts as timestamp_ntz) as ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ntzRead = spark.read.parquet(s"$dir/events.parquet")
    assert(ntzRead.schema("ts").dataType === TimestampNTZType,
      "precondition: round-trip must produce NTZ parquet")
    val viaNtz = Tables.events(spark, dir)
    assert(viaNtz.schema("ts").dataType === TimestampType)

    // LTZ encoding: plain TIMESTAMP passes through untouched.
    val dir2 = Files.createTempDirectory("tables-ts-ltz").toString
    base.write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val viaLtz = Tables.events(spark, dir2)
    assert(viaLtz.schema("ts").dataType === TimestampType)

    val expect = base.as[(Long, java.sql.Timestamp)].collect().toMap
    val gotNtz = viaNtz.select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    val gotLtz = viaLtz.select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    assert(gotNtz === expect, "NTZ branch must be wall-clock identity under UTC session")
    assert(gotLtz === expect)
  }

  test("epoch extraction works on the events table as read (regression: sf_epoch)") {
    // unix_millis rejects TIMESTAMP_NTZ at analysis time — this is the exact
    // failure mode that killed 7 queries in round 9.
    val n = Tables.events(spark, sf())
      .selectExpr("unix_millis(ts) as ms", "unix_micros(ts) as us", "cast(ts as double) as sec")
      .limit(1).count()
    assert(n === 1)
  }

  test("events schema posture") {
    val t = fieldTypes("events")
    assert(t("event_id") === LongType)
    assert(t("ts") === TimestampType)
    assert(t("user_id") === LongType)
    assert(t("event_type") === StringType)
    assert(t("value") === DoubleType)
    assert(t("props") === StringType)
  }

  test("orders schema posture (dates + numerics)") {
    val t = fieldTypes("orders")
    assert(t("o_orderkey") === LongType)
    assert(t("o_custkey") === LongType)
    assert(t("o_orderstatus") === StringType)
    assert(t("o_totalprice") === DoubleType)
    // Un-adjusted TIMESTAMP(MICROS) in the file; registry normalizes NTZ→LTZ.
    assert(t("o_orderdate") === TimestampType, s"o_orderdate drifted to ${t("o_orderdate")}")
    assert(t("o_orderpriority") === StringType)
  }

  test("lineitem schema posture") {
    val t = fieldTypes("lineitem")
    assert(t("l_orderkey") === LongType)
    assert(t("l_quantity") === DoubleType)
    assert(t("l_extendedprice") === DoubleType)
    assert(t("l_discount") === DoubleType)
    assert(t("l_shipdate") === TimestampType, s"l_shipdate drifted to ${t("l_shipdate")}")
  }

  test("documents + embeddings schema posture") {
    val d = fieldTypes("documents")
    assert(d("doc_id") === LongType)
    assert(d("text") === StringType)
    assert(d("lang") === StringType)
    assert(d("source") === StringType)
    assert(d("n_chars") === LongType)
    val e = fieldTypes("embeddings")
    assert(e("vec_id") === LongType)
    assert(e("embedding") match { case ArrayType(FloatType, _) => true; case _ => false },
      s"embedding drifted to ${e("embedding")}")
    assert(e("label") === IntegerType)
  }

  test("dimension tables schema posture") {
    assert(fieldTypes("region")("r_regionkey") === IntegerType)
    assert(fieldTypes("nation")("n_nationkey") === IntegerType)
    assert(fieldTypes("customer")("c_custkey") === LongType)
    assert(fieldTypes("supplier")("s_suppkey") === LongType)
    assert(fieldTypes("part")("p_partkey") === LongType)
  }
}

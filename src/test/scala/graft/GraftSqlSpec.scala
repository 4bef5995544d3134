package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** The GRAFT maintenance SQL grammar (injected parser): each statement
  * plans as a command over the manifest log, and everything that is not
  * a GRAFT statement must reach Spark's own parser untouched. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sql").toString

  test("GRAFT HISTORY / DETAIL / STATS read the manifest through SQL") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    ManifestTable.upsertDedup(spark, Seq((3L, "c")).toDF("k", "s"), root,
      keys = Seq("k"), order = "s")

    val hist = spark.sql(s"GRAFT HISTORY '$root'")
    assert(hist.select("version").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(hist.filter(col("version") === 2).select("op").as[String].head() == "upsert")

    val detail = spark.sql(s"GRAFT DETAIL '$root'").collect().head
    assert(detail.getString(detail.fieldIndex("location")) == root)
    assert(detail.getLong(detail.fieldIndex("version")) == 2L)

    val stats = spark.sql(s"GRAFT STATS '$root'")
    assert(stats.filter(col("column") === "k").select("value_count")
      .as[Long].head() == 3L)
  }

  test("GRAFT RESTORE / COMPACT / VACUUM mutate through SQL") {
    val root = tmp() + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("k", "s"), root)         // v1
    ManifestTable.upsertDedup(spark, Seq((2L, "b")).toDF("k", "s"), root,
      keys = Seq("k"), order = "s")                                   // v2

    val restored = spark.sql(s"GRAFT RESTORE '$root' TO VERSION 1").collect().head
    assert(restored.getLong(0) == 1L && restored.getLong(1) == 3L)
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))

    val compacted = spark.sql(s"GRAFT COMPACT '$root' TARGET 64").collect().head
    assert(compacted.getLong(0) == 4L)

    val reclaimed = spark.sql(s"GRAFT VACUUM '$root' KEEP 1").collect().head
    assert(reclaimed.getInt(0) >= 1) // v2's generation is unreferenced now
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("non-GRAFT SQL is untouched; a malformed GRAFT statement errors loudly") {
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].head() == 2)
    // a table named graft still parses through the delegate (the prefix
    // regex requires GRAFT as the leading keyword)
    spark.sql("SELECT 'GRAFT VACUUM' AS s").collect()
    val e = intercept[RuntimeException] {
      spark.sql("GRAFT FROBNICATE 'x'")
    }
    assert(e.getMessage.contains("GRAFT statement not recognized"))
  }
}

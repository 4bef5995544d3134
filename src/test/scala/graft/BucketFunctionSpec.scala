package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.v2.{GraftBoundBucket, GraftBucketFunction}

/** The catalog V2 `bucket` function: its evaluated results must be
  * bit-identical to the STORED generated column (`pmod(hash(src), n)`)
  * — a disagreement would let the planner group partitions one way
  * while the files were laid out another — and its ReducibleFunction
  * contract decides which cross-count joins co-partition. */
class BucketFunctionSpec extends SparkSpec {
  import spark.implicits._

  private def bound(types: org.apache.spark.sql.types.DataType*): GraftBoundBucket =
    GraftBucketFunction.bind(StructType(
      (IntegerType +: types).zipWithIndex.map { case (t, i) =>
        StructField(s"c$i", t) })).asInstanceOf[GraftBoundBucket]

  test("produceResult matches the stored-column arithmetic pmod(hash(col), n)") {
    val b = bound(LongType)
    val keys = Seq(0L, 1L, 7L, 42L, -3L, 123456789L, Long.MaxValue, Long.MinValue)
    val expected = keys.toDF("k")
      .select(pmod(hash(col("k")), lit(16)).as("b"))
      .as[Int].collect().toSeq
    val got = keys.map(k => b.produceResult(InternalRow(16, k)).intValue)
    assert(got == expected)
    // a null key hashes to the seed, same as the stored derivation
    val nullExpected = Seq[Option[Long]](None).toDF("k")
      .select(pmod(hash(col("k")), lit(16)).as("b")).as[Int].head()
    assert(b.produceResult(InternalRow(16, null)).intValue == nullExpected)
  }

  test("produceResult folds multi-column tuples like hash(c1, c2)") {
    val b = bound(LongType, StringType)
    val expected = Seq((7L, "x"), (7L, "y"), (0L, "")).toDF("a", "s")
      .select(pmod(hash(col("a"), col("s")), lit(32)).as("b"))
      .as[Int].collect().toSeq
    val got = Seq((7L, "x"), (7L, "y"), (0L, "")).map { case (a, s) =>
      b.produceResult(InternalRow(32, a, UTF8String.fromString(s))).intValue
    }
    assert(got == expected)
  }

  test("reducer contract: divisible reduces, equal and non-divisible do not") {
    val b = bound(LongType)
    // 32 → 16: this side reduces by mod 16
    val r = b.reducer(32, b, 16)
    assert(r != null && r.reduce(17) == 1 && r.reduce(16) == 0 && r.reduce(15) == 15)
    // reduction is CONSISTENT with the arithmetic: for any key,
    // reduce(bucket32(k)) == bucket16(k)
    val keys = Seq(0L, 3L, 99L, -5L, 123456789L)
    keys.foreach { k =>
      val fine = b.produceResult(InternalRow(32, k))
      val coarse = b.produceResult(InternalRow(16, k))
      assert(r.reduce(fine) == coarse, s"key $k")
    }
    // equal counts: no reducer needed (null per the contract)
    assert(b.reducer(16, b, 16) == null)
    // the COARSER side cannot reduce onto the finer one
    assert(b.reducer(16, b, 32) == null)
    // non-divisible pair: no reducer either way
    assert(b.reducer(12, b, 18) == null && b.reducer(18, b, 12) == null)
    // a foreign function never reduces
    val other = new org.apache.spark.sql.connector.catalog.functions
        .ReducibleFunction[Integer, Integer] {}
    assert(b.reducer(32, other, 16) == null)
  }

  test("the catalog serves bucket through its FunctionCatalog surface") {
    val cat = spark.sessionState.catalogManager.catalog("graft_lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val f = cat.loadFunction(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "bucket"))
    assert(f eq GraftBucketFunction)
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException] {
      cat.loadFunction(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "nope"))
    }
  }
}

package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The engine's `bucket(n, c1[, c2…])` layout transform as a CATALOG V2
  * function — what lets Spark's storage-partitioned-join machinery
  * reason about the transform itself instead of opaque stored values.
  *
  * Two optimizer capabilities ride on this (both resolved through
  * [[GraftCatalog]]'s FunctionCatalog surface by
  * `V2ExpressionUtils.toCatalystTransformOpt`):
  *
  *  - '''Natural-shape SPJ.''' The batch scan reports its clustering as
  *    `bucket(n, key)` over the SOURCE column, so `ON a.k = b.k` joins
  *    co-partition directly — no generated-column equality needed in
  *    the join condition at all.
  *  - '''Compatible bucket counts (the Iceberg ReducibleFunction
  *    shape).''' A 2n-bucket fact joining an n-bucket dim no longer
  *    pays a full Exchange: `pmod(h, 2n) mod n == pmod(h, n)` whenever
  *    n divides 2n, so the planner reduces the finer side's partition
  *    values onto the coarser side's ([[GraftBucketReducer]]) and the
  *    join stays zero-shuffle
  *    (`spark.sql.sources.v2.bucketing.allowCompatibleTransforms`).
  *
  * Arithmetic contract: identical to the STORED generated column the
  * write boundary derives — `pmod(hash(c1[, c2…]), n)` with Spark's
  * murmur3 `hash` (seed 42, left-to-right fold). [[produceResult]]
  * replicates it exactly via [[Murmur3HashFunction]], so evaluated and
  * stored bucket ids can never disagree. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, cols...): pmod(hash(cols...), n) — the graft layout transform"

  /** Binding shape (Spark's BucketTransform convention): arg 0 is the
    * literal bucket count (int), the rest are the source columns. Any
    * hashable source type is accepted — murmur3 is total. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
        inputType.fields.head.dataType == IntegerType,
      s"bucket expects (int numBuckets, sourceCols...), got $inputType")
    GraftBoundBucket(inputType.fields.map(_.dataType).toIndexedSeq)
  }
}

/** Reduces a finer bucket id space onto a coarser one: sound because
  * `(h mod (k·m)) mod m == h mod m` for non-negative pmod results. */
final case class GraftBucketReducer(divisor: Int)
    extends Reducer[Integer, Integer] {
  override def reduce(bucket: Integer): Integer = bucket % divisor
}

final case class GraftBoundBucket(argTypes: IndexedSeq[DataType])
    extends ScalarFunction[Integer] with ReducibleFunction[Integer, Integer] {

  override def inputTypes(): Array[DataType] = argTypes.toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false

  /** One canonical name across bindings: two scans' transforms compare
    * by this (plus argument equality), so it must not encode the input
    * types — a BIGINT-keyed table and its clone must agree. */
  override def canonicalName(): String = "graft.bucket"

  /** `pmod(hash(srcs…), n)` — the exact stored-column arithmetic. */
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    var h = 42
    var i = 1
    while (i < argTypes.length) {
      h = Murmur3HashFunction.hash(input.get(i, argTypes(i)), argTypes(i), h)
        .toInt
      i += 1
    }
    ((h % n) + n) % n
  }

  /** THIS side's partition values reduce onto the OTHER side's
    * granularity when the other count divides ours; equal counts need
    * no reducer (null, per the ReducibleFunction contract) and a
    * non-divisor pair is not reducible from this side. */
  override def reducer(thisNumBuckets: Int,
                       otherFunction: ReducibleFunction[_, _],
                       otherNumBuckets: Int): Reducer[Integer, Integer] =
    otherFunction match {
      case b: GraftBoundBucket if b.canonicalName() == canonicalName() &&
          thisNumBuckets != otherNumBuckets &&
          otherNumBuckets > 0 && thisNumBuckets % otherNumBuckets == 0 =>
        GraftBucketReducer(otherNumBuckets)
      case _ => null
    }
}

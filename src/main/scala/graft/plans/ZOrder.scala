package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) interleaving for multi-dimensional clustering — the
  * Delta `OPTIMIZE ZORDER BY` idea: linear sort-clustering gives tight
  * per-file min/max boxes only on the sort PREFIX, so a filter on the
  * second clustered column prunes nothing; interleaving the columns'
  * rank bits makes every file cover a small hyper-rectangle, so min/max
  * skipping bites on EACH clustered column independently.
  *
  * Shape: each column is ranked into 2^[[Bits]] quantile buckets
  * (boundaries sampled once, driver-side, then carried as expression
  * literals — quantile ranks are skew-robust where uniform width_bucket
  * scaling is not), and the bucket ids' bits are interleaved into one
  * LONG sort key with plain codegen'd arithmetic. The key is used only
  * for `repartitionByRange + sortWithinPartitions` at rewrite time —
  * it is never stored, and pruning correctness never depends on it
  * (stats + conservative prune carry that, as everywhere else).
  */
object ZOrder {

  /** Rank bits per column: 256 buckets — at 100 TB a clustered table has
    * thousands of files, so 256×256 cells per column pair already
    * out-resolves any realistic file count; more bits only lengthen the
    * key. ≤7 columns keeps the interleaved key in a signed long. */
  val Bits = 8
  private val Buckets = 1 << Bits

  /** The interleaved z-key column for `cols` of `df`. One
    * `approxQuantile` (numeric-likes) or bounded `takeSample` (strings)
    * pass per column to learn boundaries; the returned Column is pure
    * codegen'd arithmetic over [[RangeBucket]]/[[RangeBucketStr]].
    * Nulls rank 0 (they co-locate at the low edge; their pruning is
    * carried by null counts, not bounds). */
  def zkey(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size * Bits <= 63,
      s"zkey: 1..7 columns supported, got ${cols.size}")
    val k = cols.size
    // ONE approxQuantile pass learns boundaries for ALL numeric-like
    // columns together (a per-column pass would scan the table k times
    // at rewrite time); strings sample separately
    val numeric = cols.flatMap(c => numericize(c, df.schema(c).dataType).map(c -> _))
    val numericBounds: Map[String, Array[Double]] =
      if (numeric.isEmpty) Map.empty
      else {
        val probes = (1 until Buckets).map(_.toDouble / Buckets).toArray
        val proj = df.select(numeric.zipWithIndex.map {
          case ((_, num), i) => num.as(s"_z$i")
        }: _*)
        val qs = proj.stat.approxQuantile(
          numeric.indices.map(i => s"_z$i").toArray, probes, 0.001)
        numeric.zipWithIndex.map { case ((c, _), i) =>
          c -> qs(i).distinct.sorted
        }.toMap
      }
    val buckets = cols.map { c =>
      val b = numericBounds.get(c) match {
        case Some(bs) =>
          ColumnExpr.column(RangeBucket(
            ColumnExpr.expression(numericize(c, df.schema(c).dataType).get), bs))
        case None => stringBucketColumn(df, c)
      }
      coalesce(b, lit(0)).cast("long")
    }
    // bit j of column i lands at position j*k + i: column bits alternate,
    // so truncating the key from the top loses resolution evenly across
    // columns — the Morton property that makes per-file boxes square
    (0 until Bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * k + i)
      }
    }.reduce(_ + _)
  }

  /** 0..255 rank bucket for a non-numeric column (null in → null out;
    * zkey coalesces). Numeric columns go through the shared one-pass
    * quantile sampling in [[zkey]]. */
  private def stringBucketColumn(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case StringType =>
        // bounded, seeded sample for boundary estimation — layout
        // quality only, never correctness
        val sample = df.select(col(c)).na.drop().limit(2000000)
          .rdd.takeSample(withReplacement = false, num = 65536, seed = 42L)
          .map(_.getString(0)).distinct.sorted
        val bs =
          if (sample.length <= Buckets - 1) sample
          else Array.tabulate(Buckets - 1)(i => sample((i + 1) * sample.length / Buckets))
            .distinct
        ColumnExpr.column(RangeBucketStr(ColumnExpr.expression(col(c)),
          bs.map(UTF8String.fromString)))
      case other => throw new IllegalArgumentException(
        s"zkey: column '$c' of type ${other.simpleString} is not z-orderable " +
          "(numeric, date, timestamp and string are)")
    }

  /** Order-preserving numeric view of a column, if its type has one.
    * Doubles lose integer precision above 2^53 — irrelevant here: ranks
    * only need ORDER, and quantile boundaries live in the same space. */
  private def numericize(name: String, dt: DataType): Option[Column] = {
    val c = col(name)
    val q = s"`${name.replace("`", "``")}`"
    dt match {
      case _: NumericType   => Some(c.cast("double"))
      case DateType         => Some(expr(s"unix_date($q)").cast("double"))
      case TimestampType    => Some(expr(s"unix_micros($q)").cast("double"))
      case TimestampNTZType => Some(expr(s"unix_micros(cast($q as timestamp))").cast("double"))
      case BooleanType      => Some(c.cast("int").cast("double"))
      case _                => None
    }
  }
}

/** Rank of `child` (already cast to double) among sorted `boundaries`:
  * the count of boundaries <= value, i.e. `Arrays.binarySearch`'s
  * insertion point — O(log 256) per row inside whole-stage codegen. */
case class RangeBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_range_bucket expects double, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_range_bucket"

  def compute(v: Double): Int = {
    val i = java.util.Arrays.binarySearch(boundaries, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeBucket", this, classOf[RangeBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

/** [[RangeBucket]] over strings (UTF8String boundary array, binary
  * comparison — consistent with Spark's own string ordering). */
case class RangeBucketStr(child: Expression, boundaries: Array[UTF8String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_range_bucket_str expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_range_bucket_str"

  def compute(v: UTF8String): Int = {
    var lo = 0; var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeBucketStr", this, classOf[RangeBucketStr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucketStr =
    copy(child = newChild)
}

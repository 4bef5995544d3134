package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.types._

import ManifestTable.{ColStats, FileEntry}

/** Metadata-level data skipping for [[ManifestTable]] — the Delta/Iceberg
  * stats-at-commit pattern: the write side records per-file, per-column
  * min/max from each parquet FOOTER into the manifest ([[footerStats]]);
  * the read side evaluates a filter against those stats plus the hive
  * partition values already encoded in each file's path, and hands the
  * scan only the files that MIGHT match ([[prune]]).
  *
  * Everything here is advisory and CONSERVATIVE: a conjunct the compiler
  * doesn't recognize, a column without stats, a kind mismatch between the
  * literal and the stats — each keeps the file. [[ManifestTable.readWhere]]
  * re-applies the full filter after the scan, so pruning can never change
  * results, only the number of files scanned.
  *
  * Canonical stat encoding ('n' = numeric): ints as themselves, dates as
  * epoch DAYS, timestamps as epoch MICROS, floats as decimal strings —
  * chosen to equal the Catalyst internal representation of the matching
  * literal, so comparisons need no type lore at prune time. 's' = string,
  * compared lexicographically; parquet orders binary stats by UNSIGNED
  * BYTE, which agrees with java.lang.String ordering only on ASCII, so
  * non-ASCII string stats are dropped at collection time.
  */
object DataSkipping {

  /** Per-column min/max for one parquet file, from its footer only (no
    * row reads). Columns drop out rather than degrade: unsupported
    * physical/logical types, missing or unusable chunk statistics,
    * NaN float bounds, non-ASCII string bounds. */
  def footerStats(conf: Configuration, path: Path): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      // (kind, min, max) accumulated across row groups; None = column is
      // unusable and must not re-enter via a later block
      val acc = scala.collection.mutable.Map.empty[String, Option[(Char, Any, Any)]]
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val name = chunk.getPath.toDotString
        // skip nested leaves and columns already marked unusable
        if (!name.contains('.') && !acc.get(name).contains(None)) {
          chunkBounds(chunk) match {
            case Unusable => acc(name) = None
            case AllNull  => () // no values → contributes nothing to min/max
            case Bounds(kind, mn, mx) =>
              acc(name) = acc.get(name).flatten match {
                case Some((k, m0, m1)) if k == kind =>
                  Some((k, ordMin(k, m0, mn), ordMax(k, m1, mx)))
                case Some(_) => None // kind flip across blocks: impossible, drop
                case None    => Some((kind, mn, mx))
              }
          }
        }
      }
      acc.collect { case (c, Some((k, mn, mx))) =>
        c -> ColStats(k, canonString(mn), canonString(mx))
      }.toMap
    } finally reader.close()
  }

  private sealed trait ChunkBounds
  private case object Unusable extends ChunkBounds
  private case object AllNull extends ChunkBounds
  private final case class Bounds(kind: Char, min: Any, max: Any) extends ChunkBounds

  private def canonString(v: Any): String = v match {
    case bd: BigDecimal => bd.bigDecimal.toPlainString
    case s: String      => s
    case other          => other.toString
  }

  private def ordMin(kind: Char, a: Any, b: Any): Any =
    if (kind == 'n') { val (x, y) = (a.asInstanceOf[BigDecimal], b.asInstanceOf[BigDecimal]); if (x <= y) x else y }
    else { val (x, y) = (a.asInstanceOf[String], b.asInstanceOf[String]); if (x <= y) x else y }

  private def ordMax(kind: Char, a: Any, b: Any): Any =
    if (kind == 'n') { val (x, y) = (a.asInstanceOf[BigDecimal], b.asInstanceOf[BigDecimal]); if (x >= y) x else y }
    else { val (x, y) = (a.asInstanceOf[String], b.asInstanceOf[String]); if (x >= y) x else y }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** One column chunk's bounds in canonical form. */
  private def chunkBounds(chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): ChunkBounds = {
    val stats = chunk.getStatistics
    if (stats == null || stats.isEmpty) return Unusable
    if (!stats.hasNonNullValue) {
      // an all-null chunk has no min/max but constrains nothing — null
      // rows never satisfy a comparison predicate
      return if (stats.isNumNullsSet && stats.getNumNulls == chunk.getValueCount) AllNull
      else Unusable
    }
    val pt: PrimitiveType = chunk.getPrimitiveType
    val logical: LogicalTypeAnnotation = pt.getLogicalTypeAnnotation
    def num(f: Any => Option[BigDecimal]): ChunkBounds =
      (f(stats.genericGetMin), f(stats.genericGetMax)) match {
        case (Some(mn), Some(mx)) => Bounds('n', mn, mx)
        case _                    => Unusable
      }
    pt.getPrimitiveTypeName match {
      case INT32 => logical match {
        case null => num(v => Some(BigDecimal(v.asInstanceOf[Integer].toInt)))
        case i: IntLogicalTypeAnnotation if i.isSigned =>
          num(v => Some(BigDecimal(v.asInstanceOf[Integer].toInt)))
        case _: DateLogicalTypeAnnotation => // epoch days = Catalyst DateType repr
          num(v => Some(BigDecimal(v.asInstanceOf[Integer].toInt)))
        case _ => Unusable
      }
      case INT64 => logical match {
        case null => num(v => Some(BigDecimal(v.asInstanceOf[java.lang.Long].toLong)))
        case i: IntLogicalTypeAnnotation if i.isSigned =>
          num(v => Some(BigDecimal(v.asInstanceOf[java.lang.Long].toLong)))
        case t: TimestampLogicalTypeAnnotation =>
          // canonical micros = Catalyst TimestampType repr; NANOS floors
          // the min and ceils the max (conservative envelope)
          import LogicalTypeAnnotation.TimeUnit._
          val toMicros: (Long, Boolean) => Long = t.getUnit match {
            case MILLIS => (v, _) => Math.multiplyExact(v, 1000L)
            case MICROS => (v, _) => v
            case NANOS  => (v, up) => if (up) Math.floorDiv(v + 999, 1000L) else Math.floorDiv(v, 1000L)
          }
          val mn = toMicros(stats.genericGetMin.asInstanceOf[java.lang.Long], false)
          val mx = toMicros(stats.genericGetMax.asInstanceOf[java.lang.Long], true)
          Bounds('n', BigDecimal(mn), BigDecimal(mx))
        case _ => Unusable
      }
      case FLOAT => num { v =>
        val f = v.asInstanceOf[java.lang.Float].floatValue()
        if (f.isNaN) None else Some(BigDecimal(f.toDouble))
      }
      case DOUBLE => num { v =>
        val d = v.asInstanceOf[java.lang.Double].doubleValue()
        if (d.isNaN) None else Some(BigDecimal(d))
      }
      case BINARY => logical match {
        case _: StringLogicalTypeAnnotation =>
          val mn = stats.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8
          val mx = stats.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8
          if (isAscii(mn) && isAscii(mx)) Bounds('s', mn, mx) else Unusable
        case _ => Unusable
      }
      case _ => Unusable
    }
  }

  // ---------------------------------------------------------------- prune

  /** Files from `files` that MIGHT contain rows matching `filter`. Splits
    * the filter into AND-conjuncts and evaluates each recognized
    * comparison (=, <=>, <, <=, >, >=, IN, IS NULL, IS NOT NULL between a
    * column and literals) against each file's hive partition values
    * (exact) and min/max stats (range containment). Unrecognized
    * conjuncts and unknown columns keep the file. */
  def prune(files: Seq[FileEntry], filter: Column): Seq[FileEntry] = {
    val preds = splitConjuncts(normalize(ColumnExpr.expression(filter)))
      .flatMap(compile(_))
    if (preds.isEmpty) files else files.filter(f => preds.forall(_(f)))
  }

  /** Column-built predicates arrive as `UnresolvedFunction("=", …)` /
    * `("and", …)` etc. (Spark 4's ColumnNode conversion goes through the
    * function registry, not the concrete comparison classes); rewrite the
    * operator names this compiler understands into their catalyst
    * classes. Unknown functions stay as-is and compile to "keep". */
  private def normalize(e: Expression): Expression = e match {
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val args = uf.arguments.map(normalize)
      (uf.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)), args) match {
        case (Seq("and"), Seq(l, r))        => And(l, r)
        case (Seq("=") | Seq("=="), Seq(l, r)) => EqualTo(l, r)
        case (Seq("<=>"), Seq(l, r))        => EqualNullSafe(l, r)
        case (Seq("<"), Seq(l, r))          => LessThan(l, r)
        case (Seq("<="), Seq(l, r))         => LessThanOrEqual(l, r)
        case (Seq(">"), Seq(l, r))          => GreaterThan(l, r)
        case (Seq(">="), Seq(l, r))         => GreaterThanOrEqual(l, r)
        case (Seq("in"), head +: tail) if tail.nonEmpty => In(head, tail)
        case (Seq("isnull"), Seq(a))        => IsNull(a)
        case (Seq("isnotnull"), Seq(a))     => IsNotNull(a)
        case _ => uf
      }
    case other => other
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case UnresolvedAttribute(parts) if parts.lengthCompare(1) == 0 => Some(parts.head)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Catalyst literal → canonical (kind, value): numerics/dates/timestamps
    * to BigDecimal in their internal representation (dates are DAYS,
    * timestamps MICROS — matching [[footerStats]]' encoding), strings to
    * String. None for null literals and unsupported types. */
  private def canonLit(l: Literal): Option[(Char, Any)] = Option(l.value).flatMap { v =>
    l.dataType match {
      case StringType => Some(('s', v.toString))
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType =>
        Some(('n', BigDecimal(v.toString)))
      case FloatType =>
        val f = v.asInstanceOf[Float]; if (f.isNaN) None else Some(('n', BigDecimal(f.toDouble)))
      case DoubleType =>
        val d = v.asInstanceOf[Double]; if (d.isNaN) None else Some(('n', BigDecimal(d)))
      case _: DecimalType => Some(('n', BigDecimal(v.asInstanceOf[Decimal].toJavaBigDecimal)))
      case _ => None
    }
  }

  private type FilePred = FileEntry => Boolean

  /** Route a per-column check through the file's partition values when
    * the column is a partition column (exact knowledge), else through its
    * stats (range knowledge); a column known to neither keeps the file. */
  private def onColumn(name: String)(partTest: Option[String] => Boolean)
                      (statsTest: ColStats => Boolean): FilePred = f =>
    f.partitionValues.get(name) match {
      case Some(pv) => partTest(pv)
      case None     => f.stats.get(name).forall(statsTest)
    }

  /** Partition values are STRINGS (the table pins them so). Against a
    * string literal the comparison is exact; against a numeric literal we
    * compare numerically IF the partition value parses (matching Spark's
    * implicit cast of a string column to the literal's numeric type) and
    * keep the file when it doesn't (the cast's null-vs-trim edge cases
    * are not worth re-implementing — conservative). */
  private def partCompare(pv: Option[String], kind: Char, value: Any,
                          test: Int => Boolean): Boolean = pv match {
    case None => false // NULL never satisfies a comparison predicate
    case Some(s) =>
      if (kind == 's') test(s.compareTo(value.asInstanceOf[String]))
      else Try(BigDecimal(s)).toOption
        .forall(n => test(n.compare(value.asInstanceOf[BigDecimal])))
  }

  private def statsOverlapEq(cs: ColStats, kind: Char, value: Any): Boolean =
    cs.kind != kind || {
      if (kind == 'n') {
        val v = value.asInstanceOf[BigDecimal]
        BigDecimal(cs.min) <= v && v <= BigDecimal(cs.max)
      } else {
        val v = value.asInstanceOf[String]
        cs.min <= v && v <= cs.max
      }
    }

  private def statsCompare(cs: ColStats, kind: Char, value: Any,
                           bound: (BigDecimal, BigDecimal) => Boolean,
                           boundS: (String, String) => Boolean,
                           useMin: Boolean): Boolean =
    cs.kind != kind || {
      if (kind == 'n')
        bound(BigDecimal(if (useMin) cs.min else cs.max), value.asInstanceOf[BigDecimal])
      else boundS(if (useMin) cs.min else cs.max, value.asInstanceOf[String])
    }

  /** Compile one conjunct to a file predicate; None = not recognized
    * (that conjunct prunes nothing). */
  private def compile(e: Expression): Option[FilePred] = {
    // (attr op lit) in either operand order, with the comparison flipped
    // when the literal is on the left
    def binary(l: Expression, r: Expression): Option[(String, (Char, Any), Boolean)] =
      (attrName(l), r) match {
        case (Some(n), lit: Literal) => canonLit(lit).map(c => (n, c, false))
        case _ => (attrName(r), l) match {
          case (Some(n), lit: Literal) => canonLit(lit).map(c => (n, c, true))
          case _ => None
        }
      }
    e match {
      case EqualTo(l, r) => binary(l, r).map { case (n, (k, v), _) =>
        onColumn(n)(partCompare(_, k, v, _ == 0))(statsOverlapEq(_, k, v))
      }
      case EqualNullSafe(l, r) =>
        (attrName(l), r) match {
          // col <=> NULL: exact on partition cols, unknown on stats cols
          case (Some(n), Literal(null, _)) =>
            Some(onColumn(n)(_.isEmpty)(_ => true))
          case _ => binary(l, r).map { case (n, (k, v), _) =>
            onColumn(n)(partCompare(_, k, v, _ == 0))(statsOverlapEq(_, k, v))
          }
        }
      case LessThan(l, r) => binary(l, r).map { case (n, (k, v), flipped) =>
        if (!flipped) // col < v: keep iff min < v
          onColumn(n)(partCompare(_, k, v, _ < 0))(statsCompare(_, k, v, _ < _, _ < _, useMin = true))
        else          // v < col: keep iff max > v
          onColumn(n)(partCompare(_, k, v, _ > 0))(statsCompare(_, k, v, _ > _, _ > _, useMin = false))
      }
      case LessThanOrEqual(l, r) => binary(l, r).map { case (n, (k, v), flipped) =>
        if (!flipped)
          onColumn(n)(partCompare(_, k, v, _ <= 0))(statsCompare(_, k, v, _ <= _, _ <= _, useMin = true))
        else
          onColumn(n)(partCompare(_, k, v, _ >= 0))(statsCompare(_, k, v, _ >= _, _ >= _, useMin = false))
      }
      case GreaterThan(l, r) => binary(l, r).map { case (n, (k, v), flipped) =>
        if (!flipped) // col > v: keep iff max > v
          onColumn(n)(partCompare(_, k, v, _ > 0))(statsCompare(_, k, v, _ > _, _ > _, useMin = false))
        else
          onColumn(n)(partCompare(_, k, v, _ < 0))(statsCompare(_, k, v, _ < _, _ < _, useMin = true))
      }
      case GreaterThanOrEqual(l, r) => binary(l, r).map { case (n, (k, v), flipped) =>
        if (!flipped)
          onColumn(n)(partCompare(_, k, v, _ >= 0))(statsCompare(_, k, v, _ >= _, _ >= _, useMin = false))
        else
          onColumn(n)(partCompare(_, k, v, _ <= 0))(statsCompare(_, k, v, _ <= _, _ <= _, useMin = true))
      }
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        attrName(a).map { n =>
          // null elements never equal anything — prune on the non-null set
          val canons = list.collect { case l: Literal => canonLit(l) }.flatten
          (f: FileEntry) => canons.exists { case (k, v) =>
            onColumn(n)(partCompare(_, k, v, _ == 0))(statsOverlapEq(_, k, v))(f)
          }
        }
      case IsNull(a)    => attrName(a).map(n => onColumn(n)(_.isEmpty)(_ => true))
      case IsNotNull(a) => attrName(a).map(n => onColumn(n)(_.nonEmpty)(_ => true))
      case _ => None
    }
  }
}

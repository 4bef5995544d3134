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
  * Canonical stat encoding: 'n' = numeric (ints as themselves, floats as
  * decimal strings), 'd' = dates as epoch DAYS, 't' = timestamps as epoch
  * MICROS — each equal to the Catalyst internal representation of the
  * matching literal, so same-kind comparisons need no type lore at prune
  * time, and a cross-kind comparison (e.g. a date column against a
  * timestamp literal, whose internal scales differ by 86400e6) is a kind
  * mismatch that keeps the file. 's' = string,
  * compared lexicographically; parquet orders binary stats by UNSIGNED
  * BYTE, which agrees with java.lang.String ordering only on ASCII, so
  * non-ASCII string stats are dropped at collection time.
  */
object DataSkipping {

  /** Per-column min/max for one parquet file, from its footer only (no
    * row reads). Columns drop out rather than degrade: unsupported
    * physical/logical types, missing or unusable chunk statistics,
    * NaN float bounds, non-ASCII string bounds. */
  def footerStats(conf: Configuration, path: Path): Map[String, ColStats] =
    footerInfo(conf, path)._1

  /** [[footerStats]] plus the file's EXACT total row count (sum of the
    * footer's per-block row counts — always present in valid parquet,
    * unlike column statistics), from one footer open. The row count is
    * the manifest's zero-scan COUNT(*) path and the deletion-vector
    * full-file-delete proof. */
  def footerInfo(conf: Configuration, path: Path): (Map[String, ColStats], Long) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // per column: bounds (kind/min/max — absent until a non-null chunk
      // lands, '_' once any chunk's bounds prove unusable) + null/value
      // totals. None = column fully unusable (dropped from the result).
      final case class Acc(var kind: Char, var mn: Any, var mx: Any,
                           var nulls: Long, var count: Long)
      val acc = scala.collection.mutable.Map.empty[String, Option[Acc]]
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val name = chunk.getPath.toDotString
        // skip nested leaves and columns already marked unusable
        if (!name.contains('.') && !acc.get(name).contains(None)) {
          val stats = chunk.getStatistics
          // null/value totals are the base layer: without trustworthy
          // counts nothing else about the column can be trusted either
          if (stats == null || stats.isEmpty || !stats.isNumNullsSet)
            acc(name) = None
          else {
            val a = acc.getOrElseUpdate(name, Some(Acc('\u0000', null, null, 0L, 0L))).get
            a.nulls += stats.getNumNulls
            a.count += chunk.getValueCount
            if (stats.hasNonNullValue) {
              chunkBounds(chunk) match {
                case Bounds(kind, mn, mx) =>
                  if (a.kind == '\u0000') { a.kind = kind; a.mn = mn; a.mx = mx }
                  else if (a.kind == kind) {
                    a.mn = ordMin(kind, a.mn, mn); a.mx = ordMax(kind, a.mx, mx)
                  } else a.kind = '_' // kind flip / prior unusable bounds
                case Unusable => a.kind = '_' // counts stay valid
              }
            } // all-null chunk: contributes counts, no bounds
          }
        }
      }
      acc.collect {
        case (c, Some(a)) if a.kind != '\u0000' && a.kind != '_' =>
          // exact = true: this footer belongs to a file the ENGINE's own
          // writer produced (stats are collected at commit time from the
          // just-written generation), and Spark's parquet writer records
          // untruncated chunk-statistics bounds — over-long binary
          // bounds are OMITTED whole (isEmpty above), never shortened.
          // The marker is what lets MIN/MAX be served as a VALUE from
          // metadata (strings especially — a foreign writer may
          // truncate, which keeps bounds valid for pruning but wrong as
          // answers); legacy 6-part manifest specs decode exact = false.
          c -> ColStats(a.kind, canonString(a.mn), canonString(a.mx), a.nulls,
            a.count, exact = true)
        case (c, Some(a)) =>
          // no usable bounds (all-null column, unsupported type, NaN) —
          // counts alone still answer IS NULL / IS NOT NULL and let
          // comparisons prune files with zero non-null values
          c -> ColStats('_', "", "", a.nulls, a.count)
      }.toMap -> rowCount
    } finally reader.close()
  }

  private sealed trait ChunkBounds
  private case object Unusable extends ChunkBounds
  private final case class Bounds(kind: Char, min: Any, max: Any) extends ChunkBounds

  private def canonString(v: Any): String = v match {
    case bd: BigDecimal => bd.bigDecimal.toPlainString
    case s: String      => s
    case other          => other.toString
  }

  private def ordMin(kind: Char, a: Any, b: Any): Any =
    if (kind != 's') { val (x, y) = (a.asInstanceOf[BigDecimal], b.asInstanceOf[BigDecimal]); if (x <= y) x else y }
    else { val (x, y) = (a.asInstanceOf[String], b.asInstanceOf[String]); if (x <= y) x else y }

  private def ordMax(kind: Char, a: Any, b: Any): Any =
    if (kind != 's') { val (x, y) = (a.asInstanceOf[BigDecimal], b.asInstanceOf[BigDecimal]); if (x >= y) x else y }
    else { val (x, y) = (a.asInstanceOf[String], b.asInstanceOf[String]); if (x >= y) x else y }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** One column chunk's bounds in canonical form (caller has already
    * established the chunk has usable statistics with a non-null value). */
  private def chunkBounds(chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): ChunkBounds = {
    val stats = chunk.getStatistics
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
          Bounds('d', BigDecimal(stats.genericGetMin.asInstanceOf[Integer].toInt),
                      BigDecimal(stats.genericGetMax.asInstanceOf[Integer].toInt))
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
            // addExact: a near-Long.MaxValue max (year-2262 nanos) must
            // throw — wrapping negative would UNDER-estimate the max, a
            // non-conservative stat; the throw degrades the column to
            // stats-less via the caller's catch, like the MILLIS path
            case NANOS  => (v, up) => if (up) Math.floorDiv(Math.addExact(v, 999L), 1000L) else Math.floorDiv(v, 1000L)
          }
          val mn = toMicros(stats.genericGetMin.asInstanceOf[java.lang.Long], false)
          val mx = toMicros(stats.genericGetMax.asInstanceOf[java.lang.Long], true)
          Bounds('t', BigDecimal(mn), BigDecimal(mx))
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
    * conjuncts and unknown columns keep the file.
    *
    * `typedParts` is the table's typed-partition declaration
    * ([[ManifestTable.partitionTypes]]): a typed-tagged column reads
    * back CAST to its declared type, so a NON-CANONICAL directory value
    * reads as NULL even though the directory string is non-null — the
    * IS NULL / <=> NULL partition tests must KEEP such files (dropping
    * one silently loses its rows: there is no residual filter that can
    * resurrect a pruned file). Comparison predicates are unaffected —
    * a NULL read-back row can never satisfy one, so either keep/drop
    * decision on the dir string is safe; IS NOT NULL's keep-non-null-dir
    * over-keeps at worst (the residual drops the NULL rows above). */
  def prune(files: Seq[FileEntry], filter: Column,
            typedParts: Map[String, org.apache.spark.sql.types.DataType] =
              Map.empty): Seq[FileEntry] = {
    val typedLc = typedParts.map { case (k, t) =>
      k.toLowerCase(java.util.Locale.ROOT) -> t }
    val preds = splitConjuncts(normalize(ColumnExpr.expression(filter)))
      .flatMap(compile(_, typedLc))
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
        case (Seq("startswith"), Seq(l, r)) => StartsWith(l, r)
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
    * to BigDecimal in their internal representation (dates 'd' are DAYS,
    * timestamps 't' are MICROS, plain numerics 'n' — matching
    * [[footerStats]]' encoding, so a date column compared against a
    * timestamp literal is a kind MISMATCH and keeps the file instead of
    * comparing days against micros), strings to String. None for null
    * literals and unsupported types. */
  private def canonLit(l: Literal): Option[(Char, Any)] = Option(l.value).flatMap { v =>
    l.dataType match {
      case StringType => Some(('s', v.toString))
      case ByteType | ShortType | IntegerType | LongType =>
        Some(('n', BigDecimal(v.toString)))
      case DateType => Some(('d', BigDecimal(v.toString)))
      case TimestampType | TimestampNTZType =>
        Some(('t', BigDecimal(v.toString)))
      case FloatType =>
        val f = v.asInstanceOf[Float]; if (f.isNaN) None else Some(('n', BigDecimal(f.toDouble)))
      case DoubleType =>
        val d = v.asInstanceOf[Double]; if (d.isNaN) None else Some(('n', BigDecimal(d)))
      case _: DecimalType => Some(('n', BigDecimal(v.asInstanceOf[Decimal].toJavaBigDecimal)))
      case _ => None
    }
  }

  /** Equality probes a bloom index can answer: one (attr, canonical
    * values) pair per `=`/`<=>`/`IN` conjunct of `filter` (either
    * operand order) — a file provably matching NONE of a conjunct's
    * values cannot satisfy the AND. A conjunct with any null or
    * uncanonicalizable literal is omitted: exclusion needs proof for
    * EVERY probe value, so a partial set could never prune anyway. */
  private[sources] def equalityProbes(filter: Column): Seq[(String, Seq[(Char, Any)])] = {
    val conjuncts = splitConjuncts(normalize(ColumnExpr.expression(filter)))
    conjuncts.flatMap {
      case EqualTo(l, r)        => eqProbe(l, r)
      case EqualNullSafe(l, r)  => eqProbe(l, r)
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        attrName(a).flatMap { n =>
          val canons = list.map(l => canonLit(l.asInstanceOf[Literal]))
          if (canons.exists(_.isEmpty)) None else Some(n -> canons.flatten)
        }
      case _ => None
    }
  }

  private def eqProbe(l: Expression, r: Expression): Option[(String, Seq[(Char, Any)])] =
    ((attrName(l), r) match {
      case (Some(n), lit: Literal) => canonLit(lit).map(c => n -> Seq(c))
      case _ => None
    }).orElse((attrName(r), l) match {
      case (Some(n), lit: Literal) => canonLit(lit).map(c => n -> Seq(c))
      case _ => None
    })

  private type FilePred = FileEntry => Boolean

  /** Smallest ASCII string greater than every string with this prefix:
    * increment the last strictly-incrementable character, drop the tail.
    * None when no such bound exists within ASCII (all chars are 0x7F). */
  private def successor(prefix: String): Option[String] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix.charAt(i) >= 127) i -= 1
    if (i < 0) None
    else Some(prefix.substring(0, i) + (prefix.charAt(i) + 1).toChar)
  }

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
    * are not worth re-implementing — conservative). A DATE literal
    * (kind 'd', epoch days) compares against the ISO-parsed directory
    * value — exact on the canonical renderings typed layout columns are
    * restricted to, conservative keep on anything else. Timestamp
    * literals (kind 't') never parse here and keep the file. */
  private def parsePart(s: String, kind: Char): Option[BigDecimal] =
    if (kind == 'd')
      Try(BigDecimal(java.time.LocalDate.parse(s).toEpochDay)).toOption
    else if (kind == 't') None
    else Try(BigDecimal(s)).toOption

  private def partCompare(pv: Option[String], kind: Char, value: Any,
                          test: Int => Boolean): Boolean = pv match {
    case None => false // NULL never satisfies a comparison predicate
    case Some(s) =>
      if (kind == 's') test(s.compareTo(value.asInstanceOf[String]))
      else parsePart(s, kind)
        .forall(n => test(n.compare(value.asInstanceOf[BigDecimal])))
  }

  private def statsOverlapEq(cs: ColStats, kind: Char, value: Any): Boolean =
    !cs.allNull && // zero non-null values: no comparison can ever match
      (cs.kind != kind || {
        if (kind != 's') {
          val v = value.asInstanceOf[BigDecimal]
          BigDecimal(cs.min) <= v && v <= BigDecimal(cs.max)
        } else {
          val v = value.asInstanceOf[String]
          cs.min <= v && v <= cs.max
        }
      })

  private def statsCompare(cs: ColStats, kind: Char, value: Any,
                           bound: (BigDecimal, BigDecimal) => Boolean,
                           boundS: (String, String) => Boolean,
                           useMin: Boolean): Boolean =
    !cs.allNull &&
      (cs.kind != kind || {
        if (kind != 's')
          bound(BigDecimal(if (useMin) cs.min else cs.max), value.asInstanceOf[BigDecimal])
        else boundS(if (useMin) cs.min else cs.max, value.asInstanceOf[String])
      })

  /** Compile one conjunct to a file predicate; None = not recognized
    * (that conjunct prunes nothing). `typed` is the lowercased typed-
    * partition declaration (see [[prune]]). */
  private def compile(e: Expression,
                      typed: Map[String, org.apache.spark.sql.types.DataType] =
                        Map.empty): Option[FilePred] = {
    // a null-dir value is NULL on read-back always; a NON-canonical
    // value under a typed declaration ALSO reads back NULL (the cast
    // fails) — IS NULL must keep both shapes
    def partReadsNull(n: String)(pv: Option[String]): Boolean =
      pv.isEmpty || typed.get(n.toLowerCase(java.util.Locale.ROOT))
        .exists(t => PartitionTypes.canonical(pv.get, t).isEmpty)
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
          // col <=> NULL: exact on partition cols; on stats cols keep
          // only files with at least one null (unknown counts keep)
          case (Some(n), Literal(null, _)) =>
            Some(onColumn(n)(partReadsNull(n))(cs => cs.nulls != 0L))
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
        attrName(a).flatMap { n =>
          // null ELEMENTS never equal anything, so they are safe to drop
          // from the probe set — but a non-null literal canonLit cannot
          // canonicalize (boolean, binary, …) is NOT: dropping it would
          // under-keep (constant-false when it was the only element), so
          // the whole conjunct degrades to "unrecognized, keep all files"
          val lits = list.collect { case l: Literal => l }.filter(_.value != null)
          val canons = lits.map(canonLit)
          if (canons.exists(_.isEmpty)) None
          else {
            // probe sets sorted per kind: a dynamic-pruning isin carries
            // up to maxKeys (100k) values, so the per-file check must be
            // O(log K) range/membership, not an O(K) scan per file.
            // Ordering is compareTo-based (TreeSet), never hashing —
            // BigDecimal("10.0") must equal BigDecimal("10")
            val byKind: Map[Char, java.util.TreeSet[AnyRef]] =
              canons.flatten.groupBy(_._1).map { case (k, vs) =>
                val set = new java.util.TreeSet[AnyRef]()
                vs.foreach(v => set.add(v._2.asInstanceOf[AnyRef]))
                k -> set
              }
            def keepKind(k: Char, set: java.util.TreeSet[AnyRef], f: FileEntry): Boolean =
              f.partitionValues.get(n) match {
                case Some(pv) => pv match {
                  case None => false // NULL partition never equals anything
                  case Some(s) =>
                    if (k == 's') set.contains(s)
                    else parsePart(s, k)
                      // unparseable partition value: conservative keep
                      .forall(bd => set.contains(bd.asInstanceOf[AnyRef]))
                }
                case None => f.stats.get(n).forall { cs =>
                  !cs.allNull && (cs.kind != k || {
                    // any probe value inside [min, max]?
                    val (lo, hi): (AnyRef, AnyRef) =
                      if (k == 's') (cs.min, cs.max)
                      else (BigDecimal(cs.min).asInstanceOf[AnyRef],
                            BigDecimal(cs.max).asInstanceOf[AnyRef])
                    !set.subSet(lo, true, hi, true).isEmpty
                  })
                }
              }
            Some((f: FileEntry) => byKind.exists { case (k, set) => keepKind(k, set, f) })
          }
        }
      // prefix predicate: a file can hold a prefix-matching string iff
      // its [min, max] range intersects [prefix, successor(prefix)) —
      // the standard prefix-to-range rewrite. No computable successor
      // (prefix of 0x7F chars) keeps the file.
      case StartsWith(l, r) => (attrName(l), r) match {
        case (Some(n), Literal(v, StringType)) if v != null =>
          val prefix = v.toString
          if (!isAscii(prefix)) None // stats hold ASCII bounds only
          else Some(onColumn(n) {
            case None     => false
            case Some(pv) => pv.startsWith(prefix)
          } { cs =>
            !cs.allNull && (cs.kind != 's' || {
              cs.max >= prefix && successor(prefix).forall(cs.min < _)
            })
          })
        case _ => None
      }
      // null-count layer: IS NULL keeps only files with at least one
      // null (unknown counts keep); IS NOT NULL drops provably all-null
      // files — both exact on partition columns
      case IsNull(a)    => attrName(a).map(n =>
        onColumn(n)(partReadsNull(n))(cs => cs.nulls != 0L))
      case IsNotNull(a) => attrName(a).map(n =>
        onColumn(n)(_.nonEmpty)(cs => !cs.allNull))
      case _ => None
    }
  }
}

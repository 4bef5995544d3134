package graft.sources.v2

import org.apache.hadoop.fs.Path

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ManifestTable

/** DSv2 aggregate pushdown for graft catalog tables: `MIN` / `MAX` /
  * `COUNT(col)` / `COUNT(*)` — optionally `GROUP BY` partition-layout
  * columns — answered from the manifest's per-file footer statistics
  * ([[graft.sources.DataSkipping.footerInfo]] records min/max/null/value
  * counts at every commit), so `SELECT max(ts), count(*) FROM t` on a
  * 100 TB table is one driver-side metadata fold with ZERO data files
  * read.
  *
  * Exactness rules (decline rather than approximate — Spark computes the
  * aggregate normally through the scan when this planner returns None):
  *
  *  - '''COUNT(*)''' needs per-file row counts only; it stays EXACT
  *    under deletion vectors (`rows − dv.count` is the live count by
  *    construction), matching [[ManifestTable.rowCount]].
  *  - '''COUNT(col)''' on a partition-layout column is exact from the
  *    directory value (all the file's rows share it — null directory ⇒
  *    zero non-nulls, else every live row counts, DV-exact). On a data
  *    column it needs the file's recorded null/value counts and NO
  *    deletion vector (nulls among deleted rows are unknowable from
  *    metadata).
  *  - '''MIN/MAX(col)''' needs same-kind bounds on every contributing
  *    file and NO deletion vector (the extreme row may be deleted).
  *    The integral-representation kinds are served — ints, dates,
  *    timestamps — where parquet chunk stats are exact values. STRING
  *    MIN/MAX is served from files carrying the commit-time exactness
  *    marker ([[graft.sources.ManifestTable.ColStats.exact]], recorded
  *    because the engine reads footers of files its own writer produced
  *    and Spark's parquet writer never truncates chunk bounds — a
  *    foreign writer may, which keeps bounds valid for PRUNING but not
  *    as VALUES; unmarked legacy files fall to the scanned remainder).
  *    Float and double are declined (NaN ordering makes writer stats
  *    untrustworthy as answers).
  *
  * A file that cannot answer some aggregate doesn't sink the query: the
  * ungrouped shape degrades to Spark's PARTIAL aggregate pushdown — the
  * scan emits one metadata row folding every answerable file plus one
  * fold-row per scanned remainder file (whole-file, pushdown-free reads;
  * deletion-vector positions applied inline exactly like the native
  * batch scan), and Spark's final aggregate merges them. A 100 TB table
  * with a handful of legacy or freshly-deleted files reads those files
  * ONLY. Grouped pushdown is all-or-nothing (complete), because a
  * partial group row per scanned file would be correct but pointless —
  * declining keeps the normal scan path.
  *
  * Renamed/dropped-column tables are served through the rename map
  * (file stats are keyed by PHYSICAL names; layout columns can never be
  * renamed, so group-by keys need no mapping). Clone chains and evolved
  * partition specs decline entirely: inherited generations resolve
  * against source roots and mixed eras classify columns per file — both
  * keep the normal scan. */
object GraftAggScan {

  /** Conf gate (default on). */
  val EnabledKey = "spark.graft.aggPushdown.enabled"

  private[v2] sealed trait Shape
  private[v2] case object CountStarShape extends Shape
  /** COUNT(col) where col is a partition-layout column (dir values). */
  private[v2] final case class CountPartShape(col: String) extends Shape
  /** COUNT(col) where col is a data column (footer null/value counts). */
  private[v2] final case class CountDataShape(col: String) extends Shape
  private[v2] final case class MinShape(col: String, dt: DataType) extends Shape
  private[v2] final case class MaxShape(col: String, dt: DataType) extends Shape

  /** One file's metadata answer for every shape: counts (None =
    * unanswerable) and optional extremes (None = unanswerable,
    * Some(None) = provably no non-null values). Integral kinds fold in
    * Long — ints as themselves, dates epoch days, timestamps epoch
    * micros; string columns fold as the recorded ASCII bound String
    * (exactness-marked files only — see [[plan]]). */
  private final case class FileFold(counts: Array[Option[Long]],
                                    mins: Array[Option[Option[Any]]],
                                    maxs: Array[Option[Option[Any]]]) {
    def answerable: Boolean =
      counts.forall(_.isDefined) && mins.forall(_.isDefined) &&
        maxs.forall(_.isDefined)
  }

  /** Everything `build()` needs once the Aggregation qualifies. */
  private[v2] final case class Planned(groupCols: Seq[String],
                                       shapes: IndexedSeq[Shape],
                                       schema: StructType,
                                       metadataRows: Seq[InternalRow],
                                       scanFiles: Seq[ManifestTable.FileEntry],
                                       complete: Boolean,
                                       root: String,
                                       tags: Map[String, String],
                                       partCols: Seq[String],
                                       fullSchema: StructType)

  private[v2] def expectedKind(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some('n')
    case DateType                                      => Some('d')
    case TimestampType | TimestampNTZType              => Some('t')
    case _                                             => None
  }

  /** Types whose MIN/MAX the AGGREGATE fold can serve: the integral
    * kinds (chunk stats are exact values) plus STRING — but a string
    * bound answers only from files carrying the commit-time exactness
    * marker ([[graft.sources.ManifestTable.ColStats.exact]]): a foreign
    * writer may truncate binary bounds, which keeps them valid for
    * PRUNING but wrong as VALUES; unmarked files fall to the scanned
    * remainder (partial pushdown handles the mix). The TopN cutoff
    * proof shares this kind set but NOT the exactness demand — a
    * containment proof needs bounds, not values. */
  private[v2] def aggBoundKind(dt: DataType): Option[Char] = dt match {
    case StringType => Some('s')
    case other      => expectedKind(other)
  }

  /** A folded Long back in the column type's internal (boxed) value. */
  private[v2] def boxFold(dt: DataType, v: Long): Any = dt match {
    case ByteType                         => Byte.box(v.toByte)
    case ShortType                        => Short.box(v.toShort)
    case IntegerType | DateType           => Int.box(v.toInt)
    case _                                => Long.box(v)
  }

  private def singleName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }

  /** Parse + per-file answerability analysis. None = don't push.
    * `pushed` is the scan's exactly-consumed partition predicates (the
    * builder only offers aggregation when NO residual filter remains,
    * so every entry here is row-exact at file granularity) — the fold
    * runs over the pruned live set. `st0` is the builder-resolved
    * state, one read shared across the whole pushdown negotiation. */
  def plan(root: String, st0: ManifestTable.State, schema: StructType,
           pushed: Array[org.apache.spark.sql.sources.Filter],
           agg: Aggregation): Option[Planned] = {
    val spark = SparkSession.active
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return None
    // era-uniform layouts only: evolved specs mix layouts per era and
    // keep the normal scan. Clone chains DON'T disqualify — the fold
    // below is pure manifest metadata (stats, partition values, row
    // counts, all copied verbatim by the clone commit) and never
    // touches a file path. Renamed/dropped columns are a pure name
    // mapping (stats keys are physical; layout columns can never be
    // renamed) — served below.
    if (st0.tags.contains(ManifestTable.EvolvedTag)) return None
    val renInv: Map[String, String] =
      ManifestTable.renameInfo(st0.tags)._1.map(_.swap)
    def phys(c: String): String = renInv.getOrElse(c, c)

    // the exactly-pushed WHERE: row-exact at file granularity, so the
    // fold over the kept files IS the filtered aggregate. EVERY pushed
    // filter must convert exactly — a dropped conjunct would fold
    // unfiltered rows into the answer.
    val conds = pushed.toSeq.map(f =>
      graft.sources.ManifestRelationFilters.toColumn(f, exact = true))
    if (conds.exists(_.isEmpty)) return None
    val st = conds.flatten.reduceOption(_ && _) match {
      case Some(c) => st0.copy(files =
        ManifestTable.pruneLiveFiles(spark, root, st0, c).toIndexedSeq)
      case None => st0
    }

    val layout = ManifestTable.layoutAt(root, st).toIndexedSeq
    val layoutSet = layout.toSet

    val groupCols: Seq[String] = agg.groupByExpressions.toSeq.map { g =>
      singleName(g).filter(layoutSet.contains).getOrElse(return None)
    }

    val shapes: IndexedSeq[Shape] = agg.aggregateExpressions.toIndexedSeq.map {
      (f: AggregateFunc) => f match {
        case _: CountStar => CountStarShape
        case c: Count if !c.isDistinct =>
          val col = singleName(c.column).getOrElse(return None)
          if (layoutSet.contains(col)) CountPartShape(col)
          else if (schema.fieldNames.contains(col)) CountDataShape(col)
          else return None
        case m: Min =>
          val col = singleName(m.column).getOrElse(return None)
          if (layoutSet.contains(col)) return None // dir values: not data bounds
          val field = schema.fields.find(_.name == col).getOrElse(return None)
          if (aggBoundKind(field.dataType).isEmpty) return None
          MinShape(col, field.dataType)
        case m: Max =>
          val col = singleName(m.column).getOrElse(return None)
          if (layoutSet.contains(col)) return None
          val field = schema.fields.find(_.name == col).getOrElse(return None)
          if (aggBoundKind(field.dataType).isEmpty) return None
          MaxShape(col, field.dataType)
        case _ => return None
      }
    }
    if (shapes.isEmpty) return None

    val nCount = shapes.count { case CountStarShape | _: CountPartShape | _: CountDataShape => true; case _ => false }
    val nMin = shapes.count(_.isInstanceOf[MinShape])
    val nMax = shapes.count(_.isInstanceOf[MaxShape])

    /** Stats bound parsed to the Long fold domain; None when it can't
      * represent exactly (a guard, not an expected path — integral
      * kinds canonicalize as plain decimal strings). */
    def parseBound(s: String): Option[Long] = {
      val bd = scala.util.Try(BigDecimal(s)).toOption.getOrElse(return None)
      if (bd.isValidLong) Some(bd.toLong) else None
    }

    def foldFile(f: ManifestTable.FileEntry): FileFold = {
      val dvCount = f.dv.map(_.count).getOrElse(0L)
      val counts = Array.newBuilder[Option[Long]]
      val mins = Array.newBuilder[Option[Option[Any]]]
      val maxs = Array.newBuilder[Option[Option[Any]]]
      counts.sizeHint(nCount); mins.sizeHint(nMin); maxs.sizeHint(nMax)
      def bound(col: String, dt: DataType, useMin: Boolean): Option[Option[Any]] =
        if (f.dv.nonEmpty) None // the extreme row may be deleted
        else f.stats.get(phys(col)) match {
          case Some(cs) if cs.allNull => Some(None)
          // string bounds answer as VALUES only off exactness-marked
          // files (engine-written footers); the 's' bounds are
          // ASCII-only by collection, where Java String order and
          // Spark's UTF8_BINARY order agree
          case Some(cs) if dt == StringType =>
            if (cs.kind == 's' && cs.exact)
              Some(Some(if (useMin) cs.min else cs.max))
            else None
          case Some(cs) if expectedKind(dt).contains(cs.kind) =>
            parseBound(if (useMin) cs.min else cs.max).map(Some(_))
          case _ => None // absent, kind '_', or kind mismatch
        }
      shapes.foreach {
        case CountStarShape =>
          counts += (if (f.rows >= 0) Some(f.rows - dvCount) else None)
        case CountPartShape(col) =>
          counts += (f.partitionValues.get(col) match {
            case Some(None)    => Some(0L) // null directory: zero non-nulls
            case Some(Some(_)) => if (f.rows >= 0) Some(f.rows - dvCount) else None
            case None          => None // file not under this layout
          })
        case CountDataShape(col) =>
          counts += (if (f.dv.isEmpty)
            f.stats.get(phys(col)).filter(cs => cs.count >= 0 && cs.nulls >= 0)
              .map(cs => cs.count - cs.nulls)
          else None)
        case MinShape(col, dt) => mins += bound(col, dt, useMin = true)
        case MaxShape(col, dt) => maxs += bound(col, dt, useMin = false)
      }
      FileFold(counts.result(), mins.result(), maxs.result())
    }

    val perFile = st.files.map(f => f -> foldFile(f))
    val (answered, unanswered) = perFile.partition(_._2.answerable)

    // grouped pushdown is complete-or-nothing, and every file must
    // carry every group column's directory value
    if (groupCols.nonEmpty &&
        (unanswered.nonEmpty ||
         !st.files.forall(f => groupCols.forall(c =>
           f.partitionValues.contains(c))))) return None

    // the scanned remainder rides the same inline-DV bound as the
    // native batch scan — a table-sized delete should not be re-read
    // through a whole-file fold path
    val dvInScan = unanswered.map(_._1).flatMap(_.dv).map(_.count).sum
    val maxDv = spark.conf.get(GraftBatchScan.MaxInlineDvRowsKey,
      GraftBatchScan.MaxInlineDvRowsDefault.toString).toLong
    if (dvInScan > maxDv) return None

    /** Fold one group of answerable files into an output row suffix. */
    def foldRows(folds: Seq[FileFold]): Array[Any] = {
      var ci = 0; var mi = 0; var xi = 0
      def extreme(dt: DataType, vs: Seq[Any], min: Boolean): Any =
        if (vs.isEmpty) null
        else if (dt == StringType) {
          val ss = vs.map(_.asInstanceOf[String])
          UTF8String.fromString(if (min) ss.min else ss.max)
        } else {
          val ls = vs.map(_.asInstanceOf[Long])
          boxFold(dt, if (min) ls.min else ls.max)
        }
      shapes.map {
        case CountStarShape | _: CountPartShape | _: CountDataShape =>
          val v = Long.box(folds.map(_.counts(ci).get).sum); ci += 1; v
        case MinShape(_, dt) =>
          val vs = folds.flatMap(_.mins(mi).get); mi += 1
          extreme(dt, vs, min = true)
        case MaxShape(_, dt) =>
          val vs = folds.flatMap(_.maxs(xi).get); xi += 1
          extreme(dt, vs, min = false)
      }.toArray
    }

    // group keys surface in the column's READ-BACK type: string layout
    // columns as UTF8String, typed layout columns as the canonical
    // parse of the directory value — one non-canonical value anywhere
    // declines the whole pushdown (the normal scan's cast semantics own
    // the odd case; a metadata row must never disagree with it)
    val typedParts = ManifestTable.partitionTypes(st.tags)
    def groupKeyValue(c: String, v: Option[String]): Option[Any] = v match {
      case None => Some(null: Any)
      case Some(s) => typedParts.get(c) match {
        case Some(t) => graft.sources.PartitionTypes.canonical(s, t)
        case None    => Some(UTF8String.fromString(s): Any)
      }
    }
    val metadataRows: Seq[InternalRow] =
      if (groupCols.isEmpty) {
        // exactly one row, always — the empty table's answer is
        // (count = 0, min/max = null), same as Spark's global aggregate
        Seq(new GenericInternalRow(foldRows(answered.map(_._2))))
      } else {
        answered.groupBy { case (f, _) =>
          groupCols.map(c => f.partitionValues(c)) }
          .toSeq.sortBy(_._1.map(_.getOrElse("")).mkString("/"))
          .map { case (key, group) =>
            val g: Array[Any] = groupCols.zip(key).map { case (c, v) =>
              groupKeyValue(c, v).getOrElse(return None)
            }.toArray
            new GenericInternalRow(g ++ foldRows(group.map(_._2)))
          }
      }

    val aggFields = shapes.map {
      case CountStarShape      => StructField("COUNT(*)", LongType, nullable = false)
      case CountPartShape(c)   => StructField(s"COUNT($c)", LongType, nullable = false)
      case CountDataShape(c)   => StructField(s"COUNT($c)", LongType, nullable = false)
      case MinShape(c, dt)     => StructField(s"MIN($c)", dt)
      case MaxShape(c, dt)     => StructField(s"MAX($c)", dt)
    }
    val groupFields = groupCols.map(c => StructField(c,
      typedParts.getOrElse(c, StringType)))
    val outSchema = StructType((groupFields ++ aggFields).toArray)

    Some(Planned(groupCols, shapes, outSchema, metadataRows,
      unanswered.map(_._1), complete = unanswered.isEmpty, root, st.tags,
      layout, schema))
  }
}

/** The pushed-aggregate scan: one partition replaying the driver-folded
  * metadata rows, plus (partial mode only) one fold partition per
  * remainder file — whole-file, pushdown-free parquet reads whose rows
  * stream in exact parquet order so deletion-vector positions drop out
  * by ordinal, folded to a single partial row each. */
final class GraftAggScan(p: GraftAggScan.Planned) extends Scan with Batch {
  import GraftAggScan._

  private def spark: SparkSession = SparkSession.active

  override def readSchema(): StructType = p.schema

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val meta: InputPartition =
      GraftAggMetadataPartition(p.metadataRows.toArray)
    val dvPos: Map[String, Array[Long]] =
      if (p.scanFiles.forall(_.dv.isEmpty)) Map.empty
      else ManifestTable.dvPositionsByFile(spark, p.root, p.scanFiles, p.tags)
    // clone chains: an inherited remainder file's bytes live under a
    // SOURCE root — resolve the base per generation exactly as the
    // batch scan does (the metadata fold needs no paths, but PARTIAL
    // mode opens real files; r17 review finding)
    val cloneSrcs = ManifestTable.cloneSources(p.tags)
    val folds = p.scanFiles.map { f =>
      val base = ManifestTable.dirBase(spark, p.root, cloneSrcs,
        f.relPath.takeWhile(_ != '/'))
      val path = SparkPath.fromPathString(
        new Path(base, f.relPath).toString)
      // per-file partition-count flags: the dir value is a whole-file
      // constant, so COUNT(layout col) in a scanned file is just "live
      // rows or zero" — decided here, not read
      val partNonNull = p.shapes.collect {
        case CountPartShape(c) => f.partitionValues.get(c).flatten.isDefined
      }.toArray
      GraftAggFoldPartition(
        PartitionedFile(new GenericInternalRow(Array.empty[Any]), path,
          0L, f.bytes, Array.empty, 0L, f.bytes, Map.empty),
        dvPos.getOrElse(f.relPath, Array.emptyLongArray),
        partNonNull): InputPartition
    }
    (meta +: folds).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    if (p.scanFiles.isEmpty)
      return new GraftAggReaderFactory(null, Array.empty, Array.empty,
        Array.empty)
    val s = spark
    // distinct DATA columns the fold must actually read (partition-col
    // counts and COUNT(*) need row counts only); the reader requests
    // PHYSICAL names — file bytes predate any rename
    val renInv: Map[String, String] =
      ManifestTable.renameInfo(p.tags)._1.map(_.swap)
    val partSet = p.partCols.toSet
    val dataCols = p.shapes.collect {
      case CountDataShape(c) => c
      case MinShape(c, _)    => c
      case MaxShape(c, _)    => c
    }.distinct
    val dataSchema = StructType(
      p.fullSchema.fields.filterNot(f => partSet(f.name))
        .map(f => f.copy(name = renInv.getOrElse(f.name, f.name))))
    val required = StructType(
      dataCols.map { c =>
        val f = p.fullSchema.fields.find(_.name == c).get
        f.copy(name = renInv.getOrElse(c, c))
      }.toArray)
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      s, dataSchema, StructType(Nil), required, Seq.empty,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      s.sessionState.newHadoopConf())
    // fold instructions per shape: (kind, ordinal in `required`, type)
    val instr: Array[(Char, Int, DataType)] = p.shapes.map {
      case CountStarShape    => ('*', -1, LongType: DataType)
      case CountPartShape(_) => ('p', -1, LongType: DataType)
      case CountDataShape(c) => ('c', dataCols.indexOf(c), LongType: DataType)
      case MinShape(c, dt)   => ('m', dataCols.indexOf(c), dt)
      case MaxShape(c, dt)   => ('M', dataCols.indexOf(c), dt)
    }.toArray
    // only columns under a MIN/MAX need their VALUES extracted — a
    // count-only column (any type, e.g. string) is null-checked only
    val valueCols: Array[Boolean] = dataCols.map(c => p.shapes.exists {
      case MinShape(`c`, _) | MaxShape(`c`, _) => true
      case _ => false
    }).toArray
    new GraftAggReaderFactory(readFunc, instr,
      required.fields.map(_.dataType), valueCols)
  }

  override def description(): String =
    s"graft-manifest agg-pushdown ${p.root} " +
      s"[${p.schema.fieldNames.mkString(", ")}] " +
      (if (p.complete) "complete (zero files read)"
       else s"partial (${p.scanFiles.size} files folded)")
}

/** Driver-precomputed metadata rows (complete answers or the
  * all-answerable-files partial fold). */
final case class GraftAggMetadataPartition(rows: Array[InternalRow])
    extends InputPartition

/** One remainder file to fold by reading it. */
final case class GraftAggFoldPartition(file: PartitionedFile,
                                       dv: Array[Long],
                                       partNonNull: Array[Boolean])
    extends InputPartition

final class GraftAggReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    instr: Array[(Char, Int, DataType)],
    colTypes: Array[DataType],
    valueCols: Array[Boolean])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GraftAggMetadataPartition(rows) => RowReads.asReader(rows.iterator)
      case GraftAggFoldPartition(file, dv, partNonNull) =>
        val n = colTypes.length
        val mins = Array.fill[Long](n)(Long.MaxValue)
        val maxs = Array.fill[Long](n)(Long.MinValue)
        // string extremes tracked apart (UTF8String binary order = Spark
        // MIN/MAX under the default collation); row.getUTF8String may
        // view reused batch memory, so a RETAINED candidate is cloned —
        // the clone happens only on a new extreme, not per row
        val sMins = Array.fill[UTF8String](n)(null)
        val sMaxs = Array.fill[UTF8String](n)(null)
        val nonNull = Array.fill[Long](n)(0L)
        val seen = Array.fill[Boolean](n)(false)
        var rows = 0L
        RowReads.dvFiltered(RowReads.flatten(readFunc(file)), dv).foreach { row =>
          {
            rows += 1L
            var c = 0
            while (c < n) {
              if (!row.isNullAt(c)) {
                nonNull(c) += 1L
                if (valueCols(c)) {
                  colTypes(c) match {
                    case StringType =>
                      val v = row.getUTF8String(c)
                      if (sMins(c) == null || v.compareTo(sMins(c)) < 0)
                        sMins(c) = v.clone()
                      if (sMaxs(c) == null || v.compareTo(sMaxs(c)) > 0)
                        sMaxs(c) = v.clone()
                    case t =>
                      val v = t match {
                        case ByteType               => row.getByte(c).toLong
                        case ShortType              => row.getShort(c).toLong
                        case IntegerType | DateType => row.getInt(c).toLong
                        case _                      => row.getLong(c)
                      }
                      if (v < mins(c)) mins(c) = v
                      if (v > maxs(c)) maxs(c) = v
                  }
                  seen(c) = true
                }
              }
              c += 1
            }
          }
        }
        var pi = 0
        val out: Array[Any] = instr.map {
          case ('*', _, _) => Long.box(rows)
          case ('p', _, _) =>
            val v = Long.box(if (partNonNull(pi)) rows else 0L); pi += 1; v
          case ('c', ord, _) => Long.box(nonNull(ord))
          case ('m', ord, StringType) => if (seen(ord)) sMins(ord) else null
          case ('M', ord, StringType) => if (seen(ord)) sMaxs(ord) else null
          case ('m', ord, dt) =>
            if (seen(ord)) GraftAggScan.boxFold(dt, mins(ord)) else null
          case ('M', ord, dt) =>
            if (seen(ord)) GraftAggScan.boxFold(dt, maxs(ord)) else null
        }
        RowReads.asReader(Iterator.single(new GenericInternalRow(out)))
    }
}

package graft.sources.v2

import org.apache.hadoop.fs.Path

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ManifestRelationFilters, ManifestTable}

/** The NATIVE DSv2 read path for graft_lake catalog tables: a real
  * [[Batch]] scan (not the `V1ScanWrapper` bridge, which hides the
  * scan's statistics and partitioning interfaces from the optimizer).
  * What promoting the path buys, in optimizer-visible capabilities:
  *
  *  - '''Statistics flow.''' sizeInBytes + exact row counts + PER-COLUMN
  *    min/max/null stats ([[GraftColumnStats]]) reach Catalyst — CBO
  *    estimates filter selectivity at plan time from always-fresh
  *    manifest metadata (dimension joins broadcast without AQE).
  *  - '''Storage-partitioned joins.''' A `bucket(n, c)` layout reports
  *    [[KeyGroupedPartitioning]] over its generated bucket column, one
  *    input partition per live bucket — two co-bucketed tables join
  *    with ZERO Exchange, the dominant fact-fact cost at 100 TB.
  *  - '''Split-level parallelism.''' Non-bucketed scans bin-pack
  *    row-group splits with Spark's own `FilePartition` packing
  *    (maxPartitionBytes/openCost semantics), so one giant file no
  *    longer serializes a stage the way a whole-file scan would.
  *
  * PERMANENT metadata states stay native — losing SPJ/stats/DPP to one
  * metadata commit forever would make the optimizations ornamental:
  *
  *  - '''Renamed/dropped columns''' are a name mapping at the reader
  *    boundary: files carry PHYSICAL names, the scan's required schema
  *    logical ones — each reader requests physical columns and the rows
  *    line up positionally (layout columns and generated-column sources
  *    can never be renamed, [[ManifestTable.schemaEvoCheck]]). Dropped
  *    physical columns are simply never requested.
  *  - '''Evolved partition specs''' (mixed eras) classify required
  *    columns PER FILE: a column is a directory constant where the
  *    file's era recorded it and a parquet data column elsewhere. Files
  *    group by that signature, each group gets its own reader, and a
  *    cheap column permutation restores one scan-wide row layout. A
  *    projected GENERATED column must be RECORDED on every live file
  *    (dir value, or in-file data proven by footer stats) — a file
  *    predating the column needs the V1 bridge's expression repair, so
  *    the scan declines to it. Mixed-classification columns must be
  *    STRING on both sides (directory values are strings; the engine
  *    pins layout columns to string at every write).
  *  - '''Deletion vectors''' stay native up to a bounded total
  *    cardinality: DVs only remove rows, so the reported partitioning,
  *    superset column bounds and DPP all stay valid, and the reader
  *    applies each file's positions inline. Above the bound the V1
  *    bridge's distributed anti-join is the right shape anyway.
  *
  *  - '''Clone chains''' are a PATH indirection at partition-planning
  *    time: a shallow clone's inherited generations physically live
  *    under SOURCE roots ([[ManifestTable.cloneSources]]) while local
  *    rewrites live under the clone's own — each generation resolves
  *    its base root once ([[ManifestTable.dirBase]], cached existence
  *    probe) and every other property is untouched, because the
  *    manifest the clone commit copied carries the files' stats,
  *    partition values and bucket layout verbatim. A cloned 100 TB
  *    fact table keeps SPJ/stats/DPP/TopN from the first read after
  *    the clone — no OPTIMIZE rewrite needed to re-earn the tier.
  *
  * File skipping is identical to the bridge: the SAME metadata pass
  * ([[ManifestTable.pruneLiveFiles]]) prunes files before any scan, and
  * pushed filters are re-applied by Spark above the scan, so results
  * never depend on pruning quality. Reading delegates to Spark's own
  * vectorized parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]] — the exact
  * reader FileSourceScanExec ships), so compression, row-group
  * predicate pushdown, column pruning, additive schema evolution
  * (absent columns null-fill) and INT96 timestamps behave identically
  * to every other read in the engine. */
object GraftBatchScan {

  /** Conf gate (default on): lets an operator force the V1 bridge. */
  val EnabledKey = "spark.graft.batchScan.enabled"

  /** Key-grouping shape when BOTH the bucket source and the stored
    * bucket column are projected: `auto` (default) reports the
    * `bucket(n, src)` transform — the join/agg-on-source shape — and a
    * stored-column-only keyed query pays an Exchange it would not have
    * under identity; `identity` restores the stored-column shape for
    * workloads keyed on the generated column. Per-session, read at
    * scan build. */
  val KeyShapeKey = "spark.graft.bucket.keyShape"

  /** Ceiling on the TOTAL deletion-vector cardinality (manifest-known,
    * no scan) the native path will apply inline. Below it, each input
    * partition ships its own files' sorted positions and the reader
    * binary-searches them out — a bucketed 100 TB fact table under
    * targeted MoR deletes (the NORMAL production state) keeps SPJ,
    * column stats and DPP. Above it (a table-sized delete), the V1
    * bridge's distributed anti-join is the right shape anyway, and
    * [[graft.sources.ManifestTable.materializeDeletes]] the right
    * maintenance. */
  val MaxInlineDvRowsKey = "spark.graft.batchScan.maxInlineDvRows"
  val MaxInlineDvRowsDefault = 10000000L

  /** One era group's reader recipe: which required fields are directory
    * constants in its files (`sig`, indexed like the scan's required
    * schema), the PHYSICAL-name schemas its parquet reader is built
    * with, the physicalized data-column filters, and the permutation
    * from required-schema position to the reader's emitted position
    * (data columns first, then appended partition constants). */
  private[v2] final case class GroupSpec(sig: IndexedSeq[Boolean],
                                         dataSchema: StructType,
                                         requiredData: StructType,
                                         requiredPart: StructType,
                                         dataFilters: IndexedSeq[Filter],
                                         perm: IndexedSeq[Int])

  /** A [[GraftBatchScan]] when the table qualifies, else None. `st` is
    * the state the OWNING ScanBuilder resolved — one read per build,
    * shared with filter classification and aggregate planning, so the
    * whole negotiation sees a single table version. */
  def tryBuild(root: String, version: Option[Long], st: ManifestTable.State,
               pushed: Array[Filter],
               required: StructType, fullSchema: StructType,
               limit: Option[Int] = None,
               topN: Option[(String, Boolean, Int)] = None): Option[Scan] = {
    val spark = SparkSession.active
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return None
    // deletion vectors only REMOVE rows, so every optimizer-visible
    // property survives them (partitioning, superset min/max bounds,
    // DPP) — they are applied inline by the reader up to the bound
    val totalDv = st.files.flatMap(_.dv).map(_.count).sum
    val dvOk = totalDv <= spark.conf.get(MaxInlineDvRowsKey,
      MaxInlineDvRowsDefault.toString).toLong
    if (st.files.isEmpty || !dvOk) return None

    // logical → physical name mapping (rename/drop are metadata-only
    // commits; the files keep one physical schema for the table's life)
    val (ren, _) = ManifestTable.renameInfo(st.tags)
    val inv: Map[String, String] = ren.map(_.swap)
    def phys(c: String): String = inv.getOrElse(c, c)

    // bucket layout only counts when EVERY live file carries a value
    // for it (a mixed state must not report a partitioning it can't
    // honor — fall back to plain packed splits, still native)
    val bucketLayout = ManifestTable.bucketLayout(st.tags)
      .filter { case (bc, _, _) =>
        st.files.forall(_.partitionValues.get(bc).flatten.isDefined) }
    val bucketCol = bucketLayout.map(_._1)

    // the same metadata file-skipping pass as the V1 bridge
    val filterCol = pushed.toSeq.flatMap(ManifestRelationFilters.toColumn(_))
      .reduceOption(_ && _)
    val kept = (filterCol match {
      case Some(c) => ManifestTable.pruneLiveFiles(spark, root, st, c)
      case None    => st.files
    }).toIndexedSeq

    // a projected GENERATED column must be recorded on every live file:
    // a file predating the column reads its TRUE value only through the
    // V1 bridge's defining-expression repair (deriveEvolvedGenerated)
    if (st.tags.contains(ManifestTable.EvolvedTag)) {
      val gens = ManifestTable.generatedSpecs(st.tags).map(_._1).toSet
      val projectedGens = required.fieldNames.filter(gens)
      val unrecorded = projectedGens.exists(g =>
        kept.exists(f => !f.partitionValues.contains(g) && !f.stats.contains(g)))
      if (unrecorded) return None
    }

    // per-required-column classification across the kept files:
    // dir-everywhere / data-everywhere / MIXED (evolved eras). Any
    // dir-classified column must be STRING (directory values decode as
    // UTF8String constants; the engine pins layout columns to string,
    // so this is defensive) — OR a typed-tagged layout column whose
    // every kept directory value is the CANONICAL rendering of its
    // declared type (then the reader's partition constant is the parsed
    // typed value, which equals the V1 bridge's cast read-back; one
    // non-canonical value declines to the bridge, whose cast semantics
    // own the odd case). Either way the column must be UNRENAMED (dir
    // keys are the name in the path; schemaEvoCheck refuses renaming
    // live partition columns — a column renamed BEFORE becoming one is
    // the odd state this guard declines). A MIXED column's
    // data-classified files must PROVE matching in-file bytes (footer
    // stats kind: 's' for string, the type's expected kind for typed)
    // — dir constants and data values share one reader type only then.
    val typedParts = ManifestTable.partitionTypes(st.tags)
    val reqFields = required.fields.toIndexedSeq
    for (f <- reqFields) {
      val p = phys(f.name)
      val dirIn = kept.count(_.partitionValues.contains(p))
      if (dirIn > 0) {
        if (p != f.name) return None
        val mixedKind: Char = typedParts.get(f.name) match {
          case Some(t) if t == f.dataType =>
            val allCanonical = kept.forall(file =>
              file.partitionValues.get(p) match {
                case Some(Some(v)) =>
                  graft.sources.PartitionTypes.canonical(v, t).isDefined
                case _ => true // absent (mixed era) or null dir value
              })
            if (!allCanonical) return None
            GraftAggScan.expectedKind(t).getOrElse(return None)
          case Some(_) => return None // tag/schema divergence: bridge owns it
          case None =>
            if (f.dataType != StringType) return None
            's'
        }
        if (dirIn < kept.size &&
            !kept.forall(file => file.partitionValues.contains(p) ||
              file.stats.get(p).exists(_.kind == mixedKind))) return None
      }
    }

    // era groups: one reader recipe per distinct dir-signature
    def sigOf(f: ManifestTable.FileEntry): IndexedSeq[Boolean] =
      reqFields.map(rf => f.partitionValues.contains(phys(rf.name)))
    val sigs = kept.map(sigOf).distinct.sortBy(_.mkString)
    val sigId = sigs.zipWithIndex.toMap
    val pairs = kept.map(f => (f, sigId(sigOf(f))))

    val groups: IndexedSeq[GroupSpec] = sigs.map { sig =>
      val dataIdx = reqFields.indices.filterNot(sig)
      val partIdx = reqFields.indices.filter(sig)
      val requiredData = StructType(dataIdx.map(i =>
        reqFields(i).copy(name = phys(reqFields(i).name))).toArray)
      val requiredPart = StructType(partIdx.map(i => reqFields(i)).toArray)
      // the group's view of the FULL data schema (for reader-side
      // schema evolution): every logical column not a dir constant
      // here, under its physical name
      val partNames = requiredPart.fieldNames.toSet
      val dataSchema = StructType(fullSchema.fields
        .filterNot(f => partNames.contains(f.name))
        .map(f => f.copy(name = phys(f.name))))
      // only data-column filters go to parquet row-group pushdown
      // (partition-column predicates already pruned files above);
      // pushdown is an optimization — untranslatable filters drop
      val dataFilters = pushed.toIndexedSeq
        .filter(_.references.forall(r => !partNames.contains(r)))
        .flatMap(f => physicalizeFilter(f, inv))
      // emitted layout = requiredData ++ requiredPart; permutation maps
      // required-schema position -> emitted position
      val perm = reqFields.indices.map { i =>
        if (sig(i)) dataIdx.length + partIdx.indexOf(i)
        else dataIdx.indexOf(i)
      }
      GroupSpec(sig, dataSchema, requiredData, requiredPart, dataFilters, perm)
    }

    // the TopN sort key's expected stats kind, resolved once (None
    // disables the pruning — the scan stays correct, just unbounded);
    // stats are keyed by PHYSICAL name, dir-classified keys have none.
    // String keys prune too (bounds stay bounds under truncation — see
    // topNFiles; no exactness marker needed for a containment proof).
    val topNPhys = topN.flatMap { case (c, asc, n) =>
      fullSchema.fields.find(_.name == c)
        .flatMap(f => GraftAggScan.aggBoundKind(f.dataType))
        .filterNot(_ => kept.exists(_.partitionValues.contains(phys(c))))
        .map(k => (phys(c), asc, n, k))
    }
    Some(new GraftBatchScan(root, version, st, bucketLayout, pairs,
      StructType(reqFields.toArray), groups, pushed.toIndexedSeq, limit,
      topNPhys))
  }

  /** A V1 filter rewritten onto physical attribute names — what the
    * parquet row-group pushdown compares against file bytes. Finite
    * shapes only; anything unrecognized drops (pushdown is an
    * optimization, Spark re-filters above the scan). `strict` tracks
    * negation polarity: in POSITIVE polarity an And may keep just its
    * translatable conjunct (weaker predicate = superset rows = safe),
    * but under a Not that weakening INVERTS into a stronger predicate —
    * Not(a) excludes rows Not(And(a, b)) keeps — so inside any Not the
    * whole subtree must translate or the Not drops. */
  private[v2] def physicalizeFilter(f: Filter, inv: Map[String, String],
                                    strict: Boolean = false): Option[Filter] = {
    if (inv.isEmpty) return Some(f)
    import org.apache.spark.sql.sources._
    def m(a: String) = inv.getOrElse(a, a)
    f match {
      case EqualTo(a, v)            => Some(EqualTo(m(a), v))
      case EqualNullSafe(a, v)      => Some(EqualNullSafe(m(a), v))
      case GreaterThan(a, v)        => Some(GreaterThan(m(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(m(a), v))
      case LessThan(a, v)           => Some(LessThan(m(a), v))
      case LessThanOrEqual(a, v)    => Some(LessThanOrEqual(m(a), v))
      case In(a, vs)                => Some(In(m(a), vs))
      case IsNull(a)                => Some(IsNull(m(a)))
      case IsNotNull(a)             => Some(IsNotNull(m(a)))
      case StringStartsWith(a, v)   => Some(StringStartsWith(m(a), v))
      case StringEndsWith(a, v)     => Some(StringEndsWith(m(a), v))
      case StringContains(a, v)     => Some(StringContains(m(a), v))
      case And(l, r) =>
        (physicalizeFilter(l, inv, strict), physicalizeFilter(r, inv, strict)) match {
          case (Some(a), Some(b))         => Some(And(a, b))
          case (Some(a), None) if !strict => Some(a)
          case (None, Some(b)) if !strict => Some(b)
          case _ => None
        }
      case Or(l, r) =>
        (physicalizeFilter(l, inv, strict), physicalizeFilter(r, inv, strict)) match {
          case (Some(a), Some(b)) => Some(Or(a, b))
          case _ => None
        }
      case Not(c) => physicalizeFilter(c, inv, strict = true).map(Not)
      case _ => None
    }
  }

  /** Files that can hold a row of the true top-n under `ORDER BY col
    * [ASC|DESC] LIMIT n` (SQL-default null ordering), from per-file
    * stats (`col` is the PHYSICAL stats key). Soundness: X is the
    * tightest file bound for which the prefix PROVES ≥ n live rows
    * order at-or-before X (ascending: every live row of a file — nulls
    * first included — orders ≤ its max; descending: only
    * guaranteed-live NON-null rows count, since nulls order last). A
    * file is dropped only when ALL its rows provably order strictly
    * beyond X (ascending: min > X and zero nulls; descending: max < X —
    * its nulls were never candidates because the prefix proved n
    * non-null rows ahead of them). Any file without usable same-kind
    * bounds disables pruning (keep all): its rows might belong to the
    * top and its counts can't prove coverage.
    *
    * Integral kinds compare in BigDecimal; STRING keys ('s') compare in
    * Java String order — sound because 's' stats are ASCII-only by
    * collection (UTF-16 order = UTF-8 binary order there), and sound
    * WITHOUT the exactness marker: parquet bounds must bound their
    * values even when truncated, and the proof only needs bounds, not
    * values (contrast MIN/MAX-as-ANSWER, [[GraftAggScan]]). */
  private[v2] def topNFiles(files: IndexedSeq[ManifestTable.FileEntry],
                            col: String, asc: Boolean, n: Int,
                            kind: Char): IndexedSeq[ManifestTable.FileEntry] = {
    final case class B(f: ManifestTable.FileEntry, min: Any,
                       max: Any, live: Long, nonNullLive: Long,
                       nulls: Long)
    val lt: (Any, Any) => Boolean =
      if (kind == 's') (a, b) => a.asInstanceOf[String] < b.asInstanceOf[String]
      else (a, b) => a.asInstanceOf[BigDecimal] < b.asInstanceOf[BigDecimal]
    def parse(s: String): Any = if (kind == 's') s else BigDecimal(s)
    val bounds = files.map { f =>
      val cs = f.stats.get(col).getOrElse(return files)
      if (cs.kind != kind || f.rows < 0 || cs.nulls < 0 || cs.count < 0)
        return files
      val dv = f.dv.map(_.count).getOrElse(0L)
      B(f, parse(cs.min), parse(cs.max), f.rows - dv,
        math.max(0L, cs.count - cs.nulls - dv), cs.nulls)
    }
    if (asc) {
      var covered = 0L
      var x: Any = null
      val it = bounds.sortWith((a, b) => lt(a.max, b.max)).iterator
      while (covered < n && it.hasNext) {
        val b = it.next(); covered += b.live; x = b.max
      }
      if (covered < n) files // the whole table is the top-n
      else bounds.filter(b => !lt(x, b.min) || b.nulls > 0).map(_.f)
    } else {
      var covered = 0L
      var x: Any = null
      val it = bounds.sortWith((a, b) => lt(b.min, a.min)).iterator
      while (covered < n && it.hasNext) {
        val b = it.next(); covered += b.nonNullLive; x = b.min
      }
      if (covered < n) files
      else bounds.filter(b => !lt(b.max, x)).map(_.f)
    }
  }
}

final class GraftBatchScan(root: String, version: Option[Long],
                           buildState: ManifestTable.State,
                           bucketLayout: Option[(String, Seq[String], Int)],
                           initialPairs: IndexedSeq[(ManifestTable.FileEntry, Int)],
                           required: StructType,
                           groups: IndexedSeq[GraftBatchScan.GroupSpec],
                           pushed: IndexedSeq[Filter],
                           limit: Option[Int] = None,
                           topN: Option[(String, Boolean, Int, Char)] = None)
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** The live (file, era-group) set — re-pruned by [[filter]] when a
    * runtime filter (dynamic partition pruning: the build side's key
    * set arriving at execution) lands before planInputPartitions. */
  @volatile private var pairs: IndexedSeq[(ManifestTable.FileEntry, Int)] =
    initialPairs

  private def files: IndexedSeq[ManifestTable.FileEntry] = pairs.map(_._1)

  /** Runtime filters may target any scanned column: partition columns
    * prune by dir values, data columns by footer min/max + bloom — the
    * SAME conservative metadata pass as planning-time pushdown, so a
    * star-schema fact scan drops whole files for the dim keys that
    * survived the build side. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    readSchema().fieldNames.map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    // file-level re-pruning is safe under the KEY-GROUPED shape too:
    // the reported partition-value SET is frozen from the build-time
    // file list ([[buckets]]) and a fully-pruned bucket still emits an
    // empty partition under its key, so the partitioning contract never
    // shifts while a star-shaped runtime filter (DPP keys surviving a
    // broadcast dim) drops fact files wholesale. Spark re-applies every
    // filter above the scan regardless — pruning is I/O only.
    val cond = filters.toSeq.flatMap(ManifestRelationFilters.toColumn(_))
      .reduceOption(_ && _)
    cond.foreach { c =>
      // prune under the BUILD-time state's tags, never a re-read: a
      // concurrent commit could land a rename/layout era between
      // planning and the runtime filter, and interpreting this scan's
      // pinned files under the NEWER mappings could wrongly drop a file
      // whose rows Spark's re-filter can never resurrect. The metadata
      // pass physicalizes the (logical-name) predicate itself.
      val byPath = pairs.map(p => p._1.relPath -> p).toMap
      val keptNow = ManifestTable.pruneLiveFiles(spark, root,
        buildState.copy(files = files), c)
      pairs = keptNow.map(f => byPath(f.relPath)).toIndexedSeq
    }
  }

  private def spark: SparkSession = SparkSession.active

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  private def bucketCol: Option[String] = bucketLayout.map(_._1)

  /** TRANSFORM-shaped key grouping: single-source bucket layouts whose
    * SOURCE column is projected report `bucket(n, src)` (resolved as a
    * ReducibleFunction through [[GraftCatalog]]'s FunctionCatalog), so
    * the natural join shape `ON a.k = b.k` co-partitions with no
    * generated-column equality, and COMPATIBLE counts (2n fact vs n
    * dim) reduce instead of shuffling. The stored dir values ARE the
    * transform's results by derivation, re-parsed as the int partition
    * keys. Multi-source layouts keep the identity shape: Spark's
    * BucketTransform resolution binds the single-reference form, and
    * the tuple transform would resolve without a bucket count —
    * forfeiting reduction, the only thing the transform shape adds
    * over identity + the injected-conjunct rule.
    *
    * Precedence note: when BOTH the source and the stored bucket
    * column are projected, the transform shape wins — it serves the
    * key-equality joins and source-key aggregations that dominate; a
    * query keying ONLY on the stored column while also projecting the
    * source (rare — pure stored-column shapes don't project the
    * source, and stay identity-keyed) pays the Exchange it would not
    * have in r16. A RECORDED decision (BucketedJoinSpec pins both
    * directions with the measured plan), not a silent one, and
    * [[GraftBatchScan.KeyShapeKey]] is the per-session escape hatch:
    * `identity` restores the r16 shape for a stored-column-keyed
    * workload; `auto` (default) keeps the transform precedence. */
  private lazy val transformKeyed: Boolean = keyShapeConf != "identity" &&
    bucketLayout.exists {
      case (_, srcs, _) => srcs.lengthCompare(1) == 0 &&
        srcs.forall(required.fieldNames.contains) &&
        initialPairs.forall(p => bucketCol.exists(bc =>
          p._1.partitionValues(bc).get.forall(_.isDigit)))
    }

  private lazy val keyShapeConf: String = {
    val v = spark.conf.get(GraftBatchScan.KeyShapeKey, "auto")
      .toLowerCase(java.util.Locale.ROOT)
    require(v == "auto" || v == "identity",
      s"${GraftBatchScan.KeyShapeKey} must be auto|identity, got $v")
    v
  }

  /** Identity-shaped key grouping (the stored generated column itself
    * projected) — the pre-transform SPJ surface, still what multi-
    * column layouts and bucket-column aggregations ride. */
  private lazy val identityKeyed: Boolean = !transformKeyed &&
    bucketCol.exists(bc => required.fieldNames.contains(bc))

  private def keyGroupedActive: Boolean = transformKeyed || identityKeyed

  /** Live bucket values, sorted for deterministic partition ids
    * (numerically under transform keys — their reported values are
    * ints). Frozen from the BUILD-time file list: runtime filters may
    * prune files afterwards, and the reported value set must not move
    * under the planner (a fully-pruned bucket plans an empty
    * partition instead of vanishing). */
  private lazy val buckets: IndexedSeq[String] = bucketCol match {
    case Some(bc) if transformKeyed =>
      initialPairs.map(_._1.partitionValues(bc).get).distinct.sortBy(_.toInt)
    case Some(bc) =>
      initialPairs.map(_._1.partitionValues(bc).get).distinct.sorted
    case None => IndexedSeq.empty
  }

  /** The partitioning contract: `bucket(n, src)` when the source column
    * is projected (the join shape — see [[transformKeyed]]), identity
    * over the stored bucket column when only IT is projected, else
    * honest-unknown. */
  override def outputPartitioning(): Partitioning = bucketLayout match {
    case Some((_, srcs, n)) if transformKeyed =>
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(n, srcs.head)), buckets.size)
    case Some((bc, _, _)) if identityKeyed =>
      new KeyGroupedPartitioning(Array(Expressions.identity(bc)), buckets.size)
    case _ => new UnknownPartitioning(0)
  }

  private def partitionValuesRow(f: ManifestTable.FileEntry,
                                 g: GraftBatchScan.GroupSpec): GenericInternalRow = {
    // the constant is the column's INTERNAL value in its read-back type:
    // UTF8String for string layout, the canonical parse for typed layout
    // (tryBuild proved every kept value canonical, so `get` is total)
    val pv: Array[Any] = g.requiredPart.fields.map { sf =>
      f.partitionValues.get(sf.name).flatten match {
        case None => null: Any
        case Some(v) => sf.dataType match {
          case StringType => UTF8String.fromString(v): Any
          case t => graft.sources.PartitionTypes.canonical(v, t).getOrElse(
            sys.error(s"graft batch scan: non-canonical partition value " +
              s"'$v' for typed column ${sf.name} survived planning")): Any
        }
      }
    }
    new GenericInternalRow(pv)
  }

  /** Deletion-vector positions per live file (relPath-keyed, sorted),
    * loaded ONCE per execution on the driver — tryBuild capped the
    * total cardinality, so this is metadata-class I/O. Each input
    * partition ships only ITS OWN files' positions. */
  private lazy val dvPos: Map[String, Array[Long]] =
    ManifestTable.dvPositionsByFile(spark, root, files, buildState.tags)

  private def dvOf(f: ManifestTable.FileEntry): Array[Long] =
    if (f.dv.isEmpty) Array.emptyLongArray
    else dvPos.getOrElse(f.relPath, Array.emptyLongArray)

  /** Clone-source chain (empty for ordinary tables): a shallow clone's
    * inherited generation dirs live under SOURCE roots; everything
    * written since the clone lives locally. Resolution is per
    * generation dir, driver-side, cached. */
  private lazy val cloneSrcs: Seq[String] =
    ManifestTable.cloneSources(buildState.tags)

  private def asPartitionedFiles(f: ManifestTable.FileEntry, gid: Int,
                                 splitBytes: Long): Seq[PartitionedFile] = {
    val base = ManifestTable.dirBase(spark, root, cloneSrcs,
      f.relPath.takeWhile(_ != '/'))
    val path = SparkPath.fromPathString(new Path(base, f.relPath).toString)
    val pv = partitionValuesRow(f, groups(gid))
    // a DV'd file is NEVER split: its deleted positions are file-wide
    // row indexes, and the reader recovers them by counting rows off a
    // whole-file, pushdown-free read (see createReaderFactory) — a
    // split's base row index is unknowable without footer reads. DV'd
    // files are OPTIMIZE/materializeDeletes candidates anyway, so the
    // lost split parallelism is the maintenance debt, not a tax on
    // healthy tables.
    if (f.bytes <= splitBytes || f.dv.nonEmpty)
      Seq(PartitionedFile(pv, path, 0L, f.bytes, Array.empty, 0L, f.bytes, Map.empty))
    else
      (0L until f.bytes by splitBytes).map(off =>
        PartitionedFile(pv, path, off, math.min(splitBytes, f.bytes - off),
          Array.empty, 0L, f.bytes, Map.empty))
  }

  override def planInputPartitions(): Array[InputPartition] = bucketCol match {
    // key-grouped ONLY when the partitioning is actually reported
    // (bucket column projected — the join shape): one partition per
    // (bucket value, FILE), whole files only (splitting inside a file
    // group is fine — every row still carries the key — but row-group
    // splits would break the DV ordinal contract). Spark's key-grouping
    // owns the rest: by default same-key partitions COALESCE into one
    // task per live bucket (the classic SPJ shape), and with
    // spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    // .enabled the join's LARGER side keeps its per-file partitions
    // while the smaller side's groups are replicated — a hot bucket
    // becomes as many tasks as it has files instead of one straggler
    // serializing the stage (AQE skew-split can't help here: there is
    // no Exchange to split). A scan that doesn't carry the bucket
    // column gets the bin-packed splits below — key-grouping would cap
    // parallelism at the bucket count for no optimizer benefit.
    case Some(bc) if keyGroupedActive =>
      val byBucket = pairs.groupBy(_._1.partitionValues(bc).get)
      buckets.flatMap { b =>
        byBucket.get(b) match {
          // a runtime filter pruned the bucket's every file: the key
          // must still appear (frozen value set) — plan it empty
          case None => Seq(GraftBucketPartition(b, transformKeyed,
            Array.empty, Array.empty, Array.empty): InputPartition)
          case Some(fs) => fs.sortBy(_._1.relPath).map { case (f, gid) =>
            GraftBucketPartition(b, transformKeyed,
              Array(asPartitionedFiles(f, gid, Long.MaxValue).head),
              Array(dvOf(f)), Array(gid)): InputPartition
          }
        }
      }.toArray
    case _ =>
      // a pushed TopN prunes to the files that can hold a top-n row
      // (stats cutoff proof — GraftBatchScan.topNFiles); a pushed plain
      // LIMIT caps the files opened: take a prefix whose cumulative
      // live rows cover it (Spark's retained TopN/Limit above takes the
      // actual n — both are I/O bounds only). Limit truncation needs
      // every file's row count to PROVE coverage; legacy unknown-count
      // files keep the full list.
      val byPath = pairs.map(p => p._1.relPath -> p).toMap
      val ranked = topN match {
        case Some((c, asc, n, kind)) =>
          GraftBatchScan.topNFiles(files, c, asc, n, kind).map(f => byPath(f.relPath))
        case None => pairs
      }
      val bounded = limit match {
        case Some(n) if topN.isEmpty && ranked.forall(_._1.rows >= 0) =>
          var need = n.toLong
          ranked.sortBy(p => (-p._1.rows, p._1.relPath)).takeWhile { case (f, _) =>
            val take = need > 0
            need -= (f.rows - f.dv.map(_.count).getOrElse(0L))
            take
          }
        case _ => ranked
      }
      // Spark's own split sizing + bin-packing (maxPartitionBytes /
      // openCostInBytes / target parallelism) over row-group splits
      val s = spark
      val splitBytes = FilePartition.maxSplitBytes(s,
        bounded.map(_._1.bytes).sum +
          bounded.size * s.sessionState.conf.filesOpenCostInBytes)
      val withMeta = bounded.sortBy(p => (-p._1.bytes, p._1.relPath))
        .flatMap { case (f, gid) =>
          asPartitionedFiles(f, gid, splitBytes).map(pf => (pf, dvOf(f), gid)) }
      val metaByPath: Map[(String, Long), (Array[Long], Int)] =
        withMeta.map { case (pf, dv, gid) =>
          (pf.filePath.toString, pf.start) -> (dv, gid) }.toMap
      FilePartition.getFilePartitions(s, withMeta.map(_._1), splitBytes)
        .map { fp =>
          val meta = fp.files.map(pf => metaByPath((pf.filePath.toString, pf.start)))
          GraftFileGroupPartition(fp.files, meta.map(_._1), meta.map(_._2))
            : InputPartition
        }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val s = spark
    // columnar is a SCAN-level verdict, never per-partition: Spark
    // requires every input partition of a scan to agree on columnar vs
    // row reads ("Cannot mix row-based and columnar input partitions"),
    // so one DV'd file anywhere demotes the whole scan to row reads —
    // the maintenance-debt price a partially-deleted table pays until
    // OPTIMIZE/materializeDeletes, never a planning crash
    val columnar = new ParquetFileFormat().supportBatch(s, required) &&
      files.forall(_.dv.isEmpty)
    // one reader per era group — the exact reader FileSourceScanExec
    // builds: vectorized when the session + result schema allow,
    // hadoopConf broadcast inside. The RETURNING_BATCH option is the
    // format's required contract: it must equal the supportBatch
    // verdict so the reader emits batches exactly when the factory
    // advertises columnar reads.
    val readFuncs = groups.map { g =>
      new ParquetFileFormat().buildReaderWithPartitionValues(
        s, g.dataSchema, g.requiredPart, g.requiredData, g.dataFilters,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> columnar.toString),
        s.sessionState.newHadoopConf())
    }.toArray
    // DV'd files read through a SECOND reader with NO row-group
    // pushdown and whole-file (unsplit) inputs, so rows stream in exact
    // parquet order and their ordinal IS the `_metadata.row_index`
    // identity the DV records — the reader counts rows and
    // binary-searches deleted positions out inline. Pushdown is an
    // optimization only (Spark re-applies every filter above the scan),
    // so dropping it for the DV'd slice trades row-group skipping for
    // positional exactness on exactly the files that carry deletes.
    // Partitions with no DV'd file keep the columnar fast path.
    val dvFuncs =
      if (files.forall(_.dv.isEmpty)) None
      else Some(groups.map { g =>
        new ParquetFileFormat().buildReaderWithPartitionValues(
          s, g.dataSchema, g.requiredPart, g.requiredData, Seq.empty,
          Map(org.apache.spark.sql.execution.datasources.FileFormat
            .OPTION_RETURNING_BATCH -> "false"),
          s.sessionState.newHadoopConf())
      }.toArray)
    new GraftBatchReaderFactory(readFuncs, columnar, dvFuncs,
      groups.map(g => g.perm.toArray).toArray, required)
  }

  override def estimateStatistics(): Statistics = {
    val fs = files
    val bytes = fs.map(_.bytes).sum
    // EXACT live rows under deletion vectors: Σ(rows − dv.count)
    val rows = if (fs.forall(_.rows >= 0))
      Some(fs.map(f => f.rows - f.dv.map(_.count).getOrElse(0L)).sum)
    else None
    // per-column stats over the PRUNED file set, rename-mapped to
    // logical names inside (forFiles degrades honestly under DVs —
    // min/max stay superset estimates, null counts are omitted; a
    // column without uniform same-kind stats — e.g. dir-classified in
    // some era — is skipped)
    val cols = GraftColumnStats.forFiles(fs, buildState.tags, required)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
      override def columnStats(): java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = cols
    }
  }

  /** All negotiated filters (partition-column ones prune manifest
    * FILES, data-column ones push to parquet row groups) — the same
    * `PushedFilters` label the V1 surfaces print. */
  override def description(): String =
    s"graft-manifest native $root" +
      s"${version.map(v => s"@v$v").getOrElse("")}" +
      s"${bucketCol.map(bc => s" bucketed($bc, ${buckets.size})").getOrElse("")}" +
      s"${if (groups.size > 1) s" eras(${groups.size})" else ""}" +
      s"${limit.map(n => s" limit($n)").getOrElse("")}" +
      s"${topN.map { case (c, asc, n, _) =>
        s" topn($c ${if (asc) "asc" else "desc"}, $n)" }.getOrElse("")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

/** A partition that knows its parquet splits, each split's
  * deletion-vector positions (file-wide sorted row indexes; empty array
  * = no DV) and each split's era-group id — all aligned with `files`
  * by index. */
sealed trait GraftScanPartition extends InputPartition {
  def files: Array[PartitionedFile]
  def dvs: Array[Array[Long]]
  def gids: Array[Int]
}

/** One live bucket: its stored value (the partition KEY Spark groups
  * by — the transform shape reports it as the bucket-ordinal INT, the
  * identity shape as the stored string) and every parquet file holding
  * its rows. */
final case class GraftBucketPartition(bucket: String, intKey: Boolean,
                                      files: Array[PartitionedFile],
                                      dvs: Array[Array[Long]],
                                      gids: Array[Int])
    extends GraftScanPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](
      if (intKey) Int.box(bucket.toInt) else UTF8String.fromString(bucket)))
}

/** A bin-packed group of parquet splits (the non-bucketed shape). */
final case class GraftFileGroupPartition(files: Array[PartitionedFile],
                                         dvs: Array[Array[Long]],
                                         gids: Array[Int])
    extends GraftScanPartition

/** Shared row-read plumbing for the v2 reader factories (the batch
  * scan and the aggregate fold read through the same parquet reader
  * function and share its quirks). */
private[v2] object RowReads {

  /** The reader function's iterator may carry ColumnarBatch disguised
    * as InternalRow (FileScanRDD's contract) — flatten defensively. */
  def flatten(it: Iterator[InternalRow]): Iterator[InternalRow] =
    it.asInstanceOf[Iterator[Object]].flatMap {
      case b: ColumnarBatch => scala.jdk.CollectionConverters
        .IteratorHasAsScala(b.rowIterator()).asScala
      case r => Iterator.single(r)
    }.asInstanceOf[Iterator[InternalRow]]

  /** Rows of an UNSPLIT, pushdown-free file read with the deletion
    * vector's sorted positions dropped by stream ordinal (the ordinal
    * IS the parquet row index under that read shape). */
  def dvFiltered(rows: Iterator[InternalRow],
                 dv: Array[Long]): Iterator[InternalRow] =
    if (dv.isEmpty) rows
    else {
      var idx = -1L
      rows.filter { _ =>
        idx += 1L
        java.util.Arrays.binarySearch(dv, idx) < 0
      }
    }

  def asReader(it: Iterator[InternalRow]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        row = it.next(); true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

/** Ships Spark's own parquet reader functions (one per era group) to
  * executors; rows stream split-by-split. The vectorized path hands
  * back ColumnarBatches — when the schema supports it we pass them
  * through COLUMNAR (Spark plans ColumnarToRow above, same as
  * FileSourceScanExec); otherwise the row-based reader unwraps per-row.
  * A group whose emitted column order differs from the scan's required
  * order is PERMUTED in flight — columnar batches by re-wrapping the
  * column vectors (zero copy), rows through a reused
  * [[ProjectingInternalRow]] (the same reuse discipline the vectorized
  * row iterator already imposes on consumers). Partitions carrying
  * deletion vectors take `dvFuncs` — pushdown-free, whole-file row
  * readers whose streaming order makes each row's ordinal its parquet
  * row index — and binary-search deleted positions out. */
final class GraftBatchReaderFactory(
    readFuncs: Array[PartitionedFile => Iterator[InternalRow]],
    columnar: Boolean,
    dvFuncs: Option[Array[PartitionedFile => Iterator[InternalRow]]],
    perms: Array[Array[Int]],
    readSchema: StructType)
    extends PartitionReaderFactory {

  private def identity(perm: Array[Int]): Boolean = {
    var i = 0
    while (i < perm.length) { if (perm(i) != i) return false; i += 1 }
    true
  }

  // scan-level homogeneity: `columnar` is only ever true when NO file
  // in the scan carries a deletion vector (see createReaderFactory)
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GraftScanPartition]
    val anyDv = !gp.dvs.forall(_.isEmpty)
    val funcs =
      if (!anyDv) readFuncs
      else dvFuncs.getOrElse(sys.error(
        "graft batch scan: partition carries deletion vectors but the " +
          "factory was built without a DV reader"))
    // one (possibly shared) projector per era group, allocated lazily —
    // rows are consumed-or-copied by Spark above, the standard
    // vectorized-row reuse contract
    val projectors = new Array[ProjectingInternalRow](perms.length)
    val rows = gp.files.iterator.zipWithIndex.flatMap { case (f, i) =>
      val gid = gp.gids(i)
      // clean files in a mixed partition still ride the DV reader shape
      // (one reader family per partition keeps the contract simple) —
      // Spark's re-filter above the scan restores exactness
      val raw = RowReads.dvFiltered(RowReads.flatten(funcs(gid)(f)), gp.dvs(i))
      if (identity(perms(gid))) raw
      else {
        if (projectors(gid) == null)
          projectors(gid) = ProjectingInternalRow(readSchema,
            perms(gid).toIndexedSeq)
        val proj = projectors(gid)
        raw.map { r => proj.project(r); proj }
      }
    }
    RowReads.asReader(rows)
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val gp = partition.asInstanceOf[GraftScanPartition]
    new PartitionReader[ColumnarBatch] {
      private val it: Iterator[ColumnarBatch] =
        gp.files.iterator.zipWithIndex.flatMap { case (f, i) =>
          val gid = gp.gids(i)
          val raw = readFuncs(gid)(f).asInstanceOf[Iterator[Object]]
            .map(_.asInstanceOf[ColumnarBatch])
          if (identity(perms(gid))) raw
          else raw.map { b =>
            // zero-copy permutation: re-wrap the SAME column vectors in
            // required order (the source batch still owns their
            // lifecycle — this wrapper is never closed)
            val perm = perms(gid)
            val cols = Array.tabulate(perm.length)(j => b.column(perm(j)))
            new ColumnarBatch(
              cols.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
              b.numRows())
          }
        }
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        batch = it.next(); true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = ()
    }
  }
}

package graft.sources.v2

import org.apache.hadoop.fs.Path

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
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
  * The scan stays on the MATURE read semantics where it can't prove
  * them unnecessary: [[GraftBatchScan.tryBuild]] only fires when the
  * live state has no rename/drop name mapping, no clone-source chain
  * and no evolved partition spec — those fall back to the V1 bridge
  * (correct, just optimizer-opaque). Deletion vectors stay NATIVE up to
  * a bounded total cardinality: DVs only remove rows, so the reported
  * partitioning, superset column bounds and DPP all stay valid, and the
  * reader applies each file's positions inline (a bucketed fact table
  * under MoR deletes — the normal production state — keeps its
  * zero-Exchange joins). File skipping is identical to the
  * bridge: the SAME metadata pass ([[ManifestTable.pruneLiveFiles]])
  * prunes files before any scan, and pushed filters are re-applied by
  * Spark above the scan, so results never depend on pruning quality.
  *
  * Reading delegates to Spark's own vectorized parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]] — the exact
  * reader FileSourceScanExec ships), so compression, row-group
  * predicate pushdown, column pruning, additive schema evolution
  * (absent columns null-fill) and INT96 timestamps behave identically
  * to every other read in the engine. */
object GraftBatchScan {

  /** Conf gate (default on): lets an operator force the V1 bridge. */
  val EnabledKey = "spark.graft.batchScan.enabled"

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
    val simple = st.files.nonEmpty && dvOk &&
      !st.tags.contains(ManifestTable.RenameTag) &&
      !st.tags.contains(ManifestTable.DropTag) &&
      !st.tags.contains(ManifestTable.CloneSourcesTag) &&
      !st.tags.contains(ManifestTable.EvolvedTag)
    if (!simple) return None

    // bucket layout only counts when EVERY live file carries a value
    // for it (a mixed state must not report a partitioning it can't
    // honor — fall back to plain packed splits, still native)
    val bucketCol = ManifestTable.bucketLayout(st.tags).map(_._1)
      .filter(bc => st.files.forall(_.partitionValues.get(bc).flatten.isDefined))

    // the same metadata file-skipping pass as the V1 bridge
    val filterCol = pushed.toSeq.flatMap(ManifestRelationFilters.toColumn(_))
      .reduceOption(_ && _)
    val kept = filterCol match {
      case Some(c) => ManifestTable.pruneLiveFiles(spark, root, st, c)
      case None    => st.files
    }

    // the layout OF THE PINNED STATE, never the current one: a
    // time-travel read of a pre-evolution version must classify
    // data-vs-partition columns by its own era
    val partCols = ManifestTable.layoutAt(root, st)
    val partSet = partCols.toSet
    // hive partition columns come off directory names, not file bytes:
    // the reader takes them as per-file constants, so required splits
    // into (data columns read from parquet, partition columns appended)
    val requiredData = StructType(required.fields.filterNot(f => partSet(f.name)))
    val requiredPart = StructType(required.fields.filter(f => partSet(f.name)))
    // partition values are appended as per-file CONSTANTS decoded from
    // directory-name strings ([[partitionValuesRow]] emits UTF8String),
    // so the declared type of every projected layout column must BE
    // string. The engine pins them to string at every boundary
    // (createEmpty pins the recorded schema; normalizePartitionCols
    // casts every generation write), so this guard is defensive: a
    // schema that somehow carries a non-string layout column falls back
    // to the V1 bridge instead of a reader-side ClassCastException.
    if (!requiredPart.fields.forall(_.dataType ==
        org.apache.spark.sql.types.StringType)) return None
    val dataSchema = StructType(fullSchema.fields.filterNot(f => partSet(f.name)))
    // only data-column filters go to parquet row-group pushdown;
    // partition-column predicates already pruned files above
    val dataFilters = pushed.filter(_.references.forall(r => !partSet(r)))
    // the TopN sort key's expected stats kind, resolved once (None
    // disables the pruning — the scan stays correct, just unbounded)
    val topNKind = topN.flatMap { case (c, _, _) =>
      fullSchema.fields.find(_.name == c)
        .flatMap(f => GraftAggScan.expectedKind(f.dataType))
        .filterNot(_ => partSet(c)) // layout cols have no footer stats
    }
    Some(new GraftBatchScan(root, version, st, bucketCol, kept.toIndexedSeq,
      dataSchema, requiredData, requiredPart, dataFilters.toIndexedSeq,
      pushed.toIndexedSeq, limit,
      topN.zip(topNKind).map { case ((c, asc, n), k) => (c, asc, n, k) }))
  }

  /** Files that can hold a row of the true top-n under `ORDER BY col
    * [ASC|DESC] LIMIT n` (SQL-default null ordering), from per-file
    * stats. Soundness: X is the tightest file bound for which the
    * prefix PROVES ≥ n live rows order at-or-before X (ascending:
    * every live row of a file — nulls first included — orders ≤ its
    * max; descending: only guaranteed-live NON-null rows count, since
    * nulls order last). A file is dropped only when ALL its rows
    * provably order strictly beyond X (ascending: min > X and zero
    * nulls; descending: max < X — its nulls were never candidates
    * because the prefix proved n non-null rows ahead of them). Any
    * file without usable same-kind bounds disables pruning (keep all):
    * its rows might belong to the top and its counts can't prove
    * coverage. */
  private[v2] def topNFiles(files: IndexedSeq[ManifestTable.FileEntry],
                            col: String, asc: Boolean, n: Int,
                            kind: Char): IndexedSeq[ManifestTable.FileEntry] = {
    final case class B(f: ManifestTable.FileEntry, min: BigDecimal,
                       max: BigDecimal, live: Long, nonNullLive: Long,
                       nulls: Long)
    val bounds = files.map { f =>
      val cs = f.stats.get(col).getOrElse(return files)
      if (cs.kind != kind || f.rows < 0 || cs.nulls < 0 || cs.count < 0)
        return files
      val dv = f.dv.map(_.count).getOrElse(0L)
      B(f, BigDecimal(cs.min), BigDecimal(cs.max), f.rows - dv,
        math.max(0L, cs.count - cs.nulls - dv), cs.nulls)
    }
    if (asc) {
      var covered = 0L
      var x: BigDecimal = null
      val it = bounds.sortBy(_.max).iterator
      while (covered < n && it.hasNext) {
        val b = it.next(); covered += b.live; x = b.max
      }
      if (covered < n) files // the whole table is the top-n
      else bounds.filter(b => b.min <= x || b.nulls > 0).map(_.f)
    } else {
      var covered = 0L
      var x: BigDecimal = null
      val it = bounds.sortBy(-_.min).iterator
      while (covered < n && it.hasNext) {
        val b = it.next(); covered += b.nonNullLive; x = b.min
      }
      if (covered < n) files
      else bounds.filter(b => b.max >= x).map(_.f)
    }
  }
}

final class GraftBatchScan(root: String, version: Option[Long],
                           buildState: ManifestTable.State,
                           bucketCol: Option[String],
                           initialFiles: IndexedSeq[ManifestTable.FileEntry],
                           dataSchema: StructType,
                           requiredData: StructType,
                           requiredPart: StructType,
                           dataFilters: IndexedSeq[Filter],
                           pushed: IndexedSeq[Filter],
                           limit: Option[Int] = None,
                           topN: Option[(String, Boolean, Int, Char)] = None)
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** The live file set — re-pruned by [[filter]] when a runtime filter
    * (dynamic partition pruning: the build side's key set arriving at
    * execution) lands before planInputPartitions. */
  @volatile private var files: IndexedSeq[ManifestTable.FileEntry] = initialFiles

  /** Runtime filters may target any scanned column: partition columns
    * prune by dir values, data columns by footer min/max + bloom — the
    * SAME conservative metadata pass as planning-time pushdown, so a
    * star-schema fact scan drops whole files for the dim keys that
    * survived the build side. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    readSchema().fieldNames.map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    // the key-grouped (storage-partitioned join) shape must keep its
    // reported partition values stable — skip file-level re-pruning
    // there (Spark re-applies the filters above the scan regardless)
    if (bucketCol.exists(bc => requiredPart.fieldNames.contains(bc))) return
    val cond = filters.toSeq.flatMap(ManifestRelationFilters.toColumn(_))
      .reduceOption(_ && _)
    cond.foreach { c =>
      // prune under the BUILD-time state's tags, never a re-read: a
      // concurrent commit could land a rename/layout era between
      // planning and the runtime filter, and interpreting this scan's
      // pinned files under the NEWER mappings could wrongly drop a file
      // whose rows Spark's re-filter can never resurrect
      val kept = ManifestTable.pruneLiveFiles(spark, root,
        buildState.copy(files = files), c)
      files = kept.toIndexedSeq
    }
  }

  private def spark: SparkSession = SparkSession.active

  // the reader appends partition constants AFTER the parquet columns —
  // Spark reprojects to the requested order by name above the scan
  override def readSchema(): StructType =
    StructType(requiredData.fields ++ requiredPart.fields)

  override def toBatch: Batch = this

  /** Live bucket values, sorted for deterministic partition ids. */
  private lazy val buckets: IndexedSeq[String] = bucketCol match {
    case Some(bc) => files.map(_.partitionValues(bc).get).distinct.sorted
    case None     => IndexedSeq.empty
  }

  /** The partitioning contract: grouped by the bucket column when the
    * layout has one AND the projection carries it (the join shape),
    * else honest-unknown. */
  override def outputPartitioning(): Partitioning = bucketCol match {
    case Some(bc) if requiredPart.fieldNames.contains(bc) =>
      new KeyGroupedPartitioning(Array(Expressions.identity(bc)), buckets.size)
    case _ => new UnknownPartitioning(0)
  }

  private def partitionValuesRow(f: ManifestTable.FileEntry): GenericInternalRow = {
    val pv: Array[Any] = requiredPart.fieldNames.map(c =>
      (f.partitionValues.get(c).flatten.map(UTF8String.fromString).orNull): Any)
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

  private def asPartitionedFiles(f: ManifestTable.FileEntry,
                                 splitBytes: Long): Seq[PartitionedFile] = {
    val path = SparkPath.fromPathString(new Path(root, f.relPath).toString)
    val pv = partitionValuesRow(f)
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
    case Some(bc) if requiredPart.fieldNames.contains(bc) =>
      val byBucket = files.groupBy(_.partitionValues(bc).get)
      buckets.flatMap { b =>
        byBucket(b).sortBy(_.relPath).map(f =>
          GraftBucketPartition(b,
            Array(asPartitionedFiles(f, Long.MaxValue).head),
            Array(dvOf(f))): InputPartition)
      }.toArray
    case _ =>
      // a pushed TopN prunes to the files that can hold a top-n row
      // (stats cutoff proof — GraftBatchScan.topNFiles); a pushed plain
      // LIMIT caps the files opened: take a prefix whose cumulative
      // live rows cover it (Spark's retained TopN/Limit above takes the
      // actual n — both are I/O bounds only). Limit truncation needs
      // every file's row count to PROVE coverage; legacy unknown-count
      // files keep the full list.
      val ranked = topN match {
        case Some((c, asc, n, kind)) =>
          GraftBatchScan.topNFiles(files, c, asc, n, kind)
        case None => files
      }
      val bounded = limit match {
        case Some(n) if topN.isEmpty && ranked.forall(_.rows >= 0) =>
          var need = n.toLong
          ranked.sortBy(f => (-f.rows, f.relPath)).takeWhile { f =>
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
        bounded.map(_.bytes).sum +
          bounded.size * s.sessionState.conf.filesOpenCostInBytes)
      val withDv = bounded.sortBy(f => (-f.bytes, f.relPath))
        .flatMap(f => asPartitionedFiles(f, splitBytes).map(pf => (pf, dvOf(f))))
      val dvByPath: Map[(String, Long), Array[Long]] =
        withDv.map { case (pf, dv) =>
          (pf.filePath.toString, pf.start) -> dv }.toMap
      FilePartition.getFilePartitions(s, withDv.map(_._1), splitBytes)
        .map(fp => GraftFileGroupPartition(fp.files,
          fp.files.map(pf => dvByPath((pf.filePath.toString, pf.start))))
          : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val s = spark
    // columnar is a SCAN-level verdict, never per-partition: Spark
    // requires every input partition of a scan to agree on columnar vs
    // row reads ("Cannot mix row-based and columnar input partitions"),
    // so one DV'd file anywhere demotes the whole scan to row reads —
    // the maintenance-debt price a partially-deleted table pays until
    // OPTIMIZE/materializeDeletes, never a planning crash
    val columnar = new ParquetFileFormat().supportBatch(s,
      StructType(requiredData.fields ++ requiredPart.fields)) &&
      files.forall(_.dv.isEmpty)
    // the exact reader FileSourceScanExec builds: vectorized when the
    // session + result schema allow, hadoopConf broadcast inside. The
    // RETURNING_BATCH option is the format's required contract: it
    // must equal the supportBatch verdict so the reader emits batches
    // exactly when the factory advertises columnar reads.
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      s, dataSchema, requiredPart, requiredData, dataFilters,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> columnar.toString),
      s.sessionState.newHadoopConf())
    // DV'd files read through a SECOND reader with NO row-group
    // pushdown and whole-file (unsplit) inputs, so rows stream in exact
    // parquet order and their ordinal IS the `_metadata.row_index`
    // identity the DV records — the reader counts rows and
    // binary-searches deleted positions out inline. Pushdown is an
    // optimization only (Spark re-applies every filter above the scan),
    // so dropping it for the DV'd slice trades row-group skipping for
    // positional exactness on exactly the files that carry deletes.
    // Partitions with no DV'd file keep the columnar fast path.
    val dvFunc =
      if (files.forall(_.dv.isEmpty)) None
      else Some(new ParquetFileFormat().buildReaderWithPartitionValues(
        s, dataSchema, requiredPart, requiredData, Seq.empty,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        s.sessionState.newHadoopConf()))
    new GraftBatchReaderFactory(readFunc, columnar, dvFunc)
  }

  override def estimateStatistics(): Statistics = {
    val bytes = files.map(_.bytes).sum
    // EXACT live rows under deletion vectors: Σ(rows − dv.count)
    val rows = if (files.forall(_.rows >= 0))
      Some(files.map(f => f.rows - f.dv.map(_.count).getOrElse(0L)).sum)
    else None
    // per-column stats over the PRUNED file set (eligibility already
    // excluded renames; forFiles itself degrades honestly under DVs —
    // min/max stay superset estimates, null counts are omitted)
    val cols = GraftColumnStats.forFiles(files, Map.empty, requiredData)
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
      s"${limit.map(n => s" limit($n)").getOrElse("")}" +
      s"${topN.map { case (c, asc, n, _) =>
        s" topn($c ${if (asc) "asc" else "desc"}, $n)" }.getOrElse("")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

/** A partition that knows its parquet splits, plus each split's
  * deletion-vector positions (file-wide sorted row indexes; empty array
  * = no DV — aligned with `files` by index). */
sealed trait GraftScanPartition extends InputPartition {
  def files: Array[PartitionedFile]
  def dvs: Array[Array[Long]]
}

/** One live bucket: its string value (the partition KEY Spark groups
  * by) and every parquet file holding its rows. */
final case class GraftBucketPartition(bucket: String,
                                      files: Array[PartitionedFile],
                                      dvs: Array[Array[Long]])
    extends GraftScanPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(bucket)))
}

/** A bin-packed group of parquet splits (the non-bucketed shape). */
final case class GraftFileGroupPartition(files: Array[PartitionedFile],
                                         dvs: Array[Array[Long]])
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

/** Ships Spark's own parquet reader function to executors; rows stream
  * split-by-split. The vectorized path hands back ColumnarBatches —
  * when the schema supports it we pass them through COLUMNAR (Spark
  * plans ColumnarToRow above, same as FileSourceScanExec); otherwise
  * the row-based reader unwraps per-row. Partitions carrying deletion
  * vectors take `dvFunc` — a pushdown-free, whole-file row reader whose
  * streaming order makes each row's ordinal its parquet row index —
  * and binary-search deleted positions out. */
final class GraftBatchReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    columnar: Boolean,
    dvFunc: Option[PartitionedFile => Iterator[InternalRow]])
    extends PartitionReaderFactory {

  // scan-level homogeneity: `columnar` is only ever true when NO file
  // in the scan carries a deletion vector (see createReaderFactory)
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GraftScanPartition]
    if (gp.dvs.forall(_.isEmpty))
      RowReads.asReader(gp.files.iterator.flatMap(f => RowReads.flatten(readFunc(f))))
    else {
      val read = dvFunc.getOrElse(sys.error(
        "graft batch scan: partition carries deletion vectors but the " +
          "factory was built without a DV reader"))
      // clean files in a mixed partition still avoid pushdown (one
      // reader shape per partition keeps the contract simple) —
      // Spark's re-filter above the scan restores exactness
      val rows = gp.files.iterator.zip(gp.dvs.iterator).flatMap {
        case (f, dv) => RowReads.dvFiltered(RowReads.flatten(read(f)), dv)
      }
      RowReads.asReader(rows)
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val files = partition.asInstanceOf[GraftScanPartition].files
    new PartitionReader[ColumnarBatch] {
      private val it: Iterator[Object] = files.iterator.flatMap(f => readFunc(f))
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        batch = it.next().asInstanceOf[ColumnarBatch]; true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = ()
    }
  }
}

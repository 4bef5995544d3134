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
  * live state has no deletion vectors, no rename/drop name mapping and
  * no clone-source chain — anything else falls back to the V1 bridge
  * (correct, just optimizer-opaque). File skipping is identical to the
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

  /** A [[GraftBatchScan]] when the table qualifies, else None. */
  def tryBuild(root: String, version: Option[Long], pushed: Array[Filter],
               required: StructType, fullSchema: StructType): Option[Scan] = {
    val spark = SparkSession.active
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return None
    val st = (version match {
      case Some(v) => ManifestTable.stateAt(spark, root, v)
      case None    => ManifestTable.current(spark, root)
    }).getOrElse(return None)
    val simple = st.files.nonEmpty && st.files.forall(_.dv.isEmpty) &&
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
    Some(new GraftBatchScan(root, version, bucketCol, kept.toIndexedSeq,
      dataSchema, requiredData, requiredPart, dataFilters.toIndexedSeq,
      pushed.toIndexedSeq))
  }
}

final class GraftBatchScan(root: String, version: Option[Long],
                           bucketCol: Option[String],
                           initialFiles: IndexedSeq[ManifestTable.FileEntry],
                           dataSchema: StructType,
                           requiredData: StructType,
                           requiredPart: StructType,
                           dataFilters: IndexedSeq[Filter],
                           pushed: IndexedSeq[Filter])
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
      val st = (version match {
        case Some(v) => ManifestTable.stateAt(spark, root, v)
        case None    => ManifestTable.current(spark, root)
      }).getOrElse(return)
      val kept = ManifestTable.pruneLiveFiles(spark, root,
        st.copy(files = files), c)
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

  private def asPartitionedFiles(f: ManifestTable.FileEntry,
                                 splitBytes: Long): Seq[PartitionedFile] = {
    val path = SparkPath.fromPathString(new Path(root, f.relPath).toString)
    val pv = partitionValuesRow(f)
    if (f.bytes <= splitBytes)
      Seq(PartitionedFile(pv, path, 0L, f.bytes, Array.empty, 0L, f.bytes, Map.empty))
    else
      (0L until f.bytes by splitBytes).map(off =>
        PartitionedFile(pv, path, off, math.min(splitBytes, f.bytes - off),
          Array.empty, 0L, f.bytes, Map.empty))
  }

  override def planInputPartitions(): Array[InputPartition] = bucketCol match {
    // key-grouped ONLY when the partitioning is actually reported
    // (bucket column projected — the join shape): one UNSPLIT partition
    // per live bucket value, since splitting a bucket would emit
    // duplicate keys. A scan that doesn't carry the bucket column gets
    // the bin-packed splits below — key-grouping would cap parallelism
    // at the bucket count for no optimizer benefit.
    case Some(bc) if requiredPart.fieldNames.contains(bc) =>
      val byBucket = files.groupBy(_.partitionValues(bc).get)
      buckets.map { b =>
        val pfs = byBucket(b).sortBy(_.relPath)
          .map(f => asPartitionedFiles(f, Long.MaxValue).head)
        GraftBucketPartition(b, pfs.toArray): InputPartition
      }.toArray
    case _ =>
      // Spark's own split sizing + bin-packing (maxPartitionBytes /
      // openCostInBytes / target parallelism) over row-group splits
      val s = spark
      val splitBytes = FilePartition.maxSplitBytes(s,
        files.map(_.bytes).sum +
          files.size * s.sessionState.conf.filesOpenCostInBytes)
      val pfs = files.sortBy(f => (-f.bytes, f.relPath))
        .flatMap(asPartitionedFiles(_, splitBytes))
      FilePartition.getFilePartitions(s, pfs, splitBytes)
        .map(fp => GraftFileGroupPartition(fp.files): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val s = spark
    val columnar = new ParquetFileFormat().supportBatch(s,
      StructType(requiredData.fields ++ requiredPart.fields))
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
    new GraftBatchReaderFactory(readFunc, columnar)
  }

  override def estimateStatistics(): Statistics = {
    val bytes = files.map(_.bytes).sum
    val rows = if (files.forall(_.rows >= 0)) Some(files.map(_.rows).sum) else None
    // per-column stats over the PRUNED file set (eligibility already
    // excluded renames/DVs, so the fold is direct)
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
      s"${bucketCol.map(bc => s" bucketed($bc, ${buckets.size})").getOrElse("")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

/** A partition that knows its parquet splits. */
sealed trait GraftScanPartition extends InputPartition {
  def files: Array[PartitionedFile]
}

/** One live bucket: its string value (the partition KEY Spark groups
  * by) and every parquet file holding its rows. */
final case class GraftBucketPartition(bucket: String,
                                      files: Array[PartitionedFile])
    extends GraftScanPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(bucket)))
}

/** A bin-packed group of parquet splits (the non-bucketed shape). */
final case class GraftFileGroupPartition(files: Array[PartitionedFile])
    extends GraftScanPartition

/** Ships Spark's own parquet reader function to executors; rows stream
  * split-by-split. The vectorized path hands back ColumnarBatches —
  * when the schema supports it we pass them through COLUMNAR (Spark
  * plans ColumnarToRow above, same as FileSourceScanExec); otherwise
  * the row-based reader unwraps per-row. */
final class GraftBatchReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    columnar: Boolean) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[GraftScanPartition].files
    new PartitionReader[InternalRow] {
      // the function's iterator may carry ColumnarBatch disguised as
      // InternalRow (FileScanRDD's contract) — flatten defensively
      private val it: Iterator[Object] =
        files.iterator.flatMap(f =>
          readFunc(f).asInstanceOf[Iterator[Object]]).flatMap {
          case b: ColumnarBatch => scala.jdk.CollectionConverters
            .IteratorHasAsScala(b.rowIterator()).asScala
          case r => Iterator.single(r)
        }
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        row = it.next().asInstanceOf[InternalRow]; true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
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

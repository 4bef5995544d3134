package graft.sources.v2

import org.apache.hadoop.fs.Path

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ManifestRelationFilters, ManifestTable}

/** The shuffle-FREE read path for bucket-laid-out catalog tables: a real
  * DataSource-V2 [[Batch]] scan (not the V1 bridge) that reports
  * [[KeyGroupedPartitioning]] over the table's generated bucket column,
  * one input partition per live bucket value. Two tables created with
  * the same `bucket(n, c)` layout then join on `(c, c_bucket)` with ZERO
  * Exchange — Spark's storage-partitioned-join machinery
  * (`spark.sql.sources.v2.bucketing.enabled`) aligns the reported
  * partitions instead of shuffling both sides, which at 100 TB removes
  * the single largest cost of a fact-fact join. The bucket column is
  * `pmod(hash(c), n)` — Spark's own murmur3 — so equal keys provably
  * land in equal buckets on every table sharing the layout.
  *
  * The scan stays on the MATURE read semantics where it can't prove them
  * unnecessary: [[GraftBucketedScan.tryBuild]] only fires when the live
  * state has no deletion vectors, no rename/drop name mapping, and no
  * clone-source chain — anything else falls back to the V1 bridge
  * (correct, just shuffled). File skipping is identical to the bridge:
  * the SAME manifest metadata pass ([[ManifestTable.pruneLiveFiles]])
  * prunes files before any scan, and pushed filters are re-applied by
  * Spark above the scan, so results never depend on pruning quality.
  *
  * Reading delegates to Spark's own vectorized parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]] — the exact
  * reader FileSourceScanExec ships to executors), so compression,
  * predicate pushdown to row groups, column pruning, schema evolution
  * (absent columns null-fill) and INT96 timestamps behave identically
  * to every other read in the engine. */
object GraftBucketedScan {

  /** Conf gate (default on): lets an operator force the V1 bridge. */
  val EnabledKey = "spark.graft.bucketedScan.enabled"

  /** A [[GraftBucketedScan]] when the table qualifies, else None.
    *
    * Qualifies = a committed state whose tags declare a generated
    * `bucket(n, c)` column, every live file carries a value for it, and
    * the state needs none of the V1 bridge's extra machinery (deletion
    * vectors, rename/drop mapping, clone-source dir resolution). */
  def tryBuild(root: String, version: Option[Long], pushed: Array[Filter],
               required: StructType, fullSchema: StructType): Option[Scan] = {
    val spark = SparkSession.active
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return None
    val st = (version match {
      case Some(v) => ManifestTable.stateAt(spark, root, v)
      case None    => ManifestTable.current(spark, root)
    }).getOrElse(return None)
    val (bucketCol, _, _) = ManifestTable.bucketLayout(st.tags).getOrElse(return None)
    val simple = st.files.nonEmpty &&
      st.files.forall(f => f.dv.isEmpty &&
        f.partitionValues.get(bucketCol).flatten.isDefined) &&
      !st.tags.contains(ManifestTable.RenameTag) &&
      !st.tags.contains(ManifestTable.DropTag) &&
      !st.tags.contains(ManifestTable.CloneSourcesTag)
    if (!simple) return None

    // the same metadata file-skipping pass as the V1 bridge
    val filterCol = pushed.toSeq.flatMap(ManifestRelationFilters.toColumn(_))
      .reduceOption(_ && _)
    val kept = filterCol match {
      case Some(c) => ManifestTable.pruneLiveFiles(spark, root, st, c)
      case None    => st.files
    }

    val partCols = ManifestTable.partitionLayout(spark, root)
    val partSet = partCols.toSet
    // hive partition columns come off directory names, not file bytes:
    // the reader takes them as per-file constants, so required splits
    // into (data columns read from parquet, partition columns appended)
    val requiredData = StructType(required.fields.filterNot(f => partSet(f.name)))
    val requiredPart = StructType(required.fields.filter(f => partSet(f.name)))
    val dataSchema = StructType(fullSchema.fields.filterNot(f => partSet(f.name)))
    // only data-column filters go to parquet row-group pushdown;
    // partition-column predicates already pruned files above
    val dataFilters = pushed.filter(_.references.forall(r => !partSet(r)))
    Some(new GraftBucketedScan(root, version, bucketCol, kept.toIndexedSeq,
      dataSchema, requiredData, requiredPart, dataFilters.toIndexedSeq))
  }
}

final class GraftBucketedScan(root: String, version: Option[Long],
                              bucketCol: String,
                              files: IndexedSeq[ManifestTable.FileEntry],
                              dataSchema: StructType,
                              requiredData: StructType,
                              requiredPart: StructType,
                              dataFilters: IndexedSeq[Filter])
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics {

  private def spark: SparkSession = SparkSession.active

  // the reader appends partition constants AFTER the parquet columns —
  // Spark reprojects to the requested order by name above the scan
  override def readSchema(): StructType =
    StructType(requiredData.fields ++ requiredPart.fields)

  override def toBatch: Batch = this

  /** Live bucket values, sorted for deterministic partition ids. */
  private lazy val buckets: IndexedSeq[String] =
    files.map(_.partitionValues(bucketCol).get).distinct.sorted

  /** The partitioning contract: grouped by the bucket column when the
    * projection carries it (the join shape), else honest-unknown. */
  override def outputPartitioning(): Partitioning =
    if (requiredPart.fieldNames.contains(bucketCol))
      new KeyGroupedPartitioning(Array(Expressions.identity(bucketCol)),
        buckets.size)
    else new UnknownPartitioning(buckets.size)

  override def planInputPartitions(): Array[InputPartition] = {
    val byBucket = files.groupBy(_.partitionValues(bucketCol).get)
    buckets.map { b =>
      val pfs = byBucket(b).sortBy(_.relPath).map { f =>
        // partition-column constants for THIS file, in requiredPart order
        val pv: Array[Any] = requiredPart.fieldNames.map(c =>
          (f.partitionValues.get(c).flatten
            .map(UTF8String.fromString).orNull): Any)
        PartitionedFile(new GenericInternalRow(pv),
          SparkPath.fromPathString(new Path(root, f.relPath).toString),
          0L, f.bytes, Array.empty, 0L, f.bytes, Map.empty)
      }
      GraftBucketPartition(b, pfs.toArray): InputPartition
    }.toArray
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
    new GraftBucketReaderFactory(readFunc, columnar)
  }

  override def estimateStatistics(): Statistics = {
    val bytes = files.map(_.bytes).sum
    val rows = if (files.forall(_.rows >= 0)) Some(files.map(_.rows).sum) else None
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
    }
  }

  override def description(): String =
    s"graft-manifest bucketed($bucketCol) $root" +
      s"${version.map(v => s"@v$v").getOrElse("")} " +
      s"[${buckets.size} buckets, pushed: ${dataFilters.mkString(", ")}]"
}

/** One live bucket: its string value (the partition KEY Spark groups
  * by) and every parquet file holding its rows. */
final case class GraftBucketPartition(bucket: String,
                                      files: Array[PartitionedFile])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(bucket)))
}

/** Ships Spark's own parquet reader function to executors; rows stream
  * file-by-file. The vectorized path hands back ColumnarBatches — when
  * the schema supports it we pass them through COLUMNAR (Spark plans
  * ColumnarToRow above, same as FileSourceScanExec); otherwise the
  * row-based reader unwraps per-row. */
final class GraftBucketReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    columnar: Boolean) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[GraftBucketPartition].files
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
    val files = partition.asInstanceOf[GraftBucketPartition].files
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

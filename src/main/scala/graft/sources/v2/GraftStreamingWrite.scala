package graft.sources.v2

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestTable

/** `df.writeStream.toTable("graft_lake.ns.t")` — the DSv2 streaming leg
  * of the manifest write path, with the SAME exactly-once contract as
  * the `graft-manifest` format sink ([[graft.sources.ManifestSink]]):
  * each epoch commits atomically with a per-sink replay-watermark tag,
  * so checkpoint replays after a crash are recognized and skipped.
  *
  * Execution shape (the part a 1000-executor cluster cares about):
  * rows NEVER visit the driver. Each task writes its partition of the
  * micro-batch as a parquet STAGING file under the table root
  * (executor-side [[ParquetWriter]] + Spark's own [[ParquetWriteSupport]]
  * row codec — the identical bytes-on-disk codec `df.write.parquet`
  * uses), and only file paths + row counts travel in the commit
  * messages. The driver's `commit(epoch)` then re-reads the staged
  * files as an ordinary DataFrame and routes it through
  * [[ManifestTable.commitStreamAppend]] / [[commitStreamBatch]] — one
  * distributed write into a claimed generation with every table
  * invariant (schema alignment, constraints, rename mapping, change
  * feed, partition layout) enforced by the single existing choke point.
  * Only COMMITTED tasks' files are adopted: a speculative or failed
  * task attempt's file is never in the messages, and the epoch's
  * staging dir is deleted whole after commit/abort, so stray attempt
  * files cannot leak into the table.
  *
  * Modes: Append (default) and keyed upsert via
  * `.option("keys", …).option("order", …)` — exactly the format sink's
  * options. Complete mode is refused (use `foreachBatch` +
  * [[ManifestTable.write]]); Update without keys is refused by Spark
  * itself (no SupportsStreamingUpdateAsAppend).
  *
  * Replay identity: `.option("sinkId", …)`, else the checkpoint
  * location, else the streaming query id (stable across restarts of
  * the same checkpoint — Delta's txnAppId pattern).
  */
final class GraftStreamingWrite(root: String, info: LogicalWriteInfo)
    extends StreamingWrite {

  private val schema: StructType = info.schema()
  private val opts = info.options()

  private val keys: Option[Seq[String]] = Option(opts.get("keys"))
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
  private val order: Option[String] = Option(opts.get("order"))
  require(keys.isEmpty || order.nonEmpty,
    "graft streaming write: .option(\"keys\", …) requires .option(\"order\", …)")

  private val sinkId: String = Option(opts.get("sinkId"))
    .orElse(Option(opts.get("sinkid")))
    .orElse(Option(opts.get("checkpointLocation")))
    .orElse(Option(opts.get("checkpointlocation")))
    .getOrElse(info.queryId())

  // staging lives under the table root (same filesystem => cheap adopt
  // is a future option; survives driver restarts for abort-side GC).
  // "_"-prefixed so no generation/maintenance machinery ever lists it;
  // scoped by the replay identity so concurrent queries into the same
  // table at the same epoch number cannot collide.
  private val stagingBase = new Path(new Path(root, graft.sources.ManifestTable.StreamStagingDir),
    s"sink-${java.util.UUID.nameUUIDFromBytes(
      sinkId.getBytes("UTF-8")).toString.take(12)}")

  private def stagingDir(epochId: Long) =
    new Path(stagingBase, s"epoch-$epochId")

  override def createStreamingWriterFactory(
      p: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    // ParquetWriteSupport.init reads its posture from the Configuration
    // (prepareWrite parity): set the entries it requires plus the row
    // schema; everything else inherits the session's hadoop conf.
    val conf = spark.sessionState.newHadoopConf()
    val sql = spark.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    ParquetWriteSupport.setSchema(schema, conf)
    new GraftStreamWriterFactory(stagingBase.toString, new SerializableConf(conf))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = stagingDir(epochId)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      val staged = messages.collect {
        case s: StagedEpochFile if s.rows > 0 => s
      }
      if (staged.nonEmpty) {
        val batch = spark.read.schema(schema)
          .parquet(staged.map(_.path).toIndexedSeq: _*)
        val layout = ManifestTable.partitionLayout(spark, root)
        ManifestTable.retryOnConflict()(keys match {
          case Some(k) => ManifestTable.commitStreamBatch(
            spark, batch, epochId, root, k, order.get, layout, sinkId)
          case None => ManifestTable.commitStreamAppend(
            spark, batch, epochId, root, layout, sinkId)
        })
      }
    } finally fs.delete(dir, true)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = stagingDir(epochId)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(dir, true)
  }

  override def toString: String =
    s"GraftStreamingWrite[$root${keys.map(k => s" keys=${k.mkString(",")}").getOrElse("")}]"
}

/** One staged parquet file a committed task wrote: only these —
  * never a directory listing — are adopted at commit, so files from
  * failed/speculative attempts cannot enter the table. */
private[v2] final case class StagedEpochFile(path: String, rows: Long)
    extends WriterCommitMessage

/** Java-serializable Hadoop Configuration (Spark's own wrapper is
  * `private[spark]`; this is the same 10 lines). */
private[v2] final class SerializableConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[v2] final class GraftStreamWriterFactory(stagingBase: String,
                                                 conf: SerializableConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val file = new Path(new Path(stagingBase, s"epoch-$epochId"),
      f"part-$partitionId%05d-$taskId.parquet")
    new StagedParquetWriter(file, conf.value)
  }
}

/** Executor-side writer: Spark's InternalRow→parquet codec
  * ([[ParquetWriteSupport]]) behind parquet-hadoop's [[ParquetWriter]].
  * Opens LAZILY so empty partitions stage nothing. */
private[v2] final class StagedParquetWriter(file: Path, conf: Configuration)
    extends DataWriter[InternalRow] {

  private final class RowBuilder(p: Path)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](p) {
    override def self(): RowBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    if (writer == null)
      writer = new RowBuilder(file).withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY).build()
    writer.write(record)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    StagedEpochFile(file.toString, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    file.getFileSystem(conf).delete(file, false)
  }

  override def close(): Unit = ()
}

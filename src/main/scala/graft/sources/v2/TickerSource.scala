package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** T1 (SURVEY.md §2.10, §4 optional item 1): a custom DataSource V2
  * `MicroBatchStream` — the streaming realization of the reference's
  * minute-cadence HTTP poll (12_binance_fetch_minute.py), with the network
  * seam replaced by a deterministic generator (same role as the driver's
  * seeded fixtures; a production variant would fetch inside
  * [[TickerPartitionReader]]).
  *
  * Semantics: an infinite (or `totalrows`-capped) ticker of
  * (ts TIMESTAMP, price DOUBLE) rows. Each micro-batch advances the offset
  * by `rowsperbatch`; rows are pure functions of their index, so any
  * replay of any offset range yields identical data — exactly-once under
  * checkpoint recovery by construction.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.v2.TickerTableProvider")
  *   .option("rowsperbatch", 60).option("totalrows", 600)
  *   .option("startepochms", 1700000000000L).option("intervalms", 60000)
  *   .load()
  * }}}
  */
class TickerTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickerTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TickerTable(new CaseInsensitiveStringMap(properties))
}

object TickerTable {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("price", DoubleType, nullable = false)))
}

final class TickerTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_ticker"
  override def schema(): StructType = TickerTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickerTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TickerMicroBatchStream(opts)
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "graft_ticker is a streaming-only source")
      }
    }
}

final case class TickerOffset(index: Long) extends Offset {
  override def json(): String = s"""{"index":$index}"""
}

final class TickerMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val rowsPerBatch = options.getLong("rowsperbatch", 60L)
  private val totalRows = options.getLong("totalrows", Long.MaxValue)
  private val startEpochMs = options.getLong("startepochms", 1700000000000L)
  private val intervalMs = options.getLong("intervalms", 60000L)
  private val seed = options.getLong("seed", 42L)

  @volatile private var available = 0L

  override def initialOffset(): Offset = TickerOffset(0L)
  override def latestOffset(): Offset = {
    available = math.min(available + rowsPerBatch, totalRows)
    TickerOffset(available)
  }
  override def deserializeOffset(json: String): Offset =
    TickerOffset("""\d+""".r.findFirstIn(json).get.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Trigger.AvailableNow support: keep the incremental rowsPerBatch
    * progression (so watermarks advance between batches) up to the
    * totalRows cap — without this, the engine's wrapper would drain
    * everything in one batch and append-mode windows would never close. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[TickerOffset].index
    TickerOffset(math.min(s + rowsPerBatch, totalRows))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickerOffset].index
    val e = end.asInstanceOf[TickerOffset].index
    // split the range so the batch parallelizes like any other scan
    val chunks = 4L
    val step = math.max(1L, (e - s + chunks - 1) / chunks)
    (s until e by step).map { lo =>
      TickerPartition(lo, math.min(lo + step, e), startEpochMs, intervalMs, seed)
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new TickerPartitionReader(p.asInstanceOf[TickerPartition])
    }
}

final case class TickerPartition(from: Long, until: Long, startEpochMs: Long,
                                 intervalMs: Long, seed: Long) extends InputPartition

/** Row i: ts = start + i*interval; price = 100 + hash-derived walk in
  * [-5, +5]. Pure function of i — replays are identical. */
final class TickerPartitionReader(p: TickerPartition)
    extends PartitionReader[InternalRow] {
  private var i = p.from - 1
  override def next(): Boolean = { i += 1; i < p.until }
  override def get(): InternalRow = {
    val tsMicros = (p.startEpochMs + i * p.intervalMs) * 1000L
    val h = scala.util.hashing.MurmurHash3.caseClassHash((i, p.seed))
    val price = 100.0 + (h % 1000) / 100.0
    InternalRow(tsMicros, price)
  }
  override def close(): Unit = ()
}

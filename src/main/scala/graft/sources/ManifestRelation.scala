package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `ManifestTable` as a registered Spark data source — the DataFrame/SQL
  * front door over the lakehouse layer:
  *
  * {{{
  * spark.read.format("graft-manifest").load(root)                 // snapshot
  * spark.read.format("graft-manifest")
  *   .option("versionAsOf", 3).load(root)                         // time travel
  * df.write.format("graft-manifest").mode("overwrite").save(root) // write()
  * df.write.format("graft-manifest").mode("append")
  *   .option("keys", "day,id").option("order", "v")
  *   .option("partitionCols", "day").save(root)                   // upsertDedup
  * }}}
  *
  * Reads implement `PrunedFilteredScan`: Catalyst hands the data source
  * the pushable predicates, which are rebuilt as Columns and routed
  * through [[ManifestTable.readWhere]] — so a SQL `WHERE day = '…'`
  * prunes manifest FILES from metadata before any scan, exactly like the
  * programmatic API (Spark re-evaluates every filter above the source,
  * so the handled-filters contract stays trivially safe). The V1
  * relation API is deliberate, same reasoning as the streaming source:
  * batches are parquet file sets best scanned by Spark's own reader
  * (`buildScan` returns that plan's RDD), not a hand-rolled row reader.
  */
class ManifestTableProvider extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft-manifest"

  /** `df.writeStream.format("graft-manifest")` — the exactly-once sink
    * as a registered format (the same watermark machinery as
    * [[ManifestTable.streamUpsertSink]], without the foreachBatch
    * boilerplate):
    *
    * {{{
    * events.writeStream.format("graft-manifest")
    *   .option("checkpointLocation", ckpt)
    *   .option("keys", "id").option("order", "ts")    // keyed upsert…
    *   .start(root)
    * events.writeStream.format("graft-manifest")      // …or append-only
    *   .option("checkpointLocation", ckpt)
    *   .partitionBy("day")
    *   .start(root)
    * }}}
    *
    * With `keys` + `order` each micro-batch is a keyed keep-last upsert;
    * without, an O(batch) add-only append (the event-log shape — a
    * micro-batch writes its rows + a delta manifest, never touching the
    * table's live files, at any table size). Either way the batch id
    * commits atomically with the data under a per-sink watermark tag, so
    * checkpoint replays are recognized and skipped: end-to-end
    * exactly-once on top of foreachBatch-equivalent at-least-once
    * delivery. `sinkId` defaults to the checkpoint location (stable
    * across restarts of the same checkpoint — exactly the replay-window
    * identity the watermark needs); set it explicitly when RE-CREATING a
    * checkpoint so the fresh batch-0 stream is not mistaken for replays. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val r = root(parameters)
    val keys = parameters.get("keys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val order = parameters.get("order")
    require(keys.isEmpty || order.nonEmpty,
      "graft-manifest sink: .option(\"keys\", …) requires .option(\"order\", …)")
    val partCols =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitioncols").orElse(parameters.get("partitionCols"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val sinkId = parameters.get("sinkid").orElse(parameters.get("sinkId"))
      .orElse(parameters.get("checkpointlocation"))
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(sys.error("graft-manifest sink: set .option(\"sinkId\", …) " +
        "or a checkpointLocation (the replay-watermark identity)"))
    val autoCompactEvery = parameters.get("autocompactevery")
      .orElse(parameters.get("autoCompactEvery")).map(_.trim.toInt).getOrElse(0)
    new ManifestSink(r, keys, order, partCols, sinkId, autoCompactEvery)
  }

  /** The table root: a `path` (`.load(root)`/`.save(root)`), or a
    * catalog NAME via `.option("table", "graft_lake.ns.t")` — resolved
    * through the session's graft catalog, so format-based reads, batch
    * writes, and the exactly-once streaming sink all address named
    * tables (the name must exist: a typo must not invent a directory). */
  private def root(parameters: Map[String, String]): String = {
    val table = parameters.get("table")
    parameters.get("path") match {
      case Some(p) =>
        require(table.isEmpty, "graft-manifest: 'path' and 'table' are exclusive")
        p
      case None => table.map(graft.sources.v2.GraftCatalog.resolveName(_))
        .getOrElse(sys.error("graft-manifest: 'path' (use .load(root)/" +
          ".save(root)/.start(root)) or .option(\"table\", \"catalog.ns.t\") is required"))
    }
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val r = root(parameters)
    val tsAsOf = parameters.get("timestampasof").orElse(parameters.get("timestampAsOf"))
      .map { raw =>
        // epoch millis, an ISO-ish timestamp literal, or a bare date
        val t = raw.trim.replace('T', ' ')
        scala.util.Try(t.toLong)
          .orElse(scala.util.Try(java.sql.Timestamp.valueOf(t).getTime))
          .getOrElse(java.sql.Date.valueOf(t).getTime)
      }
    val explicitVersion = parameters.get("versionasof")
      .orElse(parameters.get("versionAsOf")).map(_.trim.toLong)
    require(explicitVersion.isEmpty || tsAsOf.isEmpty,
      "graft-manifest: versionAsOf and timestampAsOf are exclusive")
    val version = explicitVersion.orElse(tsAsOf.map { ms =>
      ManifestTable.versionAtTime(sqlContext.sparkSession, r, ms).getOrElse(
        sys.error(s"graft-manifest: $r has no commit at or before $ms"))
    })
    val changesFrom = parameters.get("changesfrom").orElse(parameters.get("changesFrom"))
      .map(_.trim.toLong)
    val feedFrom = parameters.get("feedfrom").orElse(parameters.get("feedFrom"))
      .map(_.trim.toLong)
    require(changesFrom.isEmpty || feedFrom.isEmpty,
      "graft-manifest: changesFrom and feedFrom are exclusive")
    (changesFrom, feedFrom) match {
      case (Some(from), _) =>
        require(version.isEmpty, "graft-manifest: changesFrom and versionAsOf/timestampAsOf are exclusive")
        val to = parameters.get("changesto").orElse(parameters.get("changesTo"))
          .map(_.trim.toLong)
          .orElse(ManifestTable.currentVersion(sqlContext.sparkSession, r))
          .getOrElse(sys.error(s"graft-manifest: $r has no committed version"))
        new ManifestChangesRelation(sqlContext, r, from, to)
      case (_, Some(from)) =>
        require(version.isEmpty, "graft-manifest: feedFrom and versionAsOf/timestampAsOf are exclusive")
        val to = parameters.get("feedto").orElse(parameters.get("feedTo"))
          .map(_.trim.toLong)
          .orElse(ManifestTable.currentVersion(sqlContext.sparkSession, r))
          .getOrElse(sys.error(s"graft-manifest: $r has no committed version"))
        new ManifestFeedRelation(sqlContext, r, from, to)
      case _ => new ManifestRelation(sqlContext, r, version)
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val r = root(parameters)
    val partitionCols = parameters.get("partitioncols").orElse(parameters.get("partitionCols"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val exists = ManifestTable.currentVersion(sqlContext.sparkSession, r).isDefined
    mode match {
      case SaveMode.Overwrite =>
        ManifestTable.write(data, r, partitionCols)
      case SaveMode.ErrorIfExists =>
        if (exists) sys.error(s"graft-manifest: $r already exists (mode=ErrorIfExists)")
        ManifestTable.write(data, r, partitionCols)
      case SaveMode.Ignore =>
        if (!exists) ManifestTable.write(data, r, partitionCols)
      case SaveMode.Append =>
        val keys = parameters.get("keys").map(_.split(',').map(_.trim).toSeq)
          .getOrElse(sys.error(
            "graft-manifest append is a keyed upsert: set .option(\"keys\", \"k1,k2\") " +
              "and .option(\"order\", \"col\")"))
        val order = parameters.getOrElse("order", sys.error(
          "graft-manifest append requires .option(\"order\", \"col\") (keep-last tiebreak)"))
        val mergeSchema = parameters.get("mergeschema").orElse(parameters.get("mergeSchema"))
          .exists(_.trim.equalsIgnoreCase("true"))
        ManifestTable.upsertWithRetry(sqlContext.sparkSession, data, r, keys, order,
          partitionCols, mergeSchema = mergeSchema)
    }
    new ManifestRelation(sqlContext, r, None)
  }
}

/** The V1 sink behind `writeStream.format("graft-manifest")` — see
  * [[ManifestTableProvider.createSink]] for semantics. Single-writer
  * per (table, sinkId): the streaming query serializes its own batches;
  * a concurrent OTHER writer surfaces as ConcurrentCommitException and
  * fails the query loudly rather than losing either side's commit. */
final class ManifestSink(root: String, keys: Option[Seq[String]],
                         order: Option[String], partitionCols: Seq[String],
                         sinkId: String, autoCompactEvery: Int)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is flagged isStreaming — rebind the planned
    // incremental execution as a batch frame (fixed lineage) so the
    // upsert/append machinery can run ordinary actions over it
    val batch = org.apache.spark.sql.graftshim.SessionIsolation.batchFrame(data)
    val spark = batch.sparkSession
    val applied = keys match {
      case Some(k) => ManifestTable.commitStreamBatch(spark, batch, batchId,
        root, k, order.get, partitionCols, sinkId)
      case None => ManifestTable.commitStreamAppend(spark, batch, batchId,
        root, partitionCols, sinkId)
    }
    // auto-OPTIMIZE cadence, best-effort (same contract as
    // streamUpsertSink): a lost CAS race defers the small-file debt
    if (applied && autoCompactEvery > 0 && batchId % autoCompactEvery == 0)
      try ManifestTable.compactSmallFiles(spark, root)
      catch { case _: ManifestTable.ConcurrentCommitException => () }
  }

  override def toString: String =
    s"ManifestSink[$root${keys.map(k => s" keys=${k.mkString(",")}").getOrElse("")}]"
}

final class ManifestRelation(val sqlContext: SQLContext, val root: String,
                             val version: Option[Long])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark = sqlContext.sparkSession

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` (Spark routes both through
    * `InsertIntoDataSourceCommand` after aligning + casting `data` to
    * [[schema]]): INTO is [[ManifestTable.append]] — an O(batch)
    * add-only delta commit, CAS-retried — and OVERWRITE is a full
    * [[ManifestTable.write]] preserving the table's partition layout. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(version.isEmpty,
      s"graft-manifest: cannot INSERT into a time-traveled snapshot of $root")
    if (overwrite)
      ManifestTable.write(data, root, ManifestTable.partitionLayout(spark, root))
    else
      ManifestTable.retryOnConflict()(ManifestTable.append(spark, data, root))
  }

  private def snapshot: DataFrame = version match {
    case Some(v) => ManifestTable.readVersion(spark, root, v)
    case None    => ManifestTable.read(spark, root)
  }

  override val schema: StructType = snapshot.schema

  /** Catalyst sizing from manifest metadata (live file bytes at the
    * resolved version) instead of `BaseRelation`'s pessimistic
    * `defaultSizeInBytes` (Long.Max-ish): without this a small manifest
    * dimension joined through the SQL surface would NEVER auto-broadcast
    * and every star join would sort-merge — the single biggest plan
    * regression SQL users could hit vs the programmatic path. Parquet
    * bytes are compressed, so this UNDERestimates the in-memory side the
    * way Spark's own file relations do — the same broadcast-threshold
    * calculus applies. */
  override def sizeInBytes: Long = {
    val st = version match {
      case Some(v) => ManifestTable.stateAt(spark, root, v)
      case None    => ManifestTable.current(spark, root)
    }
    st.map(_.files.map(_.bytes).sum).getOrElse(super.sizeInBytes)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val pruned = filters.flatMap(ManifestRelationFilters.toColumn(_)).reduceOption(_ && _) match {
      case Some(f) => version match {
        case Some(v) => ManifestTable.readVersionWhere(spark, root, v, f)
        case None    => ManifestTable.readWhere(spark, root, f)
      }
      case None => snapshot
    }
    // positional row contract: exactly the required columns (a
    // COUNT(*)-style scan asks for none — empty rows, correct count)
    pruned.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  override def toString: String =
    s"ManifestRelation[$root${version.map(v => s"@v$v").getOrElse("")}]"
}

private[sources] object ManifestRelationFilters {
  /** Source filters → a Column that is EQUAL TO OR WEAKER THAN the
    * original filter — readWhere applies it to ROWS, so a stricter
    * conversion would lose rows Spark's re-filter above cannot
    * resurrect. Weaker is always safe (Spark re-applies every filter
    * above the source); it only costs pruning opportunity. AND may keep
    * either convertible half (weaker); OR needs both halves (weak
    * halves still weaken the whole); NOT flips strictness, so its child
    * must convert EXACTLY — under `exact`, partial AND conversion is
    * refused. */
  def toColumn(f: Filter, exact: Boolean = false): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs) if vs.nonEmpty => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case And(l, r) => (toColumn(l, exact), toColumn(r, exact)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, two)         => if (exact) None else one.orElse(two)
    }
    case Or(l, r) =>
      for { a <- toColumn(l, exact); b <- toColumn(r, exact) } yield a || b
    case Not(child) => toColumn(child, exact = true).map(!_)
    case _ => None
  }
}

/** Batch view of an incremental window — `option("changesFrom", v)`
  * (exclusive) with optional `changesTo` (inclusive; default = current
  * head): [[ManifestTable.readChanges]] behind the same pushdown
  * surface, so a SQL consumer can express "what changed since v, where
  * …" and still prune files ([[ManifestTable.readChangesWhere]]). */
final class ManifestChangesRelation(val sqlContext: SQLContext, root: String,
                                    fromVersion: Long, toVersion: Long)
    extends BaseRelation with PrunedFilteredScan {
  private def spark = sqlContext.sparkSession

  override val schema: StructType =
    ManifestTable.readChanges(spark, root, fromVersion, toVersion).schema

  /** Sized from the window's CHANGED bytes, not the table's — an
    * incremental hop's window is usually a sliver of the table, and
    * correct sizing is what lets the downstream join broadcast it. */
  override def sizeInBytes: Long = {
    val changed = ManifestTable.changedFiles(spark, root, fromVersion, toVersion)
    if (changed.isEmpty) 0L else changed.map(_.bytes).sum
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val base = filters.flatMap(ManifestRelationFilters.toColumn(_)).reduceOption(_ && _) match {
      case Some(f) => ManifestTable.readChangesWhere(spark, root, fromVersion, toVersion, f)
      case None    => ManifestTable.readChanges(spark, root, fromVersion, toVersion)
    }
    base.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  override def toString: String =
    s"ManifestChangesRelation[$root ($fromVersion, $toVersion]]"
}

/** Batch view of the row-level change feed — `option("feedFrom", v)`
  * (exclusive) with optional `feedTo` (inclusive; default = head):
  * [[ManifestTable.readChangeFeed]] as a relation, so a SQL CDC
  * consumer can say "what changed since v, row by row, with
  * `_change_type`" straight from `spark.read.format("graft-manifest")`. */
final class ManifestFeedRelation(val sqlContext: SQLContext, root: String,
                                 fromVersion: Long, toVersion: Long)
    extends BaseRelation with TableScan {
  private def spark = sqlContext.sparkSession

  override val schema: StructType =
    ManifestTable.readChangeFeed(spark, root, fromVersion, toVersion).schema

  override def buildScan(): RDD[Row] =
    ManifestTable.readChangeFeed(spark, root, fromVersion, toVersion).rdd

  override def toString: String =
    s"ManifestFeedRelation[$root ($fromVersion, $toVersion]]"
}

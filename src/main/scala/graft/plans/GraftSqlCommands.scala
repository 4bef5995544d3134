package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSession}

import graft.sources.ManifestTable

/** Lakehouse maintenance as FIRST-CLASS SQL, the Delta-utility grammar
  * re-expressed through Spark's public extension point: a delegating
  * [[ParserInterface]] (injected via `GraftExtensions`) intercepts the
  * `GRAFT …` prefix and plans each statement as a [[LeafRunnableCommand]]
  * — everything else passes to Spark's own parser untouched.
  *
  * {{{
  *   GRAFT HISTORY 'path'                  -- DESCRIBE HISTORY
  *   GRAFT DETAIL 'path'                   -- DESCRIBE DETAIL
  *   GRAFT STATS 'path'                    -- metadata-only column stats
  *   GRAFT VACUUM 'path' [KEEP n]          -- version-count retention
  *   GRAFT RESTORE 'path' TO VERSION n     -- auditable rollback
  *   GRAFT COMPACT 'path' [TARGET mb]      -- sized rewrite
  * }}}
  *
  * Commands run on the driver against the manifest log (metadata ops)
  * or launch the usual distributed rewrite jobs (compact) — the SQL
  * layer adds no execution machinery of its own.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Prefix = """(?is)^\s*GRAFT\s+(.*?)\s*;?\s*$""".r
  private val History = """(?is)HISTORY\s+'([^']+)'""".r
  private val Detail  = """(?is)DETAIL\s+'([^']+)'""".r
  private val Stats   = """(?is)STATS\s+'([^']+)'""".r
  private val Vacuum  = """(?is)VACUUM\s+'([^']+)'(?:\s+KEEP\s+(\d+))?""".r
  private val Restore = """(?is)RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)""".r
  private val Compact = """(?is)COMPACT\s+'([^']+)'(?:\s+TARGET\s+(\d+))?""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Prefix(body) => body match {
      case History(p) => GraftHistoryCommand(p)
      case Detail(p)  => GraftDetailCommand(p)
      case Stats(p)   => GraftStatsCommand(p)
      case Vacuum(p, keep) =>
        GraftVacuumCommand(p, Option(keep).map(_.toInt).getOrElse(2))
      case Restore(p, v) => GraftRestoreCommand(p, v.toLong)
      case Compact(p, mb) =>
        GraftCompactCommand(p, Option(mb).map(_.toInt).getOrElse(512))
      case other => sys.error(
        s"GRAFT statement not recognized: '$other' — expected HISTORY | DETAIL | " +
          "STATS | VACUUM [KEEP n] | RESTORE … TO VERSION n | COMPACT [TARGET mb]")
    }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private object GraftCommandOutput {
  def attrs(schema: StructType): Seq[Attribute] =
    schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
}

final case class GraftHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("version", LongType, false), StructField("op", StringType, true),
    StructField("kind", StringType, false), StructField("files_listed", LongType, false),
    StructField("removes", LongType, true), StructField("commit_time", TimestampType, false))))
  override def run(spark: SparkSession): Seq[Row] =
    ManifestTable.history(spark, root).collect().toSeq
}

final case class GraftDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("location", StringType, false), StructField("version", LongType, false),
    StructField("num_files", LongType, false), StructField("size_bytes", LongType, false),
    StructField("num_generations", LongType, false),
    StructField("partition_columns", StringType, false),
    StructField("num_partitions", LongType, false),
    StructField("constraints", StringType, false),
    StructField("num_dv_files", LongType, false),
    StructField("num_deleted_rows", LongType, false),
    StructField("num_rows", LongType, true))))
  override def run(spark: SparkSession): Seq[Row] =
    ManifestTable.detail(spark, root).collect().toSeq
}

final case class GraftStatsCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("column", StringType, false), StructField("value_count", LongType, true),
    StructField("null_count", LongType, true), StructField("kind", StringType, true),
    StructField("min", StringType, true), StructField("max", StringType, true))))
  override def run(spark: SparkSession): Seq[Row] =
    ManifestTable.statsOnly(spark, root).collect().toSeq
}

final case class GraftVacuumCommand(root: String, keep: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("reclaimed_dirs", IntegerType, false))))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.vacuum(spark, root, keep = keep, deleteOrphans = true)))
}

final case class GraftRestoreCommand(root: String, version: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("restored_to", LongType, false), StructField("new_version", LongType, false))))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(version, ManifestTable.restore(spark, root, version)))
}

final case class GraftCompactCommand(root: String, targetMB: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.attrs(StructType(Seq(
    StructField("new_version", LongType, false))))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.compact(spark, root, targetFileMB = targetMB)))
}

package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, OverwritePartitionsDynamic, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
import org.apache.spark.sql.types.TimestampType

import graft.sources.{ManifestChangesRelation, ManifestFeedRelation, ManifestRelation, ManifestTable}
import graft.sources.v2.GraftTable

/** Makes manifest tables first-class SQL relations — the Delta-style
  * `format.`path`` surface, resolved by an injected analyzer rule
  * instead of a catalog entry, so ANY statement the delegate parser
  * produces can name a table by its root:
  *
  * {{{
  * SELECT * FROM graft.`/data/orders` WHERE day = '2026-08-14'
  * SELECT * FROM graft.`/data/orders` FOR VERSION AS OF 3
  * SELECT * FROM graft.`/data/orders` FOR TIMESTAMP AS OF '2026-08-01 12:00:00'
  * INSERT INTO graft.`/data/orders` SELECT ...      -- O(batch) append commit
  * INSERT OVERWRITE graft.`/data/orders` SELECT ... -- full rewrite
  * SELECT * FROM graft_changes.`/data/orders@3`     -- rows added in (3, head]
  * SELECT * FROM graft_feed.`/data/orders@3:5`      -- CDF rows, (3, 5]
  * }}}
  *
  * The relation is the SAME [[ManifestRelation]] the read path uses, so
  * SQL reads inherit its file pruning ([[ManifestTable.readWhere]]:
  * partition values, footer min/max, bloom indexes, deletion vectors)
  * and its column pruning — `WHERE day = …` on a 100 TB table plans
  * from manifest metadata, not a listing. Inserts resolve through
  * Spark's own `PreprocessTableInsertion` (column alignment, implicit
  * casts, BY NAME) onto [[ManifestRelation.insert]].
  *
  * The namespace is claimed narrowly: exactly two name parts, the first
  * `graft` (case-insensitive), the second containing a `/` — a real
  * catalog table `graft.t` or a CTE named `graft` never matches. Time
  * travel resolves the version EAGERLY at analysis (a literal is
  * required, matching Spark's own time-travel contract) so the plan
  * pins a snapshot, not a clock read. */
class GraftRelationResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftPath(parts: Seq[String]): Option[String] = parts match {
    case Seq(ns, p) if ns.equalsIgnoreCase("graft") && p.contains("/") => Some(p)
    case _ => None
  }

  /** `path@from` (exclusive, to = current) or `path@from:to` inside the
    * backticks of the incremental namespaces. */
  private val WindowSpec = """(.+)@(\d+)(?::(\d+))?""".r

  /** Incremental windows as relations: `graft_changes.`/t@3`` = rows
    * added in versions (3, current]; `graft_feed.`/t@3:5`` = the CDF's
    * row-level changes with `_change_type`/`_commit_version`. The `to`
    * bound defaults to the CURRENT version, resolved eagerly at
    * analysis like time travel — the plan pins a window, not a clock
    * read. Same relations as the `changesFrom`/`feedFrom` reader
    * options, so SQL inherits their pushdown pruning and
    * changed-bytes sizing. */
  private def windowRelation(parts: Seq[String]): Option[LogicalRelation] = parts match {
    case Seq(ns, WindowSpec(p, from, to)) if p.contains("/") &&
        (ns.equalsIgnoreCase("graft_changes") || ns.equalsIgnoreCase("graft_feed")) =>
      val toV = Option(to).map(_.toLong).orElse(
        ManifestTable.currentVersion(spark, p)).getOrElse(
        sys.error(s"$ns: $p has no committed version"))
      val rel =
        if (ns.equalsIgnoreCase("graft_changes"))
          new ManifestChangesRelation(spark.sqlContext, p, from.toLong, toV)
        else new ManifestFeedRelation(spark.sqlContext, p, from.toLong, toV)
      Some(LogicalRelation(rel, isStreaming = false))
    case _ => None
  }

  private def optBool(o: org.apache.spark.sql.util.CaseInsensitiveStringMap,
                      key: String): Boolean =
    o.containsKey(key.toLowerCase) && o.get(key.toLowerCase).trim
      .equalsIgnoreCase("true")

  private def optLong(o: org.apache.spark.sql.util.CaseInsensitiveStringMap,
                      key: String): Option[Long] =
    Option(o.get(key.toLowerCase)).map(v => scala.util.Try(v.trim.toLong)
      .getOrElse(sys.error(s"graft catalog: option '$key' must be a " +
        s"version number, got '$v'")))

  private def relation(path: String, version: Option[Long]): LogicalRelation =
    LogicalRelation(new ManifestRelation(spark.sqlContext, path, version),
      isStreaming = false)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // RelationTimeTravel is an unresolved LEAF (its relation is a field,
    // not a child), so the bare-relation case below can never rewrite
    // the inner node out from under this one.
    // InsertIntoStatement holds its target as a FIELD (children = query
    // only), so the bare-relation case never reaches it — rewrite the
    // field explicitly once the query side is resolvable; Spark's own
    // PreprocessTableInsertion then aligns/casts onto the
    // InsertableRelation.
    case i: InsertIntoStatement => i.table match {
      case u: UnresolvedRelation if graftPath(u.multipartIdentifier).isDefined =>
        i.copy(table = relation(graftPath(u.multipartIdentifier).get, None))
      case _ => i
    }
    case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
        if graftPath(u.multipartIdentifier).isDefined && ts.forall(_.resolved) =>
      val p = graftPath(u.multipartIdentifier).get
      val v: Long = (ver, ts) match {
        case (Some(s), _) =>
          scala.util.Try(s.trim.toLong).getOrElse(
            sys.error(s"graft time travel: VERSION AS OF takes a numeric " +
              s"manifest version, got '$s'"))
        case (_, Some(expr)) =>
          val cast = Cast(expr, TimestampType,
            Option(spark.sessionState.conf.sessionLocalTimeZone))
          require(cast.foldable,
            s"graft time travel: TIMESTAMP AS OF must be a literal, got $expr")
          val micros = cast.eval(null)
          require(micros != null,
            s"graft time travel: TIMESTAMP AS OF evaluates to NULL: $expr")
          // floorDiv, not truncating division: pre-1970 micros round
          // toward zero under `/`, so this surface and GraftCatalog's
          // loadTable (which floorDivs) could resolve DIFFERENT versions
          // for the same instant
          val ms = Math.floorDiv(micros.asInstanceOf[Long], 1000L)
          ManifestTable.versionAtTime(spark, p, ms).getOrElse(
            sys.error(s"graft time travel: $p has no commit at or before $expr"))
        case _ =>
          sys.error("graft time travel: VERSION AS OF or TIMESTAMP AS OF required")
      }
      relation(p, Some(v))
    case u: UnresolvedRelation if graftPath(u.multipartIdentifier).isDefined =>
      relation(graftPath(u.multipartIdentifier).get, None)
    case u: UnresolvedRelation if windowRelation(u.multipartIdentifier).isDefined =>
      windowRelation(u.multipartIdentifier).get

    // `spark.read.option("readChangeFeed", true).table("graft_lake.ns.t")`
    // — the Delta-shaped BATCH CDF surface by catalog name. Version
    // bounds are INCLUSIVE Delta-style: [startingVersion,
    // endingVersion (default: head)]. The feed's two extra columns
    // cannot ride the catalog table's schema, so the relation is
    // rewritten onto the same V1 feed relation the format/path surfaces
    // use: catalog attributes re-alias by name (ids preserved for
    // downstream resolution), the feed columns join with fresh ids.
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
        optBool(r.options, "readChangeFeed") =>
      val t = r.table.asInstanceOf[GraftTable]
      require(!r.options.containsKey("versionasof") &&
          !r.options.containsKey("timestampasof"),
        "graft catalog CDF: readChangeFeed and versionAsOf/timestampAsOf " +
          "are exclusive (the feed IS a version window)")
      val from = optLong(r.options, "startingVersion").getOrElse(sys.error(
        "graft catalog CDF: .option(\"startingVersion\", n) is required " +
          "(inclusive — changes OF version n are the window's first rows)"))
      val to = optLong(r.options, "endingVersion")
        .orElse(ManifestTable.currentVersion(spark, t.root)).getOrElse(
          sys.error(s"graft catalog CDF: ${t.root} has no committed version"))
      val rel = LogicalRelation(
        new ManifestFeedRelation(spark.sqlContext, t.root, from - 1, to),
        isStreaming = false)
      val byName = rel.output.map(a => a.name -> a).toMap
      val kept = r.output.map { a =>
        val src = byName.getOrElse(a.name, sys.error(
          s"graft catalog CDF: the feed window lacks column '${a.name}' " +
            "(added after the window? read the snapshot instead)"))
        Alias(src, a.name)(exprId = a.exprId)
      }
      val feedCols = rel.output.filter(a =>
        a.name == ManifestTable.ChangeTypeCol ||
          a.name == ManifestTable.CommitVersionCol)
      Project(kept ++ feedCols, rel)

    // NOTE: `.option("versionAsOf"/"timestampAsOf", …).table(name)`
    // needs no rule here — Spark 4 consumes those reader options
    // natively (TimeTravelSpec.fromOptions) and resolves the pinned
    // version through GraftCatalog.loadTable(ident, version/timestamp).
    // `INSERT OVERWRITE` on a graft_lake catalog table under Spark's
    // DYNAMIC partition-overwrite mode: Spark's physical dynamic
    // overwrite demands a native V2 BatchWrite (the V1 write bridge
    // cannot carry it), so — Delta's move — rewrite the resolved plan
    // onto a command that runs ManifestTable.replacePartitions: replaced
    // partitions retire, untouched partitions carry forward by
    // reference. Waits for outputResolved so Spark's own column
    // alignment/casting (by name or position) has already happened.
    // `spark.readStream.table("graft_lake.ns.t")` — the V2 catalog table
    // carries no MicroBatchStream (a DSv2 partition reader would have to
    // re-implement parquet decoding by hand; see ManifestStream's design
    // note), so rewrite the streaming relation onto the V1 incremental
    // source the format-based API uses. Reader options (startingversion,
    // maxversionsperbatch) pass through; the source's scan-order output
    // re-aliases onto the catalog node's attribute ids so downstream
    // resolution is undisturbed.
    // With `.option("readChangeFeed", true)` the source runs in feed
    // mode — each micro-batch carries the row-level CDF. The feed's two
    // extra columns cannot ride the catalog node's schema, so they join
    // the projection with fresh ids (downstream references resolve
    // against them by name).
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] =>
      val t = s.table.asInstanceOf[GraftTable]
      import scala.jdk.CollectionConverters._
      val user = s.extraOptions.asScala.toMap
      val feed = user.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.trim.equalsIgnoreCase("true")
      }
      val ds = DataSource(spark, className = "graft-manifest-changes",
        options = user + ("path" -> t.root))
      val rel = StreamingRelation(ds)
      val byName = rel.output.map(a => a.name -> a).toMap
      val kept = s.output.map { a =>
        val src = byName.getOrElse(a.name, sys.error(
          s"graft catalog streaming: source lacks column '${a.name}'"))
        Alias(src, a.name)(exprId = a.exprId)
      }
      val feedCols =
        if (!feed) Nil
        else rel.output.filter(a =>
          a.name == ManifestTable.ChangeTypeCol ||
            a.name == ManifestTable.CommitVersionCol)
      Project(kept ++ feedCols, rel)

    case o: OverwritePartitionsDynamic
        if o.query.resolved && o.outputResolved && (o.table match {
          case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
          case _ => false
        }) =>
      val root = o.table.asInstanceOf[DataSourceV2Relation]
        .table.asInstanceOf[GraftTable].root
      GraftDynamicOverwriteCommand(root, o.query)
  }
}

/** `INSERT OVERWRITE <graft_lake table>` under dynamic mode, as a
  * driver-side command: evaluates the (already aligned) query and
  * commits one partition-replacing delta — O(batch + retired entries)
  * however large the table. */
final case class GraftDynamicOverwriteCommand(root: String,
                                              query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    ManifestTable.retryOnConflict()(
      ManifestTable.replacePartitions(session,
        org.apache.spark.sql.graftshim.SessionIsolation.planFrame(session, query),
        root))
    Seq.empty
  }
}

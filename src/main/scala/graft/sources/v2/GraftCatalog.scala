package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.ManifestTable

/** Manifest tables as a Spark `TableCatalog` — the Delta/Iceberg-shaped
  * front door. Registered by [[graft.core.GraftSession]] as
  * `spark.sql.catalog.graft_lake`, it makes the lakehouse tier fully
  * first-class in ANSI SQL, through Spark's OWN resolution/DDL/DML
  * machinery rather than the injected GRAFT grammar:
  *
  * {{{
  * CREATE NAMESPACE graft_lake.bronze;
  * CREATE TABLE graft_lake.bronze.events (day STRING, id BIGINT, v DOUBLE)
  *   PARTITIONED BY (day);                           -- schema-only seed
  * CREATE TABLE graft_lake.bronze.top AS SELECT …;   -- CTAS
  * INSERT INTO graft_lake.bronze.events SELECT …;    -- O(batch) append
  * INSERT OVERWRITE graft_lake.bronze.events …;      -- truncate + write
  * DELETE FROM graft_lake.bronze.events WHERE day < '2026-01-01';
  * ALTER TABLE graft_lake.bronze.events RENAME COLUMN v TO score;
  * SELECT * FROM graft_lake.bronze.events VERSION AS OF 3;
  * SELECT * FROM graft_lake.bronze.events TIMESTAMP AS OF '2026-02-01';
  * DROP TABLE graft_lake.bronze.events;
  * }}}
  *
  * Identity is layout: `<warehouse>/<namespace…>/<name>` IS the manifest
  * table root, a directory is a table iff it has a `_manifests` log, and
  * any other directory is a namespace. No extra metastore exists to
  * drift from the data — listing and existence checks are filesystem
  * metadata operations, the same economics the manifest log itself is
  * built on (object-store LIST + conditional PUT, no rename dependence).
  * Time travel resolves versions in the catalog (`loadTable(ident,
  * version/timestamp)`), so `VERSION AS OF`/`TIMESTAMP AS OF` SQL works
  * natively; the per-table read/write/delete surfaces live on
  * [[GraftTable]].
  */
object GraftCatalog {
  /** Resolve `catalog.ns….table` to its manifest root through the
    * session's registered catalogs — the shared seam that lets every
    * path-taking surface (GRAFT grammar, the `graft-manifest` formats'
    * `table` option) also accept a NAME. Demands the table exist: a
    * typo'd name must refuse, not invent a directory beside the real
    * table. */
  def resolveName(name: String, mustExist: Boolean = true): String = {
    val parts = name.split('.').toSeq.filter(_.nonEmpty)
    require(parts.length >= 2,
      s"graft: '$name' must be a catalog table name (catalog.namespace….table)")
    val spark = SparkSession.active
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case scala.util.control.NonFatal(e) =>
        sys.error(s"graft: cannot load catalog '${parts.head}' for '$name': ${e.getMessage}")
      }
    cat match {
      case g: GraftCatalog => g.tableRootFor(parts.tail, mustExist)
      case other => sys.error(
        s"graft: catalog '${parts.head}' is not a graft catalog " +
          s"(${other.getClass.getName})")
    }
  }
}

class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** The FunctionCatalog surface exists for ONE function: the `bucket`
    * layout transform ([[GraftBucketFunction]]). Spark's
    * V2ExpressionUtils resolves a scan-reported `bucket(n, col)`
    * clustering through the owning table's catalog (any namespace —
    * the resolver asks with an empty one), which is what turns the
    * storage-partitioned join from stored-value identity matching into
    * transform reasoning: natural `ON a.k = b.k` co-partitioning and
    * compatible 2:1 bucket counts via ReducibleFunction. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    // the FunctionCatalog contract matches the namespace surface: a
    // nonexistent namespace must throw, not list (r17 review finding)
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(namespace, GraftBucketFunction.name()))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    // same namespace contract as listFunctions (r17 advisory): the two
    // surfaces must agree — `nonexistent_ns.bucket` loading while
    // listFunctions(nonexistent_ns) throws is an inconsistent catalog
    if (ident.namespace().nonEmpty && !namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    if (ident.name().equalsIgnoreCase(GraftBucketFunction.name()))
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
  }

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .orElse(sys.env.get("SPARK_GRAFT_WAREHOUSE"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_warehouse")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def validPart(s: String): Boolean =
    s.nonEmpty && !s.contains('/') && !s.contains('\\') && s != "." &&
      s != ".." && !s.startsWith("_") && !s.startsWith(".")

  private def nsPath(namespace: Array[String]): Path = {
    namespace.foreach(p => require(validPart(p),
      s"graft catalog: bad namespace segment '$p'"))
    namespace.foldLeft(new Path(warehouse))((acc, p) => new Path(acc, p))
  }

  private def tablePath(ident: Identifier): Path = {
    require(validPart(ident.name),
      s"graft catalog: bad table name '${ident.name}'")
    new Path(nsPath(ident.namespace), ident.name)
  }

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, ManifestTable.ManifestDir))

  /** The manifest root a `ns….name` identifier resolves to — the GRAFT
    * maintenance grammar uses this to accept catalog table NAMES
    * anywhere it takes a table path. By default demands the table exist
    * (a maintenance command on a typo must not invent a directory);
    * `mustExist = false` serves CREATE-shaped statements. */
  def tableRootFor(parts: Seq[String], mustExist: Boolean = true): String = {
    require(parts.nonEmpty, s"graft catalog $catalogName: empty table identifier")
    val ident = Identifier.of(parts.dropRight(1).toArray, parts.last)
    val p = tablePath(ident)
    if (mustExist && !isTableDir(p)) throw new NoSuchTableException(ident)
    p.toString
  }

  // ---- tables ----------------------------------------------------------

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString, fullName(ident), None)
  }

  /** `VERSION AS OF v` — the catalog resolves the pin so the table it
    * returns is immutably versioned (writes refuse on it). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.trim.toLong).getOrElse(
      sys.error(s"graft catalog: VERSION AS OF wants a numeric version, got '$version'"))
    new GraftTable(p.toString, fullName(ident), Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch;
    * resolution uses the same monotonic-mtime walk as the rest of the
    * engine ([[ManifestTable.versionAtTime]]). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val ms = Math.floorDiv(timestampMicros, 1000L)
    val v = ManifestTable.versionAtTime(spark, p.toString, ms).getOrElse(
      sys.error(s"graft catalog: ${fullName(ident)} has no commit at or before " +
        s"epoch-ms $ms"))
    new GraftTable(p.toString, fullName(ident), Some(v))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (namespace.nonEmpty && !fs.exists(dir))
      throw new NoSuchNamespaceException(namespace)
    if (!fs.exists(dir)) return Array.empty
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir).map(p => Identifier.of(namespace, p.getName))
      .sortBy(_.name).toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(!properties.containsKey("location"),
      "graft catalog: external LOCATION is not supported — path tables are " +
        "the graft.`/path` relation surface; catalog tables live under the warehouse")
    // identity columns pass through; Spark's native transform syntax
    // (PARTITIONED BY (days(ts)), bucket(16, k), …) maps onto the
    // manifest's generated-partition-column specs — the engine derives
    // the day/bucket column at every write boundary
    val partCols = partitions.toSeq.map { t =>
      def refs = {
        require(t.references.nonEmpty && t.references.forall(_.fieldNames.length == 1),
          s"graft catalog: PARTITIONED BY transform must reference " +
            s"top-level columns, got $t")
        t.references.toSeq.map(_.fieldNames.head)
      }
      def ref = {
        require(refs.length == 1,
          s"graft catalog: '${t.name}' takes exactly one column, got $t")
        refs.head
      }
      t.name match {
        case "identity"                   => ref
        case "days" | "months" | "hours"  => s"${t.name}($ref)"
        case "bucket" =>
          val n = t.arguments.collectFirst {
            case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lit.value.toString
          }.getOrElse(sys.error(s"graft catalog: bucket transform needs a " +
            s"literal bucket count, got $t"))
          // multiple sources hash as a TUPLE (composite-key co-location)
          s"bucket($n, ${refs.mkString(", ")})"
        case other => sys.error(
          s"graft catalog: unsupported PARTITIONED BY transform '$other' — " +
            "supported: identity columns, days/months/hours(col), " +
            "bucket(n, col[, col…])")
      }
    }
    val p = tablePath(ident)
    if (isTableDir(p)) throw new TableAlreadyExistsException(ident)
    // TBLPROPERTIES from CREATE TABLE persist as manifest tags; Spark's
    // own bookkeeping entries (provider/owner/…) are identity, not state
    val userProps = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external", "comment",
          "option.path", "transient_lastDdlTime")
    try ManifestTable.createEmpty(spark, p.toString, schema, partCols,
      tags = userProps)
    catch { case _: ManifestTable.ConcurrentCommitException =>
      throw new TableAlreadyExistsException(ident)
    }
    new GraftTable(p.toString, fullName(ident), None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val root = p.toString
    val sets = scala.collection.mutable.LinkedHashMap[String, String]()
    val unsets = scala.collection.mutable.ListBuffer[String]()
    changes.foreach {
      case sp: TableChange.SetProperty => sets(sp.property) = sp.value
      case rp: TableChange.RemoveProperty => unsets += rp.property
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames.length == 1,
          "graft catalog: RENAME COLUMN on nested fields is not supported")
        ManifestTable.retryOnConflict()(
          ManifestTable.renameColumn(spark, root, rc.fieldNames.head, rc.newName))
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames.length == 1,
          "graft catalog: DROP COLUMN on nested fields is not supported")
        ManifestTable.retryOnConflict()(
          ManifestTable.dropColumn(spark, root, dc.fieldNames.head))
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames.length == 1,
          "graft catalog: ADD COLUMN on nested fields is not supported")
        require(ac.isNullable,
          "graft catalog: ADD COLUMN NOT NULL is not supported — existing rows " +
            "would instantly violate it; add nullable, backfill, then constrain")
        require(ac.position == null,
          "graft catalog: ADD COLUMN FIRST/AFTER is not supported — new columns " +
            "append to the declared order (renames/reads are by name)")
        ManifestTable.retryOnConflict()(
          ManifestTable.addColumn(spark, root, ac.fieldNames.head, ac.dataType))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — additive " +
          "column evolution is a mergeSchema upsert; a type change is a rewrite")
    }
    if (sets.nonEmpty || unsets.nonEmpty)
      ManifestTable.retryOnConflict()(ManifestTable.setTableProperties(
        spark, root, sets.toMap, unsets.toList))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    // a later CREATE at the same path re-claims version numbers — drop
    // the resolved-state memo entries so nothing can alias
    ManifestTable.invalidateStateMemo(p.toString)
    isTableDir(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.exists(to.getParent)) throw new NoSuchNamespaceException(newIdent.namespace)
    ManifestTable.invalidateStateMemo(from.toString)
    ManifestTable.invalidateStateMemo(to.toString)
    require(fs.rename(from, to),
      s"graft catalog: rename ${fullName(oldIdent)} -> ${fullName(newIdent)} failed")
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  // ---- namespaces ------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    fs.exists(p) && !isTableDir(p)
  }

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    if (!fs.exists(dir)) return Array.empty
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => validPart(p.getName) && !isTableDir(p))
      .map(p => namespace :+ p.getName).sortBy(_.mkString(".")).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    if (fs.exists(p)) throw new NamespaceAlreadyExistsException(namespace)
    require(fs.mkdirs(p), s"graft catalog: mkdirs $p failed")
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val p = nsPath(namespace)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new NonEmptyNamespaceException(
        namespace, s"namespace ${namespace.mkString(".")} is not empty", None)
    ManifestTable.invalidateStateMemo(p.toString)
    fs.delete(p, true)
  }
}

package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange, NamespaceChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.{AlwaysTrue, And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.CommitLog

/** The SQL front door for [[graft.CommitLog]] tables — a DSv2
  * `TableCatalog` that makes the table format reachable from pure SQL,
  * the one integration every public log-structured format ships
  * (`USING delta` + `VERSION AS OF` in miniature):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  *   spark.sql("CREATE TABLE graft.db.t AS SELECT ...")
  *   spark.sql("INSERT INTO graft.db.t SELECT ...")          // one commit
  *   spark.sql("SELECT * FROM graft.db.t VERSION AS OF 3")   // time travel
  *   spark.sql("SELECT * FROM graft.db.t TIMESTAMP AS OF '2026-08-16'")
  * }}}
  *
  * Layout: `warehouse/<namespace...>/<table>` is a commit-log root
  * (identified by its `_graft_log` dir); namespaces are plain
  * directories. There is NO separate metadata store — the log plus
  * parquet footers remain the single source of truth (`CREATE TABLE`
  * commits a zero-row schema-carrying parquet via [[CommitLog.create]]),
  * so the API surface and the SQL surface can never disagree about a
  * table's state.
  *
  * Read path, built for the same plans the API gets: the scan DELEGATES
  * to Spark's own parquet DSv2 machinery (`ParquetScanBuilder` over the
  * log-resolved live file set), so SQL reads get the identical
  * vectorized, codegen'd, row-group-skipping parquet scan that
  * `CommitLog.snapshot` produces — with TWO pruning layers stacked in
  * front:
  *  1. commit-stats FILE skipping at planning time ([[GraftScanBuilder]]
  *     intersects pushed-down comparisons with the commit-embedded
  *     per-file min/max stats — `snapshotRange`'s superset rule: a file
  *     with no stat on the column is kept, and every predicate is still
  *     re-applied to rows), and
  *  2. parquet row-group/page skipping inside the kept files (the pushed
  *     filters are handed to the `ParquetScan` verbatim).
  * Schema at analysis time is the [[CommitLog.snapshotEvolved]] widening
  * fold ([[CommitLog.evolvedSchema]], footer reads memoized per
  * immutable data dir), and the parquet readers natively null-fill
  * added columns and widen int→long / float→double per file — so an
  * evolved table reads correctly from SQL without a second read path.
  *
  * Write path: `INSERT INTO` is [[CommitLog.append]] (one atomic
  * commit; set session conf `graft.catalog.statsColumns` to a
  * comma-separated column list to embed data-skipping stats at insert
  * time), `INSERT OVERWRITE` is [[CommitLog.overwrite]] — via the
  * public `V1Write`/`InsertableRelation` seam, so the data lands
  * through exactly the same writeData + optimistic-commit protocol as
  * API writes (never a parallel SQL-only writer to drift). Writes to a
  * time-traveled table are rejected. Note: with session conf
  * `spark.sql.sources.partitionOverwriteMode=dynamic`, Spark plans
  * `INSERT OVERWRITE` as a dynamic-PARTITION overwrite, which graft
  * tables (unpartitioned by design) decline at analysis — set the mode
  * to `static` (the default) for full-table overwrites.
  *
  * Scale shape: loadTable costs one O(commits) driver-side log fold +
  * O(new dirs) memoized footer reads; executors see only the parquet
  * scan. Time travel to a vacuumed version fails LOUDLY at load time
  * with the retention advice (the spec-pinned contract), not with a
  * mid-scan FileNotFound.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def pathOf(parts: Seq[String]): Path =
    new Path((warehouse +: parts).mkString("/"))
  private def rootOf(ident: Identifier): String =
    pathOf(ident.namespace.toSeq :+ ident.name).toString
  private def isTable(p: Path): Boolean =
    fs.exists(new Path(p, CommitLog.LogDir))
  private def displayName(ident: Identifier): String =
    (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  // ---------- tables ----------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val dir = pathOf(ns.toSeq)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTable).map(p => Identifier.of(ns, p.getName))
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF <v>` — the numeric commit version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"VERSION AS OF on graft table ${displayName(ident)} takes the " +
        s"numeric commit version, got '$version'"))
    loadAt(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch;
    * resolution is [[CommitLog.versionAsOfTime]]'s commit-mtime rule. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = requireRoot(ident)
    val v = CommitLog.versionAsOfTime(spark, root, timestampMicros / 1000L)
    new GraftTable(spark, displayName(ident), root, Some(v))
  }

  private def requireRoot(ident: Identifier): String = {
    val root = rootOf(ident)
    if (!isTable(new Path(root))) throw new NoSuchTableException(ident)
    root
  }

  private def loadAt(ident: Identifier, asOf: Option[Long]): Table = {
    val root = rootOf(ident)
    if (!isTable(new Path(root))) {
      // metadata-table suffix (db.t.history / db.t.changes — the public
      // formats' idiom): serve the ops view when the PARENT is a table.
      // Head-only: a time-traveled metadata table has no meaning.
      if (asOf.isEmpty && ident.namespace.nonEmpty &&
          GraftOps.MetaTableNames.contains(ident.name.toLowerCase)) {
        val parent = pathOf(ident.namespace.toSeq)
        if (isTable(parent))
          return GraftOps.metaTable(spark, displayName(ident),
            ident.name.toLowerCase, parent.toString)
      }
      throw new NoSuchTableException(ident)
    }
    asOf.foreach { v =>
      val head = CommitLog.headVersion(spark, root)
      if (v < 1 || v > head) throw new IllegalArgumentException(
        s"version $v does not exist on graft table ${displayName(ident)} " +
          s"(head is $head)")
    }
    new GraftTable(spark, displayName(ident), root, asOf)
  }

  // ---------- procedures (CALL cat.system.<proc>) ----------

  /** Catalog-relative table-name resolution for procedure arguments
    * ('db.t' → warehouse/db/t), loud on a miss. */
  private def procRoot(tbl: String): String = {
    val parts = tbl.split('.').toSeq.map(_.trim).filter(_.nonEmpty)
    val root = pathOf(parts)
    require(isTable(root),
      s"no graft table '$tbl' under warehouse $warehouse")
    root.toString
  }

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.sameElements(GraftProcedures.Namespace),
      s"procedures live in the 'system' namespace: CALL $catalogName.system.${ident.name}(...)")
    GraftProcedures.load(ident.name.toLowerCase, procRoot)
  }

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.sameElements(GraftProcedures.Namespace))
      GraftProcedures.names.map(n => Identifier.of(ns, n)).toArray
    else Array.empty

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables take no partition transforms — the format clusters " +
        "with CommitLog.compact(clusterBy = ...) and skips with " +
        "commit-embedded stats instead of hive directories")
    val root = rootOf(ident)
    if (isTable(new Path(root))) throw new TableAlreadyExistsException(ident)
    CommitLog.create(spark, root, schema)
    // durable maintenance config: cluster keys + default stats columns
    // (TBLPROPERTIES ('clusterBy'='k'[, 'statsColumns'='k,v'])) — every
    // INSERT range-shapes + stats its data and CALL compact defaults to
    // the declared keys (see GraftWriteBuilder / GraftProcedures)
    val keep = properties.asScala.view
      .filterKeys(k => k == "clusterBy" || k == "statsColumns").toMap
    keep.values.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .foreach { c =>
        require(schema.fieldNames.contains(c),
          s"table property names unknown column '$c' (schema: ${schema.fieldNames.mkString(", ")})")
      }
    if (keep.nonEmpty) CommitLog.setProperties(spark, root, keep)
    new GraftTable(spark, displayName(ident), root, None)
  }

  /** Only the maintenance-config properties are alterable (the same two
    * CREATE accepts — clusterBy / statsColumns, stored in the
    * properties sidecar); SCHEMA changes keep the reader-side-evolution
    * contract and are rejected with the migration story. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = requireRoot(ident)
    val alterable = Set("clusterBy", "statsColumns")
    changes.foreach {
      case set: TableChange.SetProperty if alterable(set.property) =>
        val schema = CommitLog.evolvedSchema(spark, root,
          CommitLog.liveFiles(spark, root))
        set.value.split(',').map(_.trim).filter(_.nonEmpty).foreach { c =>
          require(schema.fieldNames.contains(c),
            s"table property names unknown column '$c' " +
              s"(schema: ${schema.fieldNames.mkString(", ")})")
        }
        CommitLog.setProperties(spark, root, Map(set.property -> set.value))
      case rm: TableChange.RemoveProperty if alterable(rm.property) =>
        CommitLog.setProperties(spark, root, Map(rm.property -> ""))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${displayName(ident)}: unsupported change $other — " +
          "graft tables evolve reader-side (append data carrying the " +
          "added or widened column; snapshotEvolved semantics); only the " +
          "clusterBy / statsColumns maintenance properties are alterable")
    }
    new GraftTable(spark, displayName(ident), root, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(rootOf(ident))
    isTable(root) && fs.delete(root, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    // `RENAME TO cat.ns.t` reaches the catalog with its own name still on
    // the target's namespace (observed Spark 4.1 analyzer behavior) —
    // strip it, or the table would silently move under warehouse/<cat>/.
    // Collision guard (review finding r17): a warehouse namespace
    // legitimately NAMED like the catalog must not be mis-resolved one
    // level up — strip only when the incoming namespace path does not
    // itself exist as a namespace directory (the analyzer-prefixed form
    // never does unless the collision is real, in which case the
    // existing directory wins and the prefixed reading is unreachable —
    // rename through the API for that corner).
    val toNorm =
      if (to.namespace.headOption.contains(catalogName) &&
          !fs.exists(pathOf(to.namespace.toSeq)))
        Identifier.of(to.namespace.drop(1), to.name)
      else to
    val src = new Path(rootOf(from))
    val dst = new Path(rootOf(toNorm))
    if (!isTable(src)) throw new NoSuchTableException(from)
    if (fs.exists(dst)) throw new TableAlreadyExistsException(to)
    fs.mkdirs(dst.getParent)
    require(fs.rename(src, dst), s"rename $src -> $dst failed")
  }

  // ---------- namespaces ----------

  override def listNamespaces(): Array[Array[String]] = {
    val dir = new Path(warehouse)
    if (!fs.exists(dir)) return Array.empty
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).map(p => Array(p.getName))
  }

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    val dir = pathOf(ns.toSeq)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).map(p => ns :+ p.getName)
  }

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    val dir = pathOf(ns.toSeq)
    if (!fs.exists(dir) || isTable(dir)) throw new NoSuchNamespaceException(ns)
    util.Collections.emptyMap()
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val dir = pathOf(ns.toSeq)
    if (fs.exists(dir)) throw new NamespaceAlreadyExistsException(ns)
    fs.mkdirs(dir)
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are plain directories and carry no metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val dir = pathOf(ns.toSeq)
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${ns.mkString(".")} is not empty; use CASCADE")
    fs.delete(dir, true)
  }
}

private[sources] object GraftCatalog {
  /** Per-column closed [lo, hi] long bounds implied by the pushed-down
    * conjunction — only integral comparisons tighten (the commit stats
    * are long-valued by the format's rule); everything else is ignored
    * here and re-applied to rows by Spark. Open bounds convert with
    * saturating ±1 so MinValue/MaxValue literals cannot wrap. */
  private[sources] def num(v: Any): Option[Long] = v match {
    case b: Byte  => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int   => Some(i.toLong)
    case l: Long  => Some(l)
    case _        => None
  }

  /** `DELETE FROM … WHERE` shapes the format can honor: `None` = not
    * expressible as a keyed delete (Spark errors with its standard
    * cannot-delete message); `Some(Left(()))` = delete EVERYTHING (no
    * WHERE / AlwaysTrue — a truncate); `Some(Right((key, keys)))` = the
    * keyed retraction, every filter an EqualTo/In on ONE integral
    * column, conjunction = set intersection (null literals never match,
    * CommitLog.delete's own rule). */
  /** A keyed delete's key values PER COLUMN: integral keys as Left,
    * STRING keys as Right (the r19 string-key lift —
    * [[graft.CommitLog.deleteStrings]] prunes them through keyImage
    * blooms). ONE entry = the single-key shape; SEVERAL entries = the
    * composite conjunction (`tenant = 'a' AND k IN (1, 2)` →
    * [[graft.CommitLog.deleteComposite]]). A per-column mixed-typed or
    * other-typed key set is not expressible. */
  private[sources] def keyedDeleteOf(filters: Array[Filter])
      : Option[Either[Unit, Seq[(String, Either[Set[Long], Set[String]])]]] = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) return Some(Left(()))
    def keyVal(v: Any): Option[Any] =
      num(v).map(x => x: Any).orElse(v match {
        case s: String => Some(s: Any)
        case _ => None
      })
    // one top-level filter = one conjunct; inside each, OR of same-column
    // equalities unions key sets (`k IN (5,7) OR k = 9`)
    def setOf(f: Filter): Option[(String, Set[Any])] = f match {
      case EqualTo(c, v) if v != null => keyVal(v).map(x => c -> Set(x))
      case In(c, vs)     =>
        val ks = vs.toSeq.filter(_ != null).map(keyVal)
        if (ks.forall(_.isDefined)) Some(c -> ks.flatten.toSet) else None
      case org.apache.spark.sql.sources.Or(l, r) =>
        for { (cl, sl) <- setOf(l); (cr, sr) <- setOf(r) if cl == cr }
          yield cl -> (sl union sr)
      case _             => None
    }
    val perFilter = real.toSeq.map(setOf)
    if (perFilter.exists(_.isEmpty)) return None
    // conjuncts on the same column intersect; distinct columns compose
    val byCol = perFilter.flatten.groupBy(_._1).toSeq
      .map { case (c, ss) => c -> ss.map(_._2).reduce(_ intersect _) }
      .sortBy(_._1)
    val typed = byCol.map { case (c, keys) =>
      if (keys.forall(_.isInstanceOf[Long]))
        Some(c -> (Left(keys.map(_.asInstanceOf[Long])): Either[Set[Long], Set[String]]))
      else if (keys.forall(_.isInstanceOf[String]))
        Some(c -> (Right(keys.map(_.asInstanceOf[String])): Either[Set[Long], Set[String]]))
      else None // mixed-typed key set: not a keyed delete
    }
    if (typed.exists(_.isEmpty)) None else Some(Right(typed.flatten))
  }

  private[sources] def longBounds(filters: Array[Filter]): Map[String, (Long, Long)] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = b.getOrElse(c, (Long.MinValue, Long.MaxValue))
      b(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    def walk(f: Filter): Unit = f match {
      case And(l, r)                => walk(l); walk(r)
      case EqualTo(c, v)            => num(v).foreach(x => tighten(c, x, x))
      case GreaterThan(c, v)        => num(v).foreach(x =>
        tighten(c, if (x < Long.MaxValue) x + 1 else Long.MaxValue, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => num(v).foreach(x => tighten(c, x, Long.MaxValue))
      case LessThan(c, v)           => num(v).foreach(x =>
        tighten(c, Long.MinValue, if (x > Long.MinValue) x - 1 else Long.MinValue))
      case LessThanOrEqual(c, v)    => num(v).foreach(x => tighten(c, Long.MinValue, x))
      case _                        => ()
    }
    filters.foreach(walk)
    b.toMap
  }
}

/** One commit-log table as the catalog serves it — optionally pinned to
  * a time-travel version (`asOf`), in which case it is read-only and its
  * file set is existence-checked at resolution so a vacuumed-away
  * version fails loudly with the retention contract instead of a
  * mid-scan FileNotFound. */
private[graft] class GraftTable(spark: SparkSession, val ident: String,
    val root: String, val asOf: Option[Long])
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private val asOfV: Long = asOf.getOrElse(Long.MaxValue)

  /** Root-relative live paths at the pinned version. Resolved once per
    * loadTable (one O(commits) log fold); the vacuum existence probe
    * runs only on the time-travel path — files live at HEAD are
    * vacuum-protected by construction. */
  private lazy val liveRel: Seq[String] = {
    val files = CommitLog.liveFiles(spark, root, asOfV)
    require(files.nonEmpty,
      s"commit-log table $ident has no live files (asOf=$asOfV)")
    asOf.foreach { v =>
      val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val missing = files.filterNot(p =>
        f.exists(new Path(CommitLog.dataPath(root, p))))
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"version $v of $ident reads ${missing.size} data file(s) already " +
          s"reclaimed by vacuum (e.g. ${missing.head}) — time travel below " +
          "the retention window is gone by design; vacuum with retainLast " +
          "to keep a window, or clone the version before reclaiming")
    }
    files
  }

  private lazy val tableSchema: StructType =
    CommitLog.evolvedSchema(spark, root, liveRel)

  override def name(): String = ident
  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    if (asOf.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def properties(): util.Map[String, String] =
    (Map("provider" -> "graft", "location" -> root) ++
      CommitLog.properties(spark, root)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, ident, root, asOfV, liveRel, tableSchema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (asOf.isDefined) throw new UnsupportedOperationException(
      s"$ident is a time-traveled read (version ${asOf.get}); writes go " +
        "to the head table")
    new GraftWriteBuilder(root)
  }

  /** `DELETE FROM` — the GDPR retraction from SQL: keyed predicates land
    * as ONE delta-sized [[CommitLog.delete]] version (stats-pruned file
    * rewrites; time travel serves pre-delete versions until vacuum — the
    * API semantics exactly); a WHERE-less delete truncates via one
    * zero-row overwrite commit. Predicates the keyed form cannot honor
    * (non-key columns, ranges, null-safe equality) are declined at
    * analysis — Spark reports them unsupported instead of a silent
    * partial delete. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && GraftCatalog.keyedDeleteOf(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    if (asOf.isDefined) throw new UnsupportedOperationException(
      s"$ident is a time-traveled read (version ${asOf.get}); deletes go " +
        "to the head table")
    GraftCatalog.keyedDeleteOf(filters) match {
      case Some(Left(())) =>
        CommitLog.overwrite(spark.createDataFrame(
          new util.ArrayList[org.apache.spark.sql.Row](), tableSchema)
          .coalesce(1), root): Unit
      case Some(Right(Seq((keyCol, Left(keys))))) =>
        if (keys.nonEmpty)
          CommitLog.delete(spark, root, keyCol, keys.toSeq.sorted): Unit
      case Some(Right(Seq((keyCol, Right(keys))))) =>
        if (keys.nonEmpty)
          CommitLog.deleteStrings(spark, root, keyCol, keys.toSeq.sorted): Unit
      case Some(Right(components)) => // composite conjunction (r19)
        CommitLog.deleteComposite(spark, root,
          components.map { case (c, ks) =>
            c -> ks.fold(l => Left(l.toSeq.sorted): Either[Seq[Long], Seq[String]],
              r => Right(r.toSeq.sorted))
          }): Unit
      case None => throw new UnsupportedOperationException(
        s"DELETE on $ident supports conjunctions of equality/IN predicates " +
          "over integral or string key columns (CommitLog.delete's " +
          s"keyed-retraction shape), got: ${filters.mkString(", ")}")
    }
  }
}

/** The two-layer pruning scan: commit-stats file skipping at planning
  * time, then Spark's own `ParquetScanBuilder` over the kept files (so
  * the physical scan — vectorization, whole-stage codegen, row-group
  * and page skipping via the pushed filters — is byte-identical to what
  * `spark.read.parquet` plans). Every pushed filter is also returned as
  * residual, so both layers stay superset-safe optimizations and Spark
  * re-applies the full predicate to rows — the partition-pruning
  * discipline, never a correctness dependency. */
private[sources] class GraftScanBuilder(spark: SparkSession, ident: String,
    root: String, asOf: Long, files: Seq[String], dataSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: skipping layers are superset-safe only
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val bounds = GraftCatalog.longBounds(pushed)
    val kept = if (bounds.isEmpty) files else {
      val entries = CommitLog.log(spark, root, asOf)
      val folds = bounds.keys.map(c => c -> CommitLog.statFold(entries, c)).toMap
      files.filter { f =>
        bounds.forall { case (c, (lo, hi)) =>
          folds(c).get(f).forall(st => st.max >= lo && st.min <= hi) }
      }
    }
    if (kept.isEmpty) new GraftEmptyScan(required)
    else {
      val paths = kept.map(p => new Path(CommitLog.dataPath(root, p)))
      val index = new InMemoryFileIndex(spark, paths, Map.empty, Some(dataSchema))
      val psb = ParquetScanBuilder(spark, index, dataSchema, dataSchema, options)
      psb.pruneColumns(required)
      // hand the data filters to the parquet scan for row-group/page
      // skipping inside the kept files; unconvertible filters are
      // dropped by the parquet layer itself and rows are re-filtered
      // upstream either way
      psb.build().copy(pushedFilters = pushed)
    }
  }
}

/** Every live file pruned away by commit stats: a zero-partition scan
  * (the planning-time analogue of snapshotRange's `lit(false)` short
  * circuit). */
private[graft] final class GraftEmptyScan(schema: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition) =
        throw new IllegalStateException("empty scan plans no partitions")
    }
}

/** SQL writes land through the SAME commit protocol as API writes — the
  * public `V1Write` seam hands the input DataFrame to
  * [[CommitLog.append]]/[[CommitLog.overwrite]], so SQL inserts get the
  * staged-rename atomic commit, exactly-once retry behavior and
  * optional stats embedding (session conf `graft.catalog.statsColumns`,
  * both insert and overwrite) with zero writer-code duplication.
  *
  * A table whose `clusterBy` property is set gets the q119 LAYOUT on
  * every SQL write: the incoming frame is range-repartitioned (at its
  * own parallelism — no partition-count inflation for small inserts) +
  * sorted within partitions on the cluster keys, so each data file owns
  * a contiguous key run and the automatically-collected per-key stats
  * stay TIGHT — snapshotRange/snapshotBox skipping works from the first
  * insert, without waiting for a compaction. */
private[sources] class GraftWriteBuilder(root: String)
  extends WriteBuilder with SupportsTruncate {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val s = data.sparkSession
          val props = CommitLog.properties(s, root)
          def csv(v: Option[String]): Seq[String] =
            v.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
              .getOrElse(Seq.empty)
          val clusterBy = csv(props.get("clusterBy"))
          val statsFor = (csv(s.conf.getOption("graft.catalog.statsColumns")) ++
            csv(props.get("statsColumns")) ++ clusterBy).distinct
          val shaped =
            if (clusterBy.isEmpty) data
            else data
              .repartitionByRange(math.max(1, data.rdd.getNumPartitions),
                clusterBy.map(org.apache.spark.sql.functions.col): _*)
              .sortWithinPartitions(
                clusterBy.map(org.apache.spark.sql.functions.col): _*)
          if (overwriteAll || overwrite)
            CommitLog.overwrite(shaped, root, statsFor): Unit
          else
            CommitLog.append(shaped, root, None, statsFor): Unit
        }
      }
  }
}

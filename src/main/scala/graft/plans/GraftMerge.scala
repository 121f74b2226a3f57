package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertAction, LogicalPlan, MergeIntoTable, Project, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.CommitLog
import graft.sources.GraftTable

/** SQL `MERGE INTO` for [[graft.CommitLog]] tables — the CDC front door
  * (r17 verdict task #1): an injected resolution rule turns the analyzed
  * [[MergeIntoTable]] over a catalog-served graft table into a runnable
  * command that lands the whole statement as ONE delta-sized
  * [[CommitLog.merge]] version:
  *
  * {{{
  *   MERGE INTO graft.db.t AS t USING updates AS s ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * WHY an analysis rule and not `SupportsRowLevelOperations`: Spark's
  * group-based row-level rewrite without connector `_file`-metadata
  * runtime filtering plans a FULL-TABLE rewrite (read every group, write
  * every group back) — strictly worse than the format's own keyed
  * copy-on-write, which stats-prunes then exactly-probes so only files
  * actually HOLDING an updated key are rewritten (CommitLog.merge's
  * two-stage touched-file scan). Intercepting the logical command and
  * routing it to the format's native merge is the pattern the most-used
  * public log-structured format ships (an analysis rule rewriting
  * MergeIntoTable into its own RunnableCommand); the public
  * `injectPostHocResolutionRule` seam is the supported way in.
  *
  * SUPPORTED SHAPE — the keyed upsert the format can honor exactly, the
  * same guardrail discipline as the catalog's `DELETE FROM`:
  *   - `ON t.<k> = <source expr>` where `<k>` is ONE integral target
  *     column and the source side is exactly what gets inserted as `<k>`
  *     (so the probe key IS the stored key),
  *   - exactly one unconditioned `WHEN MATCHED THEN UPDATE SET *` (or an
  *     explicit full-column SET) and one unconditioned
  *     `WHEN NOT MATCHED THEN INSERT *` (or explicit full-column
  *     INSERT), assigning the SAME source expression per column in both
  *     branches — CommitLog.merge replaces matched rows and inserts
  *     unmatched rows from ONE updates frame, so divergent branches
  *     cannot be expressed as a keyed merge,
  *   - no `WHEN NOT MATCHED BY SOURCE`, no action conditions, no schema
  *     evolution, not a time-traveled target;
  *   - OR the pure-delete shape: `WHEN MATCHED THEN DELETE` as the SOLE
  *     clause (the CDC retraction as a key batch) — one keyed
  *     [[CommitLog.delete]] version via [[GraftMergeDeleteCommand]];
  *     mixing a delete with an upsert clause cannot land as one commit
  *     and declines.
  * Anything else is DECLINED LOUDLY at analysis with the shape contract
  * — never a silent partial merge.
  *
  * Duplicate source keys fail at runtime (the SQL cardinality-violation
  * rule, extended to the whole source: the keyed-upsert contract is one
  * row per key — pre-fold the source with q109's latest-per-key window
  * first). The check is one aggregate over the SOURCE (the small CDC
  * side), never the target.
  *
  * Exactly-once: session conf `graft.catalog.txnId` (read per statement)
  * becomes the merge's txn token — a replayed token no-ops before any
  * data write, the s22/s23 streaming contract from SQL. Stats embedding
  * follows the insert path's `graft.catalog.statsColumns` (the merge
  * always stats its key column — CommitLog.merge's default).
  */
object GraftMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case m: MergeIntoTable if m.resolved && graftTarget(m.targetTable).isDefined =>
      toCommand(m, graftTarget(m.targetTable).get)
  }

  private def graftTarget(target: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    EliminateSubqueryAliases(target) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some((r, r.table.asInstanceOf[GraftTable]))
      case _ => None
    }

  private def decline(table: GraftTable, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO ${table.ident}: $why — graft tables support the keyed " +
        "upsert shape (ON t.<integral key> = <source key expr>, one " +
        "unconditioned WHEN MATCHED THEN UPDATE SET * and one " +
        "unconditioned WHEN NOT MATCHED THEN INSERT *, both assigning " +
        "the same source expression per column); reshape the statement " +
        "or use the CommitLog API directly")

  private def toCommand(m: MergeIntoTable,
      rel: (DataSourceV2Relation, GraftTable)): LogicalPlan = {
    val (relation, table) = rel
    if (table.asOf.isDefined)
      decline(table, s"the target is a time-traveled read (version ${table.asOf.get}); merges go to the head table")
    if (m.withSchemaEvolution)
      decline(table, "WITH SCHEMA EVOLUTION is not supported (graft tables evolve reader-side by appending the new column)")
    if (m.notMatchedBySourceActions.nonEmpty)
      decline(table, "WHEN NOT MATCHED BY SOURCE is not supported (a keyed merge never retracts rows the source does not name)")
    // the PURE-DELETE merge — the CDC retraction shape: `WHEN MATCHED
    // THEN DELETE` as the only action lands as one keyed CommitLog.delete
    // version (keys = the source's key values; unmatched keys delete
    // nothing, exactly the MERGE semantics)
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(None)), Seq()) =>
        return toDeleteCommand(m, relation, table)
      case (Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(Some(_))), _) =>
        decline(table, "a conditional WHEN MATCHED DELETE is not expressible as a keyed retraction")
      case (Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(_)), _) =>
        decline(table, "WHEN MATCHED THEN DELETE mixes with no other clause — a keyed retraction and an upsert cannot land as one commit")
      case _ => ()
    }
    val upAssigns = m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) => assigns
      case Seq(UpdateAction(Some(_), _, _)) =>
        decline(table, "a conditional WHEN MATCHED is not expressible as a keyed merge")
      case other =>
        decline(table, s"expected exactly one WHEN MATCHED THEN UPDATE action, got ${other.size}")
    }
    val inAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) => assigns
      case Seq(InsertAction(Some(_), _)) =>
        decline(table, "a conditional WHEN NOT MATCHED is not expressible as a keyed merge")
      case other =>
        decline(table, s"expected exactly one WHEN NOT MATCHED THEN INSERT action, got ${other.size}")
    }
    // assignment key → source value, keys must be bare target attributes
    def assignMap(assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
        what: String): Map[String, Expression] =
      assigns.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name -> a.value
          case other => decline(table,
            s"$what assigns to ${other.sql}, not a bare target column")
        }
      }.toMap
    val up = assignMap(upAssigns, "UPDATE SET")
    val in = assignMap(inAssigns, "INSERT")
    val targetCols = relation.output.map(_.name)
    if (!targetCols.forall(in.contains))
      decline(table, s"INSERT must cover every target column (missing: ${targetCols.filterNot(in.contains).mkString(", ")})")
    if (!targetCols.forall(up.contains))
      decline(table, s"UPDATE SET must cover every target column — the format replaces whole rows (missing: ${targetCols.filterNot(up.contains).mkString(", ")})")
    targetCols.foreach { c =>
      if (!up(c).semanticEquals(in(c)))
        decline(table, s"UPDATE and INSERT assign different expressions to '$c' (${up(c).sql} vs ${in(c).sql})")
    }
    // ON t.k = <source k expr>: one side the target key attribute, the
    // other side semantically the expression INSERTed as k
    val targetAttrIds = relation.output.map(_.exprId).toSet
    val keyCol = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r) if targetAttrIds.contains(l.exprId)
          && in.get(l.name).exists(_.semanticEquals(r)) => l.name
      case EqualTo(l, r: AttributeReference) if targetAttrIds.contains(r.exprId)
          && in.get(r.name).exists(_.semanticEquals(l)) => r.name
      case other => decline(table,
        s"ON must be an equality between one target column and the source expression inserted as it, got ${other.sql}")
    }
    val keyType = relation.output.find(_.name == keyCol).get.dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => decline(table, s"merge key '$keyCol' must be integral, got ${t.sql}")
    }
    GraftMergeCommand(table.root, table.ident, keyCol,
      relation.output.map(a => a.name -> a.dataType), in, m.sourceTable)
  }

  /** `WHEN MATCHED THEN DELETE` (sole clause) → one keyed
    * [[CommitLog.delete]] version. The ON key is anchored by SIDE here
    * (no insert assignments to anchor it): one side a bare target
    * attribute, the other referencing only source columns. */
  private def toDeleteCommand(m: MergeIntoTable, relation: DataSourceV2Relation,
      table: GraftTable): LogicalPlan = {
    val targetAttrIds = relation.output.map(_.exprId).toSet
    def sourceOnly(e: Expression): Boolean =
      e.references.forall(a => !targetAttrIds.contains(a.exprId))
    val (keyCol, srcKey) = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r)
          if targetAttrIds.contains(l.exprId) && sourceOnly(r) => (l.name, r)
      case EqualTo(l, r: AttributeReference)
          if targetAttrIds.contains(r.exprId) && sourceOnly(l) => (r.name, l)
      case other => decline(table,
        s"ON must be an equality between one target column and a source-side expression, got ${other.sql}")
    }
    relation.output.find(_.name == keyCol).get.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => decline(table, s"merge key '$keyCol' must be integral, got ${t.sql}")
    }
    GraftMergeDeleteCommand(table.root, table.ident, keyCol, srcKey, m.sourceTable)
  }
}

/** The runnable half: projects the source through the validated
  * assignments (target column order, store-assignment casts — ANSI mode
  * makes an overflowing cast THROW, never wrap), enforces the
  * one-row-per-key cardinality rule with one aggregate over the source,
  * and lands [[CommitLog.merge]] — delta-sized touched-file rewrites,
  * exactly-once under the session-conf txn token. Output is one row
  * (version committed, or -1 on a token replay) so SQL callers can read
  * the outcome. */
case class GraftMergeCommand(root: String, ident: String, keyCol: String,
    targetSchema: Seq[(String, org.apache.spark.sql.types.DataType)],
    assignments: Map[String, Expression], source: LogicalPlan)
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val projected = Project(
      targetSchema.map { case (n, dt) =>
        Alias(Cast(assignments(n), dt), n)()
      },
      source)
    val updates = ColumnBridge.ofRows(sparkSession, projected)
    val dup = updates.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"MERGE INTO $ident: source has ${dup.head.getLong(1)} rows for " +
          s"$keyCol = ${dup.head.get(0)} — the keyed merge takes one row " +
          "per key (SQL cardinality rule); pre-fold the source with a " +
          "latest-per-key window first")
    val statsFor = sparkSession.conf.getOption("graft.catalog.statsColumns")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val txnId = sparkSession.conf.getOption("graft.catalog.txnId")
    val v = CommitLog.merge(updates, root, keyCol, statsFor, txnId)
    Seq(Row(v.getOrElse(-1L)))
  }
}

/** The pure-delete half: `MERGE ... WHEN MATCHED THEN DELETE` (sole
  * clause) as ONE keyed [[CommitLog.delete]] version — the CDC
  * retraction arriving as a key batch. The source's distinct key values
  * come to the driver (the CommitLog.delete contract — its file probe
  * and broadcast anti-join take a key list); key sets above
  * `graft.catalog.maxDeleteKeys` (default 1M) decline loudly rather
  * than silently ballooning the driver — stream bigger retractions in
  * batches. Unmatched keys delete nothing, exactly the MERGE rule.
  * Exactly-once via the same session-conf txn token as the upsert
  * shape; returns the committed version (−1 when nothing matched or
  * the token replayed). */
case class GraftMergeDeleteCommand(root: String, ident: String,
    keyCol: String, sourceKey: Expression, source: LogicalPlan)
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val maxKeys = sparkSession.conf.getOption("graft.catalog.maxDeleteKeys")
      .map(_.toInt).getOrElse(1000000)
    val keysDf = ColumnBridge.ofRows(sparkSession,
      Project(Seq(Alias(Cast(sourceKey, LongType), "k")()), source))
      .filter(col("k").isNotNull).distinct()
    val keys = keysDf.limit(maxKeys + 1).collect().map(_.getLong(0)).toSeq
    if (keys.size > maxKeys)
      throw new IllegalStateException(
        s"MERGE DELETE INTO $ident: more than $maxKeys distinct source keys — " +
          "the keyed retraction collects keys driver-side; raise " +
          "graft.catalog.maxDeleteKeys or batch the retraction stream")
    val txnId = sparkSession.conf.getOption("graft.catalog.txnId")
    val v = CommitLog.delete(sparkSession, root, keyCol, keys.sorted,
      txnId = txnId)
    Seq(Row(v.getOrElse(-1L)))
  }
}

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
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

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
  *   - `ON` a conjunction of equalities, each `t.<k> = <source expr>`
  *     where `<k>` is an integral or STRING target column (r19: string
  *     keys land through keyImage-bloom pruning — [[CommitLog.merge]]
  *     dispatches on the key type; a COMPOSITE ON lands through
  *     [[CommitLog.mergeComposite]] with per-component intersected
  *     pruning) and the source side is exactly what gets inserted as
  *     `<k>` (so the probe key IS the stored key),
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
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable
        if u.resolved && graftTarget(u.table).isDefined =>
      toUpdateCommand(u, graftTarget(u.table).get)
  }

  /** SQL `UPDATE t SET ... WHERE <keyed predicate>` (r19 — the statement
    * every DELETE/MERGE user tries within the hour): the keyed shape is
    * a degenerate merge — read the matched rows (through the catalog
    * scan, so commit-stats file pruning applies), apply the SET
    * expressions (which may read target columns: `SET bal = bal + 10`),
    * and land ONE delta-sized [[CommitLog.merge]] version keyed on the
    * predicate column. Non-keyed predicates (ranges, non-key columns,
    * compound conjuncts) decline loudly — a keyed merge can only replace
    * whole key groups, and re-inserting a partial group would DROP the
    * unmatched rows of rewritten files' key groups. SET on the key
    * column itself declines too (the merge would anti-join on the NEW
    * key values and leave the old rows behind). WHERE-less UPDATE
    * declines: that is a full-table rewrite — use
    * `INSERT OVERWRITE ... SELECT`. */
  private def toUpdateCommand(
      u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable,
      rel: (DataSourceV2Relation, GraftTable)): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{In, Or}
    val (relation, table) = rel
    def declineU(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"UPDATE ${table.ident}: $why — graft tables support the keyed " +
          "shape (SET on non-key columns, WHERE an equality/IN over ONE " +
          "integral-or-string key column); reshape the statement or use " +
          "the CommitLog API directly")
    if (table.asOf.isDefined)
      declineU(s"the target is a time-traveled read (version ${table.asOf.get}); updates go to the head table")
    val cond = u.condition.getOrElse(declineU(
      "an UPDATE without WHERE is a full-table rewrite, not a keyed " +
        "update — use INSERT OVERWRITE ... SELECT"))
    val targetIds = relation.output.map(_.exprId).toSet
    def keyOf(e: Expression): Option[org.apache.spark.sql.catalyst.expressions.AttributeReference] =
      e match {
        // value sides must be FOLDABLE (literals arrive Cast-wrapped:
        // `k = 5` analyzes to k = CAST(5 AS BIGINT)) — foldable implies
        // no column references, so the key set is plan-time constant
        case EqualTo(KeyAttr(a), v) if targetIds(a.exprId) && v.foldable => Some(a)
        case EqualTo(v, KeyAttr(a)) if targetIds(a.exprId) && v.foldable => Some(a)
        case In(KeyAttr(a), vs)
            if targetIds(a.exprId) && vs.forall(_.foldable) => Some(a)
        case Or(l, r) =>
          for { al <- keyOf(l); ar <- keyOf(r) if al.exprId == ar.exprId } yield al
        case _ => None
      }
    val keyAttr = keyOf(cond).getOrElse(declineU(
      s"WHERE must be an equality/IN (or OR of them) over one key column, got ${cond.sql}"))
    keyAttr.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      case t => declineU(s"key column '${keyAttr.name}' must be integral or string, got ${t.sql}")
    }
    val assigns = u.assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> a.value
        case other => declineU(s"SET assigns to ${other.sql}, not a bare target column")
      }
    }.toMap
    if (assigns.contains(keyAttr.name))
      declineU(s"SET must not assign the key column '${keyAttr.name}' " +
        "(the merge would anti-join on the NEW key values and leave the old rows behind)")
    GraftUpdateCommand(table.root, table.ident, keyAttr.name, relation,
      assigns, cond)
  }

  /** The key attribute inside a predicate side: bare, or behind the
    * analyzer's implicit INJECTIVE integral upcast (`k IN (1, 2)` over an
    * INT k analyzes as `CAST(k AS BIGINT) IN ...`). Injectivity is what
    * keeps the whole-key-group guarantee: every row of any key value
    * matches or none do. A lossy/downward or cross-domain cast does NOT
    * extract (two distinct keys could collide into one matched image). */
  private object KeyAttr {
    private def width(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 4
      case LongType => 8; case _ => -1
    }
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: Cast => c.child match {
        case a: AttributeReference
            if width(a.dataType) > 0 && width(c.dataType) >= width(a.dataType) =>
          Some(a)
        case _ => None
      }
      case _ => None
    }
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
        "upsert shape (ON t.<integral-or-string key> = <source key expr>, " +
        "one unconditioned WHEN MATCHED THEN UPDATE SET * and one " +
        "unconditioned WHEN NOT MATCHED THEN INSERT *, both assigning " +
        "the same source expression per column, optionally preceded by " +
        "WHEN MATCHED AND <source-only cond> THEN DELETE with the " +
        "insert guarded by NOT(<cond>)); reshape the statement " +
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
      case (Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(None)), _) =>
        decline(table, "WHEN MATCHED THEN DELETE mixes with no other clause — a keyed retraction and an upsert cannot land as one commit")
      case _ => ()
    }
    // the CDC OP-CODE batch (r19): a source-condition delete BESIDE the
    // unconditioned upsert — `WHEN MATCHED AND s.op='D' THEN DELETE` /
    // `WHEN MATCHED THEN UPDATE SET *` / `WHEN NOT MATCHED AND NOT
    // (s.op='D') THEN INSERT *`. The statement splits on the delete
    // condition into the existing keyed delete + merge commits, ordered
    // under one txn-token pair (the s38 two-root protocol; see
    // GraftMergeCommand). Faithfulness requires: the delete condition
    // reads ONLY source columns (it is evaluated before any join), the
    // delete clause comes FIRST (SQL first-match-wins — after an
    // unconditioned UPDATE it would be dead), and the INSERT carries the
    // condition's negation (an UNGUARDED insert would, under standard
    // MERGE, insert unmatched delete-op rows — which the split drops, so
    // that shape declines with the guarded form named).
    val (delCond, upAssigns) = m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) => (None, assigns)
      case Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(Some(c)),
          UpdateAction(None, assigns, _)) =>
        val targetIds = relation.output.map(_.exprId).toSet
        if (!c.references.forall(a => !targetIds.contains(a.exprId)))
          decline(table, "the WHEN MATCHED DELETE condition must reference only " +
            "source columns (the CDC split evaluates it on the source before any join)")
        (Some(c), assigns)
      case Seq(UpdateAction(None, _, _),
          org.apache.spark.sql.catalyst.plans.logical.DeleteAction(Some(_))) =>
        decline(table, "the conditional DELETE clause must come BEFORE the " +
          "unconditioned UPDATE (after it, first-match-wins makes the delete dead)")
      case Seq(org.apache.spark.sql.catalyst.plans.logical.DeleteAction(Some(_))) =>
        decline(table, "a conditional WHEN MATCHED DELETE needs the unconditioned " +
          "upsert clause beside it (the sole-clause retraction shape is unconditioned)")
      case Seq(UpdateAction(Some(_), _, _), _*) =>
        decline(table, "a conditional WHEN MATCHED is not expressible as a keyed merge")
      case other =>
        decline(table, s"expected WHEN MATCHED THEN UPDATE (optionally preceded by " +
          s"a source-conditioned DELETE), got ${other.size} matched action(s)")
    }
    val inAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) =>
        if (delCond.isDefined)
          decline(table, "with a conditional WHEN MATCHED DELETE, the INSERT must " +
            "be guarded by the delete condition's negation (WHEN NOT MATCHED AND " +
            s"NOT (${delCond.get.sql}) THEN INSERT) — an unguarded insert would " +
            "resurrect unmatched delete-op rows")
        assigns
      case Seq(InsertAction(Some(ic), assigns)) =>
        delCond match {
          case Some(dc) if ic.semanticEquals(org.apache.spark.sql.catalyst.expressions.Not(dc)) ||
              dc.semanticEquals(org.apache.spark.sql.catalyst.expressions.Not(ic)) =>
            assigns
          case Some(dc) => decline(table,
            s"the INSERT condition must be exactly the delete condition's negation " +
              s"(NOT (${dc.sql})), got ${ic.sql}")
          case None => decline(table,
            "a conditional WHEN NOT MATCHED is not expressible as a keyed merge")
        }
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
    // ON: a conjunction of equalities, each between one target key
    // attribute and the source expression INSERTed as it (r19 lifted
    // the single-column rule: a composite ON lands through
    // CommitLog.mergeComposite — per-component intersected pruning,
    // full-tuple exact probe)
    val targetAttrIds = relation.output.map(_.exprId).toSet
    def keyColsOf(e: Expression): Option[Seq[String]] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        for { a <- keyColsOf(l); b <- keyColsOf(r) } yield a ++ b
      case EqualTo(l: AttributeReference, r) if targetAttrIds.contains(l.exprId)
          && in.get(l.name).exists(_.semanticEquals(r)) => Some(Seq(l.name))
      case EqualTo(l, r: AttributeReference) if targetAttrIds.contains(r.exprId)
          && in.get(r.name).exists(_.semanticEquals(l)) => Some(Seq(r.name))
      case _ => None
    }
    val keyCols = keyColsOf(m.mergeCondition) match {
      case Some(ks) if ks.distinct.size == ks.size => ks
      case Some(ks) => decline(table,
        s"ON names target column(s) ${ks.diff(ks.distinct).distinct.mkString(", ")} more than once")
      case None => decline(table,
        "ON must be a conjunction of equalities, each between one target " +
          s"column and the source expression inserted as it, got ${m.mergeCondition.sql}")
    }
    keyCols.foreach { kc =>
      relation.output.find(_.name == kc).get.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => ()
        case t => decline(table,
          s"merge key '$kc' must be integral or string, got ${t.sql}")
      }
    }
    if (delCond.isDefined && keyCols.size > 1)
      decline(table, "the CDC delete clause is single-keyed (a keyed retraction " +
        "takes one key column); composite-ON merges support only the plain upsert shape")
    GraftMergeCommand(table.root, table.ident, keyCols,
      relation.output.map(a => a.name -> a.dataType), in, m.sourceTable, delCond)
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
    val stringKey = relation.output.find(_.name == keyCol).get.dataType match {
      case ByteType | ShortType | IntegerType | LongType => false
      case StringType => true
      case t => decline(table,
        s"merge key '$keyCol' must be integral or string, got ${t.sql}")
    }
    GraftMergeDeleteCommand(table.root, table.ident, keyCol, srcKey,
      m.sourceTable, stringKey)
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
case class GraftMergeCommand(root: String, ident: String, keyCols: Seq[String],
    targetSchema: Seq[(String, org.apache.spark.sql.types.DataType)],
    assignments: Map[String, Expression], source: LogicalPlan,
    delCond: Option[Expression] = None)
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Not, Or, IsNull}
    val projectAll = targetSchema.map { case (n, dt) =>
      Alias(Cast(assignments(n), dt), n)()
    }
    // the CDC split: delete-op rows feed a keyed retraction, the rest
    // feed the upsert. A NULL delete condition is "not satisfied" (SQL
    // clause semantics) and falls through to the upsert half.
    val upPlan = delCond match {
      case None => Project(projectAll, source)
      case Some(c) => Project(projectAll,
        org.apache.spark.sql.catalyst.plans.logical.Filter(
          Or(Not(c), IsNull(c)), source))
    }
    val updates = ColumnBridge.ofRows(sparkSession, upPlan)
    val keyDts = keyCols.map(kc => kc -> targetSchema.find(_._1 == kc).get._2)
    val delKeysDf = delCond.map { c =>
      // declined for composite keys at analysis: keyCols is a singleton here
      ColumnBridge.ofRows(sparkSession, Project(
        Seq(Alias(Cast(assignments(keyCols.head), keyDts.head._2), "k")()),
        org.apache.spark.sql.catalyst.plans.logical.Filter(c, source)))
        .filter(col("k").isNotNull).distinct()
    }
    // NULL keys are excluded from the cardinality rule: a tuple with ANY
    // null component never matches an ON equality, so standard MERGE
    // inserts every such source row — exactly what CommitLog.merge does —
    // and two of them are a legal pair of inserts, not a duplicate-key
    // violation. The rule covers the WHOLE source (both CDC halves): a
    // key named by a delete-op row AND an upsert row is the ambiguous
    // multi-match standard MERGE rejects.
    val keyProj = keyDts.zipWithIndex.map { case ((kc, dt), i) =>
      Alias(Cast(assignments(kc), dt), s"k$i")()
    }
    val allKeys = ColumnBridge.ofRows(sparkSession, Project(keyProj, source))
      .na.drop("any")
    val kCols = keyProj.indices.map(i => col(s"k$i"))
    val dup = allKeys.groupBy(kCols: _*).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"MERGE INTO $ident: source has ${dup.head.getLong(keyCols.size)} rows for " +
          s"(${keyCols.mkString(", ")}) = (${keyCols.indices.map(dup.head.get).mkString(", ")}) — " +
          "the keyed merge takes one row " +
          "per key (SQL cardinality rule); pre-fold the source with a " +
          "latest-per-key window first")
    val statsFor = sparkSession.conf.getOption("graft.catalog.statsColumns")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val txnId = sparkSession.conf.getOption("graft.catalog.txnId")
    // the s38 ordered two-root protocol, transposed to one root: the
    // retraction commits FIRST under <txn>:del, the upsert under
    // <txn>:up — a crash between the two replays the statement, the
    // delete no-ops on its token, the upsert heals; key-disjointness
    // (the cardinality rule above) makes the order semantically inert
    val stringKey = keyDts.head._2 == org.apache.spark.sql.types.StringType
    val delV: Option[Long] = delKeysDf.flatMap { kdf =>
      val maxKeys = sparkSession.conf.getOption("graft.catalog.maxDeleteKeys")
        .map(_.toInt).getOrElse(1000000)
      val rows = kdf.limit(maxKeys + 1).collect()
      if (rows.length > maxKeys)
        throw new IllegalStateException(
          s"MERGE INTO $ident: more than $maxKeys distinct delete-op keys — " +
            "raise graft.catalog.maxDeleteKeys or batch the retraction stream")
      if (rows.isEmpty) None
      else if (stringKey)
        CommitLog.deleteStrings(sparkSession, root, keyCols.head,
          rows.map(_.getString(0)).toSeq.sorted, txnId = txnId.map(_ + ":del"))
      else
        CommitLog.delete(sparkSession, root, keyCols.head,
          rows.map(r => num(r.get(0))).toSeq.sorted, txnId = txnId.map(_ + ":del"))
    }
    val upTxn = if (delCond.isDefined) txnId.map(_ + ":up") else txnId
    // an all-delete-op CDC batch leaves the upsert half empty — landing
    // it would commit a junk empty version, so it is skipped outright
    val v =
      if (delCond.isDefined && updates.isEmpty) None
      else if (keyCols.size == 1)
        CommitLog.merge(updates, root, keyCols.head, statsFor, upTxn)
      else CommitLog.mergeComposite(updates, root, keyCols, statsFor, upTxn)
    Seq(Row(v.orElse(delV).getOrElse(-1L)))
  }

  private def num(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalStateException(s"non-integral merge key $other")
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
    keyCol: String, sourceKey: Expression, source: LogicalPlan,
    stringKey: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val maxKeys = sparkSession.conf.getOption("graft.catalog.maxDeleteKeys")
      .map(_.toInt).getOrElse(1000000)
    val keyDt = if (stringKey) org.apache.spark.sql.types.StringType else LongType
    val keysDf = ColumnBridge.ofRows(sparkSession,
      Project(Seq(Alias(Cast(sourceKey, keyDt), "k")()), source))
      .filter(col("k").isNotNull).distinct()
    val rows = keysDf.limit(maxKeys + 1).collect()
    if (rows.length > maxKeys)
      throw new IllegalStateException(
        s"MERGE DELETE INTO $ident: more than $maxKeys distinct source keys — " +
          "the keyed retraction collects keys driver-side; raise " +
          "graft.catalog.maxDeleteKeys or batch the retraction stream")
    val txnId = sparkSession.conf.getOption("graft.catalog.txnId")
    val v =
      if (stringKey)
        CommitLog.deleteStrings(sparkSession, root, keyCol,
          rows.map(_.getString(0)).toSeq.sorted, txnId = txnId)
      else
        CommitLog.delete(sparkSession, root, keyCol,
          rows.map(_.getLong(0)).toSeq.sorted, txnId = txnId)
    Seq(Row(v.getOrElse(-1L)))
  }
}

/** The SQL UPDATE runnable: matched rows re-read through the catalog
  * relation (commit-stats pruning applies to the keyed predicate), SET
  * expressions applied with store-assignment casts (ANSI-loud), and one
  * delta-sized [[CommitLog.merge]] keyed on the predicate column. No
  * matched rows → no commit, version −1 (updating an absent key updates
  * nothing — the UPDATE semantics). Exactly-once via the same
  * `graft.catalog.txnId` session token as MERGE. */
case class GraftUpdateCommand(root: String, ident: String, keyCol: String,
    relation: LogicalPlan, assigns: Map[String, Expression],
    cond: Expression) extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val projectList = relation.output.map { a =>
      assigns.get(a.name)
        .map(e => Alias(Cast(e, a.dataType), a.name)())
        .getOrElse(a)
    }
    val updated = ColumnBridge.ofRows(sparkSession, Project(projectList,
      org.apache.spark.sql.catalyst.plans.logical.Filter(cond, relation)))
    if (updated.isEmpty) return Seq(Row(-1L)) // nothing matched: no commit
    val statsFor = sparkSession.conf.getOption("graft.catalog.statsColumns")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val txnId = sparkSession.conf.getOption("graft.catalog.txnId")
    val v = CommitLog.merge(updated, root, keyCol, statsFor, txnId)
    Seq(Row(v.getOrElse(-1L)))
  }
}

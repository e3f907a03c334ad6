package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.SqlBridge

import graft.sources.{GraftTable, TxLog}

/** The analyzer half of the SQL surface for [[graft.sources.TxLog]]
  * tables (injected by [[GraftExtensions]]; the catalog half is
  * [[graft.sources.GraftCatalog]]). Two jobs:
  *
  *  1. **Reads.** A `DataSourceV2Relation` over a [[GraftTable]] rewrites
  *     into the table's actual snapshot PLAN — `TxLog.read` at the
  *     table's pinned version, i.e. the live parquet scan with the
  *     deletion-vector mask and column-mapping projection on top —
  *     aliased back onto the relation's output attributes so everything
  *     above (joins, aggregates, the V1 write fallback's query side)
  *     resolves unchanged. This is why the catalog hands out no
  *     `ScanBuilder`: a snapshot with DVs is scan+anti-join, which only
  *     a logical rewrite can express while keeping Catalyst free to push
  *     filters into the underlying parquet scan. (Public precedent:
  *     Delta's DeltaAnalysis relation rewrites.)
  *  2. **Row-level DML statements.** `DELETE FROM` / `UPDATE` /
  *     `MERGE INTO` over a graft table rewrite into runnable commands
  *     that call the existing oracle-gated verbs
  *     ([[TxLog.deleteWhere]] / [[TxLog.updateWhere]] / [[TxLog.merge]])
  *     — wiring, not new machinery: predicates and assignments convert
  *     to name-addressed Columns (so the verbs' logical-name resolution
  *     and column-mapping checks apply identically from SQL), and the
  *     MERGE source plan is carried as a payload and re-analyzed at
  *     execution time. Supported MERGE shape is the canonical upsert —
  *     `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *     with an equi-key ON condition; anything else fails loudly with
  *     the supported form in the message.
  */
final case class GraftSqlResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** Unwraps the target relation of a read or DML node: the relation
    * itself, possibly under the alias `FROM t AS x` introduces. */
  private object GraftRel {
    def unapply(p: LogicalPlan): Option[GraftTable] = p match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftTable => Some(g)
        case _ => None
      }
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  /** Statement expression → name-addressed Column: attribute references
    * (resolved or not, qualified or not) collapse to their bare column
    * name, so the TxLog verb re-resolves them against its own snapshot
    * frame — where the column-mapping logical-name discipline lives. */
  private def recolumn(e: Expression): Column =
    SqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      case u: UnresolvedAttribute => UnresolvedAttribute(Seq(u.nameParts.last))
    })

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case Alias(child, _) => attrName(child)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** MERGE ON condition → key column names: a conjunction of equalities
    * between same-named target/source columns (`t.k = s.k [AND ...]`). */
  private def mergeKeys(cond: Expression): Seq[String] =
    conjuncts(cond).map {
      case EqualTo(l, r) =>
        (attrName(l), attrName(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => a
          case _ => throw new UnsupportedOperationException(
            "graft: MERGE ON must equate same-named target and source " +
              s"columns (t.k = s.k), got: ${EqualTo(l, r).sql}")
        }
      case other => throw new UnsupportedOperationException(
        "graft: MERGE ON must be a conjunction of key equalities, " +
          s"got: ${other.sql}")
    }

  /** A DML predicate/assignment re-evaluates as a Column over the TxLog
    * snapshot frame, where a subquery cannot resolve — reject it loudly
    * with the rewrite a user actually wants, instead of letting an
    * unresolvable plan surface as an obscure analysis error later. */
  private def noSubquery(e: Expression, where: String): Expression = {
    if (e.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"graft: a subquery in $where is not supported — rewrite as " +
          "MERGE INTO … WHEN MATCHED THEN DELETE (key-set deletes) or " +
          "join the subquery into the source")
    e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case DeleteFromTable(GraftRel(t), condition) =>
        GraftDeleteCommand(t.dir,
          recolumn(noSubquery(condition, "DELETE WHERE")))

      case UpdateTable(GraftRel(t), assignments, condition) =>
        val set = assignments.map { a =>
          attrName(a.key).getOrElse(throw new UnsupportedOperationException(
            s"graft: UPDATE SET target must be a column: ${a.key.sql}")) ->
            recolumn(noSubquery(a.value, "UPDATE SET"))
        }
        GraftUpdateCommand(t.dir,
          condition.map(c => recolumn(noSubquery(c, "UPDATE WHERE")))
            .getOrElse(org.apache.spark.sql.functions.lit(true)),
          set)

      case m @ MergeIntoTable(GraftRel(t), source, cond,
          matched, notMatched, notMatchedBySource, withSchemaEvolution) =>
        // identity assignments: every SET/VALUES pairs a target column
        // with the same-named source column — the shape `UPDATE SET *` /
        // `INSERT *` expands to when the analyzer's own merge resolution
        // runs before this rule in the fixed point
        def identityAssigns(as: Seq[Assignment]): Boolean =
          as.forall(a => (attrName(a.key), attrName(a.value)) match {
            case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
            case _ => false
          })
        val upsertShape = (matched, notMatched) match {
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)))
              if notMatchedBySource.isEmpty && !withSchemaEvolution => true
          case (Seq(u: UpdateAction), Seq(i: InsertAction))
              if u.condition.isEmpty && i.condition.isEmpty &&
                identityAssigns(u.assignments) &&
                identityAssigns(i.assignments) &&
                notMatchedBySource.isEmpty && !withSchemaEvolution => true
          case _ => false
        }
        val deleteShape = (matched, notMatched) match {
          case (Seq(DeleteAction(None)), Seq())
              if notMatchedBySource.isEmpty && !withSchemaEvolution => true
          case _ => false
        }
        if (upsertShape)
          GraftMergeCommand(t.dir, source, mergeKeys(cond))
        else if (deleteShape)
          GraftMergeDeleteCommand(t.dir, source, mergeKeys(cond))
        else throw new UnsupportedOperationException(
          "graft: supported MERGE shapes are WHEN MATCHED THEN UPDATE " +
            "SET * WHEN NOT MATCHED THEN INSERT * (upsert) and WHEN " +
            "MATCHED THEN DELETE alone (key-set delete) — no action " +
            "conditions, no NOT MATCHED BY SOURCE, no schema evolution; " +
            "got: " + m.simpleString(5))

      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        if (t.pinnedVersion == 0 ||
            TxLog.liveFiles(t.dir, t.pinnedVersion).isEmpty)
          LocalRelation(r.output)
        else {
          val snapshot =
            TxLog.read(spark, t.dir, t.pinnedVersion).queryExecution.analyzed
          val byName = snapshot.output.map(a => a.name -> a).toMap
          val aligned = r.output.map { o =>
            val src = byName.getOrElse(o.name, throw new IllegalStateException(
              s"graft: snapshot of ${t.qualified} has no column '${o.name}' " +
                s"(snapshot: ${snapshot.output.map(_.name).mkString(", ")}) — " +
                "the table changed schema between load and read"))
            Alias(src, o.name)(exprId = o.exprId)
          }
          Project(aligned, snapshot)
        }
    }
}

/** `DELETE FROM graft.ns.t WHERE p` — executes the oracle-gated
  * copy-on-write delete verb. */
final case class GraftDeleteCommand(dir: String, condition: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.deleteWhere(session, dir, s"sqldel_${System.nanoTime()}", condition)
    Nil
  }
}

/** `UPDATE graft.ns.t SET ... WHERE p`. */
final case class GraftUpdateCommand(dir: String, condition: Column,
    set: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.updateWhere(session, dir, s"sqlupd_${System.nanoTime()}",
      condition, set)
    Nil
  }
}

/** `MERGE INTO graft.ns.t USING src ON keys THEN UPDATE SET * / INSERT *`
  * — the source plan re-analyzes at execution (it may itself read graft
  * tables or temp views), then folds through [[TxLog.merge]]. */
final case class GraftMergeCommand(dir: String, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.merge(session, dir, s"sqlmrg_${System.nanoTime()}",
      SqlBridge.ofRows(session, source), keys)
    Nil
  }
}

/** `MERGE INTO t USING src ON keys WHEN MATCHED THEN DELETE` (alone) —
  * the key-set delete: rows whose key appears in the source leave the
  * table ([[TxLog.deleteByKeys]]); not-matched source rows are ignored,
  * per the statement's (absent) NOT MATCHED clause. */
final case class GraftMergeDeleteCommand(dir: String, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.deleteByKeys(session, dir, s"sqlmrgdel_${System.nanoTime()}",
      SqlBridge.ofRows(session, source), keys)
    Nil
  }
}

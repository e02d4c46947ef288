package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.etl.TxParquetSink

/** METADATA AGGREGATE PUSHDOWN — the optimization every table format
  * teaches its engine ("SELECT COUNT(*) FROM t [WHERE …]" answered
  * from statistics), done the Spark-native way: a Catalyst optimizer
  * rule (injected via [[GraftExtensions]]) that rewrites a whole
  * count aggregate over a [[TxParquetSink]] snapshot scan into a
  * LITERAL local relation when — and only when — the sink's commit
  * log can prove the answer without reading a byte:
  *
  *  - the aggregate is a bare ungrouped `COUNT(literal)` (no DISTINCT,
  *    no filter clause, no other aggregates);
  *  - the child is Filter/Project/SubqueryAlias over ONE parquet scan
  *    whose root paths cover the table's CURRENT snapshot exactly
  *    ([[TxParquetSink.pathRows]] set equality — a pruned read, a
  *    stale plan, or a foreign parquet dir all fail the check);
  *  - [[TxParquetSink.countFromMetadata]] accepts: no row-hiding
  *    masks, and every file classifies Full or Excluded under the
  *    filters (reconstructed through `Expression.sql` → the sink's
  *    own predicate parser — an unparseable or boundary-cutting
  *    predicate stays on the scan plan).
  *
  * The rewrite is strictly answer-preserving or absent: every guard
  * failure leaves the original plan untouched, and the kernel never
  * launches a job (pure O(commits) driver metadata — safe inside the
  * optimizer). At 100 TB this turns monitoring-style counts on a
  * governed table into millisecond plans with NO scan stage at all —
  * the [[TxParquetSink.countWhere]] capability, now reachable from
  * plain `df.agg(count(...))` / SQL without calling a sink API. */
object MetadataAggregates extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, Seq(Alias(ae: AggregateExpression, _)), child, _)
        if isPlainCount(ae) =>
      metadataCount(child) match {
        case Some(n) => LocalRelation(agg.output, Seq(InternalRow(n)))
        case None => agg
      }
  }

  private def isPlainCount(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(l: Literal)) => l.value != null
      case _ => false
    })

  /** The provable count of a Filter/Project/Alias tree over one
    * full-coverage tx-table scan; None = any guard failed. */
  private def metadataCount(p: LogicalPlan): Option[Long] = {
    var filters = List.empty[Expression]
    def leafOf(n: LogicalPlan): Option[LogicalRelation] = n match {
      case f: Filter => filters ::= f.condition; leafOf(f.child)
      case pr: Project => leafOf(pr.child) // projections are 1:1 on rows
      case a: SubqueryAlias => leafOf(a.child)
      case lr: LogicalRelation => Some(lr)
      case _ => None
    }
    for {
      lr <- leafOf(p)
      fs <- lr.relation match {
        case h: HadoopFsRelation => Some(h)
        case _ => None
      }
      roots = fs.location.rootPaths.map(_.toUri.getPath)
      head <- roots.headOption
      table <- ManifestBroadcastJoins.tableRootOf(head)
      sink = TxParquetSink(table)
      // full-coverage check: the scan must read EXACTLY the current
      // snapshot (a pruned read or a post-plan commit fails equality)
      if roots.toSet == sink.pathRows().keySet
      predSql <- scala.util.Try(
        if (filters.isEmpty) None
        else Some(filters.map(_.sql).mkString("(", ") AND (", ")"))).toOption
      n <- sink.countFromMetadata(SparkSession.active, predSql)
    } yield n
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** THE CATALOG→SINK SUBSTITUTION — the resolution rule that makes
  * `SELECT … FROM graft.<table>` run on the transactional tier's own
  * plan instead of a reimplemented scan: every resolved
  * [[DataSourceV2Relation]] over a [[GraftTable]] is replaced by the
  * sink's resolved snapshot tree ([[graft.etl.TxParquetSink
  * .readSnapshot]] / `readVersion` for `VERSION AS OF`), with the
  * substituted tree's output attributes REMAPPED onto the relation's
  * exprIds — so references already bound to the catalog relation
  * (projections, filters, the whole analyzed parent plan) keep
  * resolving untouched, and no alias-Project is interposed that would
  * blind [[MetadataAggregates]]/[[MvRewrite]]/
  * [[ManifestBroadcastJoins]] to the scan underneath. The result:
  * the optimizer tier fires through pure SQL text exactly as it does
  * through the programmatic API, because past this rule the plans are
  * the same plan.
  *
  * Correctness notes:
  *  - The substitution happens INSIDE the analyzer's fixed-point
  *    resolution batch, so later iterations re-run
  *    `DeduplicateRelations` over the result — a self-join of the
  *    same catalog table (two substitutions sharing the cached
  *    snapshot frame's exprIds) is deduplicated like any
  *    `df.join(df)`.
  *  - V2 write commands keep their target: `AppendData`/overwrite
  *    hold the relation in a non-child `table` slot, so the traversal
  *    never rewrites a write target into a read plan.
  *  - An empty table (created, never written) substitutes to an empty
  *    [[LocalRelation]] with the relation's own attributes. */
class GraftCatalogRelations(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        // the table's own memoized resolution — the SAME frame
        // loadTable's schema probe built, so a VERSION AS OF query
        // constructs its historical relation exactly once
        t.resolvedFrame match {
          case None => LocalRelation(r.output, Seq.empty)
          case Some(df) =>
            val sub = df.queryExecution.analyzed
            val resolver = spark.sessionState.conf.resolver
            val mapping: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
              org.apache.spark.sql.catalyst.expressions.Attribute] =
              sub.output.flatMap { a =>
              r.output.collectFirst {
                case o if resolver(o.name, a.name) =>
                  a.exprId -> a.withExprId(o.exprId).withName(o.name)
              }
            }.toMap
            require(r.output.forall(o =>
              sub.output.exists(a => resolver(a.name, o.name))),
              s"graft table '${t.fullName}': catalog schema column(s) " +
                s"${r.output.map(_.name).diff(sub.output.map(_.name))
                  .mkString(", ")} missing from the snapshot plan")
            sub.transformUp { case n =>
              n.transformExpressions {
                case a: AttributeReference if mapping.contains(a.exprId) =>
                  mapping(a.exprId)
              }
            }
        }
    }
}

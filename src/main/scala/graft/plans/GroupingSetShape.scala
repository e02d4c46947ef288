package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Literal, NamedExpression, VirtualColumn}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.Expand

/** The decomposed Aggregate-over-Expand shape that GROUPING SETS /
  * ROLLUP / CUBE compile to: the grouping-id attribute, the Expand's
  * group-copy attributes, and — per Expand projection — the
  * grouping-id literal plus which group copies the set KEEPS (mapped
  * back to the child attribute each copy passes through; a rolled-up
  * copy appears as a null literal in the projection). Shared by
  * [[MvRewrite]] (per-set branches served from a registered view) and
  * [[MetadataAggregates]] (per-set branches answered from commit-log
  * manifests) so the two rewrites can never drift on shape parsing. */
private[plans] object GroupingSetShape {

  final case class Shape(
      gid: AttributeReference,
      setCols: Seq[AttributeReference],
      sets: Seq[(Literal, Map[ExprId, AttributeReference])])

  /** Parses `groups` (the rollup Aggregate's grouping attributes, one
    * of which is `spark_grouping_id`) against the Expand. None when a
    * projection carries a computed grouping expression or a
    * non-literal grouping id — the caller keeps the scan. */
  def of(groups: Seq[AttributeReference], expand: Expand): Option[Shape] = {
    val gid = groups.find(_.name == VirtualColumn.groupingIdName)
      .getOrElse(return None)
    val setCols = groups.filterNot(_.exprId == gid.exprId)
    def pos(a: AttributeReference): Int =
      expand.output.indexWhere(_.exprId == a.exprId)
    val gidPos = pos(gid)
    val colPos = setCols.map(c => c -> pos(c)).toMap
    if (gidPos < 0 || colPos.valuesIterator.exists(_ < 0)) return None
    val sets = expand.projections.map { proj =>
      val gl = proj(gidPos) match {
        case l: Literal => l
        case _ => return None
      }
      val inc = setCols.flatMap { c =>
        proj(colPos(c)) match {
          case a: AttributeReference => Seq(c.exprId -> a)
          case Literal(null, _) => Nil
          case _ => return None // a computed grouping expression
        }
      }.toMap
      (gl, inc)
    }
    Some(Shape(gid, setCols, sets))
  }

  /** Every output must be reconstructible per branch: a grouping
    * column of the rollup (possibly aliased — `grouping_id()` lands as
    * an alias of the gid attribute) or an aggregate the caller's
    * machinery supports. */
  def outputsOk(groups: Seq[AttributeReference],
      aggs: Seq[NamedExpression],
      supported: AggregateExpression => Boolean): Boolean =
    aggs.forall {
      case a: AttributeReference => groups.exists(_.exprId == a.exprId)
      case Alias(a: AttributeReference, _) =>
        groups.exists(_.exprId == a.exprId)
      case Alias(ae: AggregateExpression, _) => supported(ae)
      case _ => false
    }
}

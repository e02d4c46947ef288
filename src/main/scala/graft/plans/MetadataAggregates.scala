package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.TxParquetSink

/** METADATA AGGREGATE PUSHDOWN — the optimization every table format
  * teaches its engine ("SELECT COUNT(*)/MIN/MAX/SUM FROM t [WHERE …]"
  * answered from statistics), done the Spark-native way: a Catalyst
  * optimizer rule (injected via [[GraftExtensions]]) that rewrites a
  * whole ungrouped aggregate over a [[TxParquetSink]] snapshot scan
  * into a LITERAL local relation when — and only when — the sink's
  * commit log can prove every requested value without reading a byte:
  *
  *  - the child is Filter/Project/SubqueryAlias over ONE parquet scan
  *    whose root paths cover the table's CURRENT snapshot exactly
  *    ([[TxParquetSink.pathRows]] set equality — a pruned read, a
  *    stale plan, or a foreign parquet dir all fail the check);
  *  - with filters present, only `COUNT(literal)` aggregates rewrite,
  *    through [[TxParquetSink.countFromMetadata]] (no masks, every
  *    file Full or Excluded under the filters reconstructed via
  *    `Expression.sql` → the sink's own predicate parser);
  *  - with no filters, `COUNT(literal)`, `COUNT(col)`, `MIN`/`MAX`
  *    (string / integral / date columns), and `SUM` (integral, when
  *    the exact manifest fold fits the engine's long) ALL rewrite,
  *    through [[TxParquetSink.columnMetaProfile]] — and only if EVERY
  *    aggregate in the list is answerable (all-or-nothing: a plan is
  *    never half-rewritten).
  *
  * The rewrite is strictly answer-preserving or absent: every guard
  * failure leaves the original plan untouched, and the kernels never
  * launch a job (pure O(commits) driver metadata — safe inside the
  * optimizer). At 100 TB this turns monitoring-style profiles of a
  * governed table into millisecond plans with NO scan stage at all —
  * the [[TxParquetSink.statsAggregate]] capability, now reachable
  * from plain `df.agg(...)` / SQL without calling a sink API. */
object MetadataAggregates extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggs, child, _)
        if aggs.nonEmpty && aggs.forall {
          case Alias(ae: AggregateExpression, _) => supported(ae)
          case _ => false
        } =>
      answer(child, aggs.map { case Alias(ae: AggregateExpression, _) => ae })
        .map(vs => LocalRelation(agg.output, Seq(InternalRow(vs: _*))))
        .getOrElse(agg)
  }

  private def supported(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(l: Literal)) => l.value != null
      case Count(Seq(_: AttributeReference)) => true
      case Min(_: AttributeReference) => true
      case Max(_: AttributeReference) => true
      case Sum(a: AttributeReference, _) => a.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      case _ => false
    })

  private def isPlainCount(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case Count(Seq(l: Literal)) => l.value != null
      case _ => false
    }

  /** All the aggregates' literal values, or None if any guard fails. */
  private def answer(p: LogicalPlan,
      aggs: Seq[AggregateExpression]): Option[Seq[Any]] = {
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
      values <-
        if (filters.nonEmpty) filteredCounts(sink, filters, aggs)
        else wholeTable(sink, aggs)
    } yield values
  }

  /** Filtered path: every aggregate must be a plain count, answered by
    * the Full/Excluded file classification. */
  private def filteredCounts(sink: TxParquetSink, filters: Seq[Expression],
      aggs: Seq[AggregateExpression]): Option[Seq[Any]] =
    for {
      _ <- if (aggs.forall(isPlainCount)) Some(()) else None
      predSql <- scala.util.Try(
        filters.map(_.sql).mkString("(", ") AND (", ")")).toOption
      n <- sink.countFromMetadata(SparkSession.active, Some(predSql))
    } yield aggs.map(_ => n: Any)

  /** Unfiltered path: counts, extremes, and exact sums from the
    * per-column manifest profiles — all-or-nothing. */
  private def wholeTable(sink: TxParquetSink,
      aggs: Seq[AggregateExpression]): Option[Seq[Any]] = {
    lazy val rows = sink.countFromMetadata(SparkSession.active, None)
    val profiles = scala.collection.mutable.Map.empty[String,
      Option[TxParquetSink.ColMetaProfile]]
    def profile(a: AttributeReference) =
      profiles.getOrElseUpdate(a.name, sink.columnMetaProfile(a.name))
    val vs = aggs.map { ae =>
      ae.aggregateFunction match {
        case Count(Seq(_: Literal)) => rows.map(n => n: Any)
        case Count(Seq(a: AttributeReference)) =>
          profile(a).flatMap(_.nonNull).map(n => n: Any)
        case Min(a: AttributeReference) =>
          profile(a).flatMap(p => typed(p.min, a.dataType))
        case Max(a: AttributeReference) =>
          profile(a).flatMap(p => typed(p.max, a.dataType))
        case Sum(a: AttributeReference, _) =>
          // the scanning plan's long sum would wrap on overflow; the
          // exact fold only substitutes when no wrap can occur
          profile(a).flatMap(_.sum).filter(_.isValidLong)
            .map(s => s.toLong: Any)
        case _ => None
      }
    }
    if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
  }

  /** A cast-to-string manifest extremum back in the engine's type —
    * only domains whose round-trip is exact. */
  private def typed(v: String, dt: DataType): Option[Any] =
    scala.util.Try[Any] {
      dt match {
        case StringType => UTF8String.fromString(v)
        case LongType => v.toLong
        case IntegerType => v.toInt
        case ShortType => v.toShort
        case ByteType => v.toByte
        case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
        case _ => throw new IllegalArgumentException("unsupported")
      }
    }.toOption
}

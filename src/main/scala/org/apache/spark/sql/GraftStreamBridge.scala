package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Bridge into the two `private[sql]` pieces a V1 streaming `Source`
  * needs to hand back micro-batch DataFrames (the FileStreamSource
  * pattern): batches must carry `isStreaming = true`, which public
  * DataFrame constructors cannot set. Used by
  * [[graft.streaming.GraftCdcSource]]. */
object GraftStreamBridge {

  /** A batch-constructed frame re-marked as a streaming micro-batch:
    * every scan leaf flips `isStreaming` (the plan is otherwise
    * untouched — same relations, same masks, same pushdown). */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(spark, df.queryExecution.logical.transformUp {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    })
  }

  /** An empty streaming micro-batch with `schema` (a no-news tick). */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` hook a V1 streaming [[
  * org.apache.spark.sql.execution.streaming.Source]] needs: `getBatch`
  * must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for that is `SparkSession.internalCreateDataFrame` —
  * the same call Spark's own V1 sources (FileStreamSource et al.)
  * make. This bridge lives in an `org.apache.spark.sql` subpackage
  * solely to satisfy the `private[sql]` qualifier; it adds no other
  * behavior.
  */
object StreamingFrame {
  def apply(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): Dataset[Row] =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)
}

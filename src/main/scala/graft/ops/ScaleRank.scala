package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe global ranking.
  *
  * `Window.orderBy(k)` with no partition spec plans a SINGLE-PARTITION
  * WindowExec — every row moves to one task, which is a scale-killer at
  * cluster data sizes. This helper produces the same global
  * `row_number()` with bounded partitions: range-shuffle on the sort
  * key (each output partition holds one key range), sort within
  * partitions, then `zipWithIndex` — Spark's per-partition-count →
  * broadcast-prefix-offset → local-index recipe (one lightweight count
  * job; no second data movement). The same shape `p_seq_pack` proves
  * for packing and `orderBy`-writes use for range-partitioned output.
  *
  * The order must be a TOTAL order (add a unique tie-break column):
  * ties that straddle a range boundary would otherwise take
  * partitioner-dependent ranks.
  */
object ScaleRank {

  /** df + a 1-based global rank column ordered by `order`. */
  def withGlobalRank(df: DataFrame, rankCol: String,
      order: Column*): DataFrame = {
    val parted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(parted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    parted.sparkSession.createDataFrame(
      parted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /** df + a 0-based contiguous index in current partition order (no
    * shuffle at all) — for batch/chunk assignment where any stable
    * order is acceptable, e.g. CALL { } IN TRANSACTIONS batching.
    */
  def withPartitionOrderIndex(df: DataFrame, idxCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(idxCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }
}

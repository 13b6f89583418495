package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming vector-index maintenance — the stateful half of the IVF
  * ANN family (VectorOps.v_knn_ivf): vectors arrive as a stream, each
  * is assigned to its nearest coarse centroid with EXACTLY the batch
  * trainer's arithmetic (cosine over sequential-fold dot products,
  * lowest-cid tie-break), and per-cell state accumulates (count,
  * integer-micro norm mass) — the bookkeeping a streaming ingest
  * needs to keep an IVF index balanced: cell sizes drive the
  * rebucket/retrain decision, the same dial GraphStore.maintain turns
  * for the graph buckets. Centroids ride the task closure (the
  * broadcast analog — a cluster run ships them once per executor,
  * like the batch query's broadcast join). State is two longs per
  * cell, RocksDB-spillable, keyed exactly like the batch groupBy.
  */
object VectorStreams {

  case class VecEvent(vec_id: Long, v: Seq[Double])
  case class CellStats(cid: Long, n: Long, normMicroSum: Long)

  /** nearest centroid by cosine; ties break to the LOWEST cid — the
    * batch assignment's row_number((csim DESC, cid)) order. The dot
    * product folds left-to-right like Spark's aggregate(zip_with…),
    * so stream and batch compute bit-identical doubles.
    */
  def assignCell(v: Seq[Double], cents: Seq[(Long, Seq[Double])]): Long = {
    val vn = math.sqrt(dot(v, v))
    var best = -1L
    var bestSim = Double.NegativeInfinity
    cents.foreach { case (cid, cv) =>
      val sim = dot(v, cv) / (vn * math.sqrt(dot(cv, cv)))
      if (sim > bestSim || (sim == bestSim && cid < best)) {
        bestSim = sim
        best = cid
      }
    }
    best
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def ivfIngestStream(vecs: Dataset[VecEvent],
      cents: Seq[(Long, Seq[Double])]): Dataset[CellStats] = {
    import vecs.sparkSession.implicits._
    vecs.groupByKey(e => assignCell(e.v, cents))
      .mapGroupsWithState[(Long, Long), CellStats](
        GroupStateTimeout.NoTimeout) {
        (cid: Long, rows: Iterator[VecEvent],
         state: GroupState[(Long, Long)]) =>
          var (n, nm) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { e =>
            n += 1
            nm += math.round(math.sqrt(dot(e.v, e.v)) * 1e6)
          }
          state.update((n, nm))
          CellStats(cid, n, nm)
      }
  }

  case class VxRow(cell: String, gid: String, norm: Double)

  /** Streaming vector-index ASSIGNMENT — the row-shape twin of the
    * store's CREATE VECTOR INDEX maintenance (SearchIndexes
    * .assignCells): each arriving vector emits its (cell, gid, norm)
    * row against the broadcast centroids with the exact batch
    * affinity (cosine, or euclidean's 2·v·c − |c|² — same argmax,
    * lowest-cid tie-break). Row-local, stateless, append mode; a
    * live ingest sinks these into the `cell=<cid>/bucket=H(gid)`
    * layout the batch commit maintains.
    */
  def vxAssignStream(vecs: Dataset[VecEvent],
      cents: Seq[(Long, Seq[Double])],
      sim: String = "cosine"): Dataset[VxRow] = {
    import vecs.sparkSession.implicits._
    vecs.map { e =>
      val vn = math.sqrt(dot(e.v, e.v))
      var best = -1L
      var bestAff = Double.NegativeInfinity
      cents.foreach { case (cid, cv) =>
        val aff =
          if (sim == "euclidean")
            2.0 * dot(e.v, cv) - dot(cv, cv)
          else dot(e.v, cv) / (vn * math.sqrt(dot(cv, cv)))
        // java.lang.Double.compare, NOT >: a zero-norm vector under
        // cosine yields NaN for EVERY centroid, and IEEE NaN > x is
        // always false — best would stay -1 and the row would land in
        // a cell ("c-1") the batch layout never creates. The batch
        // assignment (SearchIndexes.assignCells) orders by Spark's
        // double ordering, where NaN sorts ABOVE any affinity and
        // ties break to the lowest cid — compare matches it
        val c = java.lang.Double.compare(aff, bestAff)
        if (best < 0 || c > 0 || (c == 0 && cid < best)) {
          bestAff = aff
          best = cid
        }
      }
      VxRow(s"c$best", s"v:${e.vec_id}", vn)
    }
  }
}

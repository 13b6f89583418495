package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Entity
import graft.store.GraphStore

/** Dataset-level write API: the Spark analog of the reference's
  * buffered dataset writers (/root/reference/layer.go:196-250).
  * Entities stream in, are buffered to `batchSize`, and each flush runs
  * one merge job (A1 buffered writer, A2 flush-on-close, A3 full-sync
  * truncate gate, A4 incremental).
  */
class GraphDataset(
    store: GraphStore,
    spark: SparkSession,
    val name: String,
    val label: String,
    val batchSize: Int = 1000) {
  import spark.implicits._

  /** Full sync: truncate the label+source slice on the first batch,
    * then load (/root/reference/layer.go:196-209).
    */
  def fullSync(entities: IterableOnce[Entity], syncId: String = ""): Long = {
    var first = true
    var ver = store.currentVersion
    entities.iterator.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
      ver = GraphMerge.applyBatch(store, name, label, chunk.toDS(),
        truncateFirst = first,
        syncId = if (syncId.isEmpty) "" else s"$syncId/$i")
      first = false
    }
    if (first) { // empty stream still truncates
      ver = GraphMerge.applyBatch(store, name, label,
        spark.emptyDataset[Entity], truncateFirst = true, syncId = syncId)
    }
    ver
  }

  /** Incremental sync: same merge, no truncate
    * (/root/reference/layer.go:211-215).
    */
  def incremental(entities: IterableOnce[Entity], syncId: String = ""): Long = {
    var ver = store.currentVersion
    entities.iterator.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
      ver = GraphMerge.applyBatch(store, name, label, chunk.toDS(),
        syncId = if (syncId.isEmpty) "" else s"$syncId/$i")
    }
    ver
  }
}

/** Read surface: the contracts the reference declares but stubs
  * (/root/reference/layer.go:257-265, neo4j.go:289-291), made real.
  */
object GraphRead {

  /** D3 paginated entity scan — keyset pagination on gid; lowers to
    * Spark's TakeOrderedAndProject, no global sort materialized.
    */
  def entities(store: GraphStore, label: String, source: String,
      from: String = "", limit: Int = 1000): DataFrame = {
    val n = store.nodes
    n.filter(n("label") === label && n("source") === source)
      .filter(if (from.isEmpty) lit(true) else n("gid") > from)
      .orderBy("gid").limit(limit)
  }

  /** D2 change feed with continuation token + latest-only dedup.
    * `recorded` is the commit version stamped by the merge job. The
    * continuation token is the COMPOUND keyset (recorded, gid) of the
    * last row seen — `since` alone would skip the unreturned remainder
    * of a version when `limit` cuts inside one commit.
    */
  def changes(store: GraphStore, since: Long = 0L, afterGid: String = "",
      limit: Int = 1000, latestOnly: Boolean = false,
      labelSource: Option[(String, String)] = None): DataFrame = {
    var n = store.nodes.filter(
      col("recorded") > since ||
        (col("recorded") === since && lit(afterGid) =!= "" &&
          col("gid") > afterGid))
    labelSource.foreach { case (l, s) =>
      n = n.filter(col("label") === l && col("source") === s)
    }
    val base =
      if (!latestOnly) n
      else {
        val w = Window.partitionBy(col("gid")).orderBy(col("recorded").desc)
        n.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    base.orderBy("recorded", "gid").limit(limit)
  }

  /** D3 in EGDM shape: entities with their reference maps
    * reconstructed from outgoing edges — what a UDA client expects
    * back (the inverse of the A6/A9 projections).
    */
  def entitiesEgdm(store: GraphStore, label: String, source: String,
      from: String = "", limit: Int = 1000): DataFrame = {
    val page = entities(store, label, source, from, limit)
    val e = store.edges.select(col("src"), col("dst"), col("relType"))
    val refs = page.select(col("gid")).join(e, page("gid") === e("src"))
      .groupBy(col("gid"), col("relType"))
      .agg(sort_array(collect_list(col("dst"))).as("targets"))
      .groupBy(col("gid"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("relType"), col("targets"))))).as("refs"))
    page.join(refs, Seq("gid"), "left_outer")
      .select(col("gid").as("id"), lit(false).as("deleted"),
        col("props"), col("refs"), col("recorded"))
      .orderBy("id")
  }

  /** C1-C5: the reference's test-oracle query
    * (/root/reference/layer_test.go:117) —
    * {{{
    * MATCH (n:Label) WHERE n.source = $src
    * OPTIONAL MATCH (n)-[r]->(m)
    * RETURN n, COLLECT({rel: r, targetGid: m.gid}) AS relationships
    * }}}
    * Zero-match nodes yield one row with `[{null, null}]`, matching
    * Cypher's COLLECT over OPTIONAL MATCH
    * (/root/reference/layer_test.go:222-231): the left-outer join
    * produces null rel/target columns, and `struct(null, null)` is a
    * non-null struct, so `collect_list` keeps it.
    */
  def collectRelationships(store: GraphStore, label: String,
      source: String): DataFrame = {
    val n = store.nodes.filter(col("label") === label && col("source") === source)
    val e = store.edges.select(col("src"), col("dst"), col("relType"))
    val m = store.nodes.select(col("gid").as("m_gid"))
    n.join(e, n("gid") === e("src"), "left_outer")
      .join(m, e("dst") === m("m_gid"), "left_outer")
      .groupBy(n("gid"), n("label"), n("source"), n("props"))
      .agg(sort_array(collect_list(struct(
        col("relType").as("rel"), col("m_gid").as("targetGid"))))
        .as("relationships"))
  }
}

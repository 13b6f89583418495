package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.cypher.CypherEngine
import graft.model.Entity
import graft.ops.GraphDataset
import graft.store.GraphStore

/** Store-scale smoke drive: the registry's graph stores are built from
  * the 25-row nation table, so this main exercises the SAME pipeline
  * at the customer scale of the chosen SF dir (15k nodes / 150k edges
  * at sf0.1) — full sync, incremental upsert into a multi-bucket
  * store, bucket-probe pruning, DETACH DELETE, and a Cypher read —
  * printing per-phase seconds. Run:
  * {{{ sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1" }}}
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SMOKE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val customers = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
      .as[(Long, String, Double, Int)].collect().toSeq
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toSeq
    println(s"SMOKE corpus ${customers.size} customers, ${orders.size} orders")

    val entities = customers.map { case (ck, name, bal, nk) =>
      Entity(s"c:$ck")
        .withProp("urn:p#name", name)
        .withProp("urn:p#acctbal", bal)
        .withRef("urn:r#located_in", s"n:$nk")
    }
    val orderEntities = orders.map { case (ok, ck) =>
      Entity(s"o:$ok").withRef("urn:r#ordered_by", s"c:$ck")
    }

    val store = new GraphStore(
      Files.createTempDirectory("graft-smoke").toString, spark,
      numBuckets = 8)
    // bulk loads use a bulk batch size (the reference's batch_size is
    // configurable the same way, layer.go:229) — the 1000-entity
    // default would turn this into 165 separate commits
    val ds = new GraphDataset(store, spark, "tpch", "Customer",
      batchSize = 1 << 20)

    time("full-sync customers") { ds.fullSync(entities, syncId = "s1") }
    val ods = new GraphDataset(store, spark, "tpch-orders", "Order",
      batchSize = 1 << 20)
    time("incremental orders") { ods.incremental(orderEntities) }
    println(s"SMOKE nodes=${store.nodes.count()} edges=${store.edges.count()}")

    // 10-entity incremental into the 15k-node label: bucket pruning
    // should keep this cheap and rewrite few buckets
    val before = store.manifestFiles("nodes")
    time("10-entity incremental") {
      ds.incremental((1 to 10).map(i =>
        Entity(s"c:$i").withProp("urn:p#name", s"UPDATED-$i")))
    }
    val after = store.manifestFiles("nodes")
    val changed = (after.keySet ++ before.keySet)
      .count(k => after.get(k) != before.get(k))
    println(s"SMOKE buckets-rewritten=$changed of ${after.size}")

    time("cypher read") {
      val n = CypherEngine.query(store,
        """MATCH (o:Order)-[:ordered_by]->(c:Customer)
           WHERE c.name = 'UPDATED-1'
           RETURN c.gid AS gid, count(*) AS n_orders""").collect()
      println(s"SMOKE read rows=${n.length}")
    }
    // property-index point lookup: unindexed scan vs the declared
    // RANGE index route (px bucket probe + gid-bucket node read)
    def pointLookup(label: String): Double = {
      val t0 = System.nanoTime()
      val r = CypherEngine.query(store,
        "MATCH (c:Customer {name: 'UPDATED-7'}) RETURN c.gid AS gid")
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE point-lookup($label) ${secs}%.2f s rows=${r.length}")
      assert(r.length == 1, s"point lookup rows: ${r.length}")
      secs
    }
    // STARTS WITH lookup: unindexed scan vs the order-preserving
    // sect=r bucket-span route of the same index
    def prefixLookup(label: String): Double = {
      val t0 = System.nanoTime()
      val r = CypherEngine.query(store,
        """MATCH (c:Customer) WHERE c.name STARTS WITH 'UPDATED-'
           RETURN c.gid AS gid""").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE prefix-lookup($label) ${secs}%.2f s rows=${r.length}")
      assert(r.length == 10, s"prefix lookup rows: ${r.length}")
      secs
    }
    val scanSecs = pointLookup("scan")
    val scanPfx = prefixLookup("scan")
    time("create property index") {
      CypherEngine.query(store,
        "CREATE INDEX cname FOR (c:Customer) ON (c.name)").collect()
    }
    val idxSecs = pointLookup("indexed")
    println(f"SMOKE point-lookup speedup ${scanSecs / idxSecs}%.1fx")
    val idxPfx = prefixLookup("indexed")
    println(f"SMOKE prefix-lookup speedup ${scanPfx / idxPfx}%.1fx")
    time("detach-delete 100") {
      val r = CypherEngine.query(store,
        "MATCH (c:Customer) WHERE c.acctbal < -900.0 DETACH DELETE c")
        .collect()
      println(s"SMOKE deleted=${r.head.getAs[Long]("nodes_deleted")}")
    }
    spark.stop()
  }
}

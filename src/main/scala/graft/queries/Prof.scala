package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.cypher.CypherEngine
object Prof {
  @volatile var jobs = 0
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (sys.env.contains("PROF_JOBS")) {
          // the future-wrapped commit jobs all report the same
          // CompletableFuture call site — the first graft.* frame of
          // the final stage's stack names the real origin
          val origin = j.stageInfos.lastOption.map { si =>
            si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Prof"))
              .getOrElse(si.name).trim
          }.getOrElse("?")
          println(s"JOB stages=${j.stageInfos.length} $origin")
        }
      }
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs; val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime()-t0)/1e9}%.2f s ${jobs-j0} jobs"); r
    }
    spark.range(1000).count()
    time("fresh-store-build-1") { GraphOnTpch.freshNationStore(spark, dir) }
    val st2 = time("fresh-store-build-2") { GraphOnTpch.freshNationStore(spark, dir) }
    time("detach-delete") {
      CypherEngine.query(st2, "MATCH (n:Nation) WHERE n.gid >= 'n:10' DETACH DELETE n").collect()
    }
    time("read-after") {
      CypherEngine.query(st2, "MATCH (m)<-[:in_region]-(n:Nation) RETURN m.gid AS region, count(*) AS n ORDER BY region").collect()
    }
    val st3 = time("fresh-store-build-3") { GraphOnTpch.freshNationStore(spark, dir) }
    time("create-node") { CypherEngine.query(st3, "CREATE (x:Nation {gid: 'n:99', name: 'ATLANTIS'})").collect() }
    time("create-edge") { CypherEngine.query(st3, "MATCH (a:Nation), (b) WHERE a.gid = 'n:99' AND b.gid = 'r:0' CREATE (a)-[:in_region]->(b)").collect() }
    time("set-prop") { CypherEngine.query(st3, "MATCH (n:Nation) WHERE n.gid = 'n:1' SET n.name = 'RENAMED'").collect() }

    // the cypher_ref_templates shape, statement by statement — where
    // does the write-latency go?
    {
      val store = new graft.store.GraphStore(
        java.nio.file.Files.createTempDirectory("graft-prof-tpl").toString,
        spark, numBuckets = 2)
      val rows = Relational.t(spark, dir, "nation").collect()
      val items: Seq[Map[String, Any]] = rows.toSeq.map(r => Map(
        "gid" -> s"n:${r.getAs[Int]("n_nationkey")}",
        "source" -> "nations",
        "name" -> r.getAs[String]("n_name")))
      val edgeItems: Seq[Map[String, Any]] = rows.toSeq.map(r => Map(
        "from" -> s"n:${r.getAs[Int]("n_nationkey")}",
        "to" -> s"r:${r.getAs[Int]("n_regionkey")}",
        "source" -> "nations", "type" -> "in_region"))
      val targetItems = edgeItems.map(m => Map("gid" -> m("to"))).distinct
      val sess = CypherEngine.session(store)
      if (sys.env.contains("PROF_NOAQE"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (sys.env.contains("PROF_NOCODEGEN")) {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      }
      if (sys.env.contains("PROF_SHUF"))
        spark.conf.set("spark.sql.shuffle.partitions",
          sys.env("PROF_SHUF").toInt)
      time("tpl-1-update-node") { sess.run("""
UNWIND $items AS item
MERGE (n {gid: item.gid})
WITH n, item
OPTIONAL MATCH (n)-[r]->()
DELETE r
SET n:Nation
SET n = item
""", Map("items" -> items)).collect() }
      time("tpl-2-target-node") { sess.run("""
UNWIND $items AS item
MERGE (n {gid: item.gid })
""", Map("items" -> targetItems)).collect() }
      time("tpl-3-update-edge") { sess.run("""
UNWIND $items AS item
MATCH (n1 {gid: item.from})
MATCH (n2 {gid: item.to})
MERGE (n1)-[r:in_region]->(n2)
SET r.source = item.source
SET r.type = item.type
""", Map("items" -> edgeItems)).collect() }
      time("tpl-4-delete-node") { sess.run("""
UNWIND $items AS item
MATCH (n {gid: item.gid})
DETACH DELETE n
""", Map("items" -> items.filter(
        _("gid").asInstanceOf[String] >= "n:20"))).collect() }
      time("tpl-commit") { sess.commit() }
      time("tpl-read") { CypherEngine.query(store,
        """MATCH (n:Nation)-[r:in_region]->(m)
           RETURN n.gid AS gid, n.name AS name, n.source AS src,
                  m.gid AS region
           ORDER BY gid""").collect() }
    }
    spark.stop()
  }
}

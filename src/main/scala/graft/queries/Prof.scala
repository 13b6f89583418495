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
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
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
    spark.stop()
  }
}

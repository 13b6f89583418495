package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cypher.CypherEngine
import graft.store.GraphStore

/** Plan audit of the property-index routes: prints the px probe's
  * pushed filters and the routed node read's file counts. */
object PxPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = new GraphStore(
      java.nio.file.Files.createTempDirectory("pxplan").toString, spark, 8)
    st.localizeTinyTables = false
    val sess = CypherEngine.session(st)
    (1 to 500).foreach { i =>
      sess.run(f"CREATE (:P {gid: 'p:$i', age: $i, nm: 'u$i%04d'})")
        .collect() }
    sess.commit()
    CypherEngine.query(st, "CREATE INDEX ax FOR (p:P) ON (p.age)").collect()
    val d = st.indexDef("ax").get
    println(s"PROBE boundaries=${d.boundaries.size} n=${d.boundaryN}")
    // raw probe frame: does the val range reach the parquet scan?
    val lo = graft.store.SearchIndexes.encodeSortableValue(480.0).get
    val probe = st.readSearchIndex(d, st.pxRangeKeys(d, Some(lo), Some("n:G")))
      .filter(org.apache.spark.sql.functions.col("sect") === "r" &&
        org.apache.spark.sql.functions.col("val") >= lo)
    val plan = probe.queryExecution.executedPlan.toString
    println("PROBE pushed=" + plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString(" | ").take(400))
    println(s"PROBE pxAll=${st.readSearchIndex(d, _ => true).inputFiles.length} " +
      s"probeFiles=${probe.inputFiles.length}")
    val q = CypherEngine.query(st,
      "MATCH (p:P) WHERE p.age > 480 RETURN p.gid AS gid ORDER BY gid")
    println(s"PROBE rows=${q.count()} nodeAll=${st.nodes.inputFiles.length} " +
      s"routed=${q.inputFiles.length}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphAnalytics

/** Pins the DataFrame triangle counter: orientation correctness on a
  * known graph, the dedup default on messy (parallel/mutual) edge
  * multisets, and the `undirectedUnique` fast-path contract being a
  * pure optimization (identical counts when the contract holds).
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def counts(nodes: Seq[String], edges: Seq[(String, String)],
      unique: Boolean): Map[String, Long] = {
    val n = nodes.toDF("gid")
    val e = edges.toDF("src", "dst").withColumn("relType", lit("t"))
    GraphAnalytics.triangleCounts(spark, n, e, undirectedUnique = unique)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("triangle counts on K4 minus one edge (two triangles)") {
    // a-b-c-d complete minus (a,d): triangles abc and bcd; b,c in both
    val nodes = Seq("a", "b", "c", "d")
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d",
      "c" -> "d")
    val got = counts(nodes, edges, unique = true)
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("default path dedups parallel, mutual, and self edges") {
    val nodes = Seq("a", "b", "c")
    val messy = Seq("a" -> "b", "b" -> "a", "a" -> "b", // mutual + parallel
      "b" -> "c", "c" -> "a", "a" -> "a") // self loop
    val got = counts(nodes, messy, unique = false)
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("undirectedUnique elision matches the safe path when the " +
      "contract holds") {
    val nodes = (1 to 20).map(i => s"v$i")
    // a ring plus chords — unique directed edges, no mutual pairs
    val ring = (1 to 20).map(i => s"v$i" -> s"v${i % 20 + 1}")
    val chords = (1 to 10).map(i => s"v$i" -> s"v${i + 2}")
    assert(counts(nodes, ring ++ chords, unique = true) ==
      counts(nodes, ring ++ chords, unique = false))
  }

  test("gx_kcore == an in-memory reference peel (6 rounds, k=6)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(concat(lit("o:"), $"l_orderkey"),
        concat(lit("p:"), $"l_partkey"))
      .distinct().as[(String, String)].collect()
    val eu = (e ++ e.map(_.swap)).toSeq
    var v = eu.map(_._1).toSet
    for (_ <- 1 to 6) {
      val deg = eu.filter(p => v(p._1) && v(p._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      v = deg.filter(_._2 >= 6).keySet
    }
    val expected = eu.filter(p => v(p._1) && v(p._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = queries.GraphXQ.defs("gx_kcore")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    // the fixture actually peels: some vertex must have died
    assert(v.size < eu.map(_._1).distinct.size)
  }

  test("driver-local analytics twins are bit-equal to the distributed " +
      "path (pageRankMicro, degrees, connectedComponents)") {
    import spark.implicits._
    // two components, a parallel edge, a dangling edge (endpoint not
    // in the node set — build()'s inner dict joins drop it), an
    // isolated node, and a sink with no out-edges
    val nodes = Seq("a", "b", "c", "d", "e", "f", "iso").toDF("gid")
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"),
      ("e", "f"), ("f", "e"), ("a", "ghost"), ("ghost", "b"))
      .toDF("src", "dst").withColumn("relType", lit("t"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(
      m(GraphAnalytics.pageRankMicroLocal(spark, nodes, edges, 5)) ==
        m(GraphAnalytics.pageRankMicro(spark, nodes, edges, 5)))
    assert(
      m(GraphAnalytics.degreesLocal(spark, nodes, edges)) ==
        m(GraphAnalytics.degrees(spark, nodes, edges)))
    assert(
      m(GraphAnalytics.connectedComponentsLocal(spark, nodes, edges)) ==
        m(GraphAnalytics.connectedComponents(spark, nodes, edges)))
  }

  test("gx_triangles undirectedUnique contract: edge union has no " +
      "mutual or parallel pairs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val und = queries.GraphXQ.trianglesEdgeUnion(spark, dir)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
    val total = und.count()
    val distinctPairs = und.distinct().count()
    assert(total == distinctPairs,
      s"gx_triangles passes undirectedUnique=true but the fixture has " +
        s"${total - distinctPairs} duplicate unordered pairs — remove the " +
        "flag or fix the edge families")
  }
}

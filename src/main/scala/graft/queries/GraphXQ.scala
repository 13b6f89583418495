package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GraphAnalytics

/** GraphX analytics over the TPC-H property graph (customer →nation→
  * region star, suppliers attached): connected components and degrees
  * carry exact DuckDB oracles (deterministic integer algorithms);
  * PageRank is registered rows-only (float iteration order).
  */
object GraphXQ {
  import Relational.t

  /** nodes: customers, nations, suppliers + region stubs;
    * edges: located_in (c→n), based_in (s→n), in_region (n→r).
    */
  private def graphTables(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val nodes =
      t(s, dir, "customer").select(concat(lit("c:"), $"c_custkey").as("gid"))
        .unionByName(t(s, dir, "nation")
          .select(concat(lit("n:"), $"n_nationkey").as("gid")))
        .unionByName(t(s, dir, "supplier")
          .select(concat(lit("s:"), $"s_suppkey").as("gid")))
        .unionByName(t(s, dir, "region")
          .select(concat(lit("r:"), $"r_regionkey").as("gid")))
    val edges =
      t(s, dir, "customer").select(
        concat(lit("c:"), $"c_custkey").as("src"),
        concat(lit("n:"), $"c_nationkey").as("dst"),
        lit("located_in").as("relType"))
        .unionByName(t(s, dir, "supplier").select(
          concat(lit("s:"), $"s_suppkey").as("src"),
          concat(lit("n:"), $"s_nationkey").as("dst"),
          lit("based_in").as("relType")))
        .unionByName(t(s, dir, "nation").select(
          concat(lit("n:"), $"n_nationkey").as("src"),
          concat(lit("r:"), $"n_regionkey").as("dst"),
          lit("in_region").as("relType")))
    (nodes, edges)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GraphX connectedComponents: one component per region.
    "gx_connected_components" -> ((s, dir) => {
      import s.implicits._
      val (nodes, edges) = graphTables(s, dir)
      GraphAnalytics.connectedComponents(s, nodes, edges)
        .orderBy($"gid")
    }),

    // GraphX in/out degrees joined back through the gid dictionary.
    "gx_degrees" -> ((s, dir) => {
      import s.implicits._
      val (nodes, edges) = graphTables(s, dir)
      GraphAnalytics.degrees(s, nodes, edges)
        .select($"gid", $"out_degree".cast("long").as("out_degree"),
          $"in_degree".cast("long").as("in_degree"))
        .orderBy($"gid")
    }),

    // static PageRank (rows-only: float iteration order has no exact
    // cross-engine oracle; driver checks rows>0).
    "gx_pagerank" -> ((s, dir) => {
      import s.implicits._
      val (nodes, edges) = graphTables(s, dir)
      val (dict, g) = GraphAnalytics.build(s, nodes, edges)
      g.staticPageRank(5).vertices.toDF("vid", "rank")
        .join(dict, Seq("vid"))
        .select($"gid", round($"rank", 6).as("rank"))
        .orderBy($"rank".desc, $"gid").limit(50)
    }),

    // Pregel BFS: everything within 2 directed hops of two customers.
    "gx_reachable" -> ((s, dir) => {
      import s.implicits._
      val (nodes, edges) = graphTables(s, dir)
      GraphAnalytics.reachableWithin(s, nodes, edges,
        Set("c:1", "c:2"), maxHops = 2)
        .select($"gid", $"hops".cast("long").as("hops"))
        .orderBy($"gid")
    }))

  private val regionComponentCte =
    """rc AS (SELECT n_regionkey rk, min('c:'||c_custkey) comp
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "gx_connected_components" ->
      s"""WITH $regionComponentCte
          SELECT gid, comp AS component FROM (
            SELECT 'c:'||c_custkey AS gid, n_regionkey
              FROM customer JOIN nation ON c_nationkey = n_nationkey
            UNION ALL
            SELECT 'n:'||n_nationkey, n_regionkey FROM nation
            UNION ALL
            SELECT 's:'||s_suppkey, n_regionkey
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
            UNION ALL
            SELECT 'r:'||r_regionkey, r_regionkey FROM region)
          JOIN rc ON rk = n_regionkey ORDER BY gid""",
    "gx_degrees" ->
      """SELECT gid, coalesce(outd, 0) AS out_degree,
           coalesce(ind, 0) AS in_degree
         FROM (
           SELECT 'c:'||c_custkey gid, 1 outd, 0 ind FROM customer
           UNION ALL
           SELECT 'n:'||n_nationkey, 1,
             (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) +
             (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
           FROM nation
           UNION ALL
           SELECT 's:'||s_suppkey, 1, 0 FROM supplier
           UNION ALL
           SELECT 'r:'||r_regionkey, 0,
             (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
           FROM region)
         ORDER BY gid""",
    "gx_reachable" ->
      """SELECT gid, hops FROM (
           SELECT 'c:1' AS gid, CAST(0 AS BIGINT) AS hops
           UNION ALL SELECT 'c:2', 0
           UNION ALL
           SELECT DISTINCT 'n:'||c_nationkey, 1 FROM customer
             WHERE c_custkey IN (1, 2)
           UNION ALL
           SELECT DISTINCT 'r:'||n_regionkey, 2 FROM nation
             JOIN customer ON c_nationkey = n_nationkey
             WHERE c_custkey IN (1, 2))
         ORDER BY gid""")
}

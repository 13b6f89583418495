package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.store.GraphStore

/** GraphX bridge (north-star `spark_approach`: "GraphX for analytics
  * queries"): the property graph's string gids are dictionary-encoded
  * to VertexIds, analytics run on `Graph[VD, ED]`, and results join
  * back through the dictionary.
  *
  * At 100 TB the dictionary is the node table itself (gid → dense id
  * via zipWithIndex once per snapshot version), so the expensive
  * hash-join from strings to longs happens exactly once, not per
  * iteration — Pregel then moves only longs.
  */
object GraphAnalytics {

  /** (vertex dictionary: gid, vid; graphx graph) from a store snapshot. */
  def build(spark: SparkSession, nodes: DataFrame, edges: DataFrame)
      : (DataFrame, Graph[String, String]) = {
    import spark.implicits._
    val dict = graft.Scratch.track(
      nodes.select($"gid").rdd.map(_.getString(0))
        .zipWithIndex().toDF("gid", "vid").cache())
    val vertices = dict.as[(String, Long)].rdd.map { case (g, v) => (v, g) }
    val es = edges.select($"src", $"dst", $"relType")
      .join(dict.withColumnRenamed("gid", "src")
        .withColumnRenamed("vid", "src_vid"), Seq("src"))
      .join(dict.withColumnRenamed("gid", "dst")
        .withColumnRenamed("vid", "dst_vid"), Seq("dst"))
      .select($"src_vid", $"dst_vid", $"relType")
      .as[(Long, Long, String)].rdd
      .map { case (s, d, t) => Edge(s, d, t) }
    val g = Graph(vertices, es, defaultVertexAttr = null.asInstanceOf[String],
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    (dict, g)
  }

  def fromStore(spark: SparkSession, store: GraphStore)
      : (DataFrame, Graph[String, String]) =
    build(spark, store.nodes, store.edges)

  /** Connected components (undirected), labeled by the MIN gid of each
    * component — deterministic, so DuckDB-oracle-able.
    */
  def connectedComponents(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val (dict, g) = build(spark, nodes, edges)
    val cc = g.connectedComponents().vertices.toDF("vid", "cid")
    // component representative = min gid among members (GraphX labels
    // components by min VertexId, which is dictionary-order-dependent)
    val byGid = cc.join(dict, Seq("vid"))
      .select($"gid", $"cid")
    val canon = byGid.groupBy($"cid").agg(min($"gid").as("component"))
    byGid.join(canon, Seq("cid")).select($"gid", $"component")
  }

  /** PageRank over the directed graph; deterministic given fixed
    * iteration count up to float summation order (rows-only check).
    */
  def pageRank(spark: SparkSession, store: GraphStore,
      iters: Int = 10): DataFrame = {
    import spark.implicits._
    val (dict, g) = fromStore(spark, store)
    g.staticPageRank(iters).vertices.toDF("vid", "rank")
      .join(dict, Seq("vid"))
      .select($"gid", $"rank")
  }

  /** Deterministic fixed-iteration PageRank in micro-scaled integer
    * arithmetic: rank₀ = 1,000,000 (micro-1.0); each iteration a
    * vertex with out-degree d > 0 sends floor(rank·85 / (100·d)) along
    * every out-edge, and every vertex's next rank is 150,000 + Σ
    * incoming contributions. Long sums are order-independent, so the
    * result is bit-identical across partitionings and shuffle orders —
    * which makes it DuckDB-oracle-able, unlike float PageRank whose
    * summation order is nondeterministic. At scale, checkpoint every
    * few iterations to truncate the lineage chain.
    */
  def pageRankMicro(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    import spark.implicits._
    val (dict, g0) = build(spark, nodes, edges)
    val g = g0.outerJoinVertices(g0.outDegrees)((_, _, d) => d.getOrElse(0))
      .cache()
    graft.Scratch.trackRelease(() => { g.unpersist(blocking = false); () })
    var ranks = g.vertices.mapValues((_: Int) => 1000000L)
    for (_ <- 1 to iters) {
      val withRank = g.outerJoinVertices(ranks)((_, outd, r) =>
        (outd, r.getOrElse(1000000L)))
      val contribs = withRank.aggregateMessages[Long](
        ctx => if (ctx.srcAttr._1 > 0)
          ctx.sendToDst(ctx.srcAttr._2 * 85L / (100L * ctx.srcAttr._1)),
        _ + _)
      ranks = g.vertices.leftJoin(contribs)((_, _, c) =>
        150000L + c.getOrElse(0L))
    }
    ranks.toDF("vid", "rank_micro")
      .join(dict, Seq("vid"))
      .select($"gid", $"rank_micro")
  }

  /** Driver-local twins of the three procedure analytics, for
    * manifest-tiny stores (the interactive gds.*-on-a-small-graph
    * shape): identical integer arithmetic over collected arrays, so
    * the result is bit-equal to the distributed path (AnalyticsSpec
    * pins parity) at ZERO Spark jobs — a tiny store's tables are
    * LocalRelations, whose collect() never schedules a task. Callers
    * gate on `store.isTiny`, the same budget the tiny-table
    * localization already spends; at scale the GraphX path is
    * untouched. Edges whose endpoints are not in the node set drop,
    * exactly like `build`'s inner dictionary joins.
    */
  private def collectGraph(nodes: DataFrame, edges: DataFrame)
      : (Array[String], Array[(Int, Int)]) = {
    val gids = nodes.select("gid").collect().map(_.getString(0))
    val idx = gids.zipWithIndex.toMap
    val es = edges.select("src", "dst").collect().flatMap { r =>
      for (s <- idx.get(r.getString(0)); d <- idx.get(r.getString(1)))
        yield (s, d)
    }
    (gids, es)
  }

  def pageRankMicroLocal(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    val (gids, es) = collectGraph(nodes, edges)
    val n = gids.length
    val outd = new Array[Int](n)
    es.foreach { case (s, _) => outd(s) += 1 }
    var rank = Array.fill(n)(1000000L)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)(150000L)
      es.foreach { case (s, d) =>
        next(d) += rank(s) * 85L / (100L * outd(s))
      }
      rank = next
    }
    gids.indices.map(i => (gids(i), rank(i))).toDF("gid", "rank_micro")
  }

  def degreesLocal(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val (gids, es) = collectGraph(nodes, edges)
    val out = new Array[Int](gids.length)
    val in = new Array[Int](gids.length)
    es.foreach { case (s, d) => out(s) += 1; in(d) += 1 }
    gids.indices.map(i => (gids(i), out(i), in(i)))
      .toDF("gid", "out_degree", "in_degree")
  }

  def connectedComponentsLocal(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val (gids, es) = collectGraph(nodes, edges)
    val parent = Array.tabulate(gids.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    es.foreach { case (s, d) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) parent(rs) = rd
    }
    val label = scala.collection.mutable.Map.empty[Int, String]
    gids.indices.foreach { i =>
      val r = find(i)
      if (!label.contains(r) || gids(i) < label(r)) label(r) = gids(i)
    }
    gids.indices.map(i => (gids(i), label(find(i))))
      .toDF("gid", "component")
  }

  /** out/in degree via GraphX degree operators. */
  def degrees(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val (dict, g) = build(spark, nodes, edges)
    val out = g.outDegrees.toDF("vid", "out_degree")
    val in = g.inDegrees.toDF("vid", "in_degree")
    dict
      .join(out, Seq("vid"), "left_outer")
      .join(in, Seq("vid"), "left_outer")
      .select($"gid",
        coalesce($"out_degree", lit(0)).as("out_degree"),
        coalesce($"in_degree", lit(0)).as("in_degree"))
  }

  /** Per-vertex triangle counts over the undirected view (self-loops
    * dropped, direction canonicalized, parallel edges deduped) — a
    * pure DataFrame plan, not GraphX: the graph never densifies into
    * RDD adjacency sets, stays columnar/codegen'd, and AQE handles
    * skew. Degree-ordered orientation (each undirected edge points
    * from its (degree, gid)-smaller endpoint to the larger) is the
    * node-iterator bound: every vertex's out-adjacency is O(sqrt(E)),
    * so the wedge join `o(a,b) ⋈ o(b,c) ⋈ o(a,c)` enumerates each
    * triangle exactly once (the orientation is an acyclic total
    * order) with no high-degree-hub explosion — the 100-TB-safe shape,
    * unlike id-ordered orientation which a celebrity hub breaks.
    * Integer counts → deterministic, DuckDB-oracle-able.
    *
    * `undirectedUnique = true` is the caller's contract that the edge
    * multiset contains no parallel edges and no mutual (a→b plus b→a)
    * pairs — true for any single-relType slice of the store, whose
    * edge identity is (src, dst, relType). It elides the undirected
    * dedup, turning the whole encode step into a pure map-side plan
    * (broadcast dictionary joins, zero shuffles before the degree
    * aggregation). The default stays safe for arbitrary multisets.
    */
  def triangleCounts(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame, undirectedUnique: Boolean = false): DataFrame = {
    import spark.implicits._
    // the wedge join is the hot path — run it over dictionary-encoded
    // Long vertex ids, not gid strings: integer sort/hash keys cut the
    // shuffle-compare cost several-fold, and the dictionary itself is
    // two narrow joins (AQE broadcasts it whenever |V| allows).
    // monotonically_increasing_id is collision-free by construction
    // (unlike hashing gids) and stable under the checkpoint.
    val dict = nodes.select($"gid").distinct()
      .withColumn("vid", monotonically_increasing_id())
      .localCheckpoint() // ids must be minted exactly once
    // Encode FIRST, dedup SECOND: the undirected dedup then shuffles
    // two Longs per edge instead of two gid strings. The dictionary
    // joins themselves go broadcast when |V| fits (runtime-adaptive —
    // the count materializes the checkpoint we need anyway, and the
    // checkpointed lineage hides stats from AQE); past that they are
    // the standard pair of dimension shuffles.
    val dictDim =
      if (dict.count() <= 5000000L) (d: DataFrame) => broadcast(d)
      else (d: DataFrame) => d
    val und0 = edges
      .select($"src", $"dst").filter($"src" =!= $"dst")
      .join(dictDim(dict.select($"gid".as("src"), $"vid".as("sa"))),
        Seq("src"))
      .join(dictDim(dict.select($"gid".as("dst"), $"vid".as("sb"))),
        Seq("dst"))
      .select(least($"sa", $"sb").as("a"), greatest($"sa", $"sb").as("b"))
    // referenced by the degree agg AND the orientation join —
    // materialize once, not as repeated recomputes of the upstream
    // edge build
    val und = (if (undirectedUnique) und0 else und0.distinct())
      .localCheckpoint(false)
    // per-node degree is |V|-sized — NOT broadcast-hinted: at billions
    // of vertices it must stay a shuffle join, and AQE picks right
    // from the runtime size either way
    val deg = und.select(explode(array($"a", $"b")).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select($"v".as("a"), $"d".as("da")), Seq("a"))
      .join(deg.select($"v".as("b"), $"d".as("db")), Seq("b"))
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"a")
          .otherwise($"b").as("x"),
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"b")
          .otherwise($"a").as("y"))
      .localCheckpoint(false) // feeds all three legs of the wedge join
    // Runtime-adaptive wedge join: checkpointed lineage hides size
    // stats from the planner, so without help both legs become
    // sort-merge shuffles of the |wedges| ≈ Σ outdeg² intermediate.
    // The oriented edge list itself is only |E| narrow rows — when it
    // fits a broadcast (two Longs/row; 5M rows ≈ 80 MB) the whole
    // wedge pipeline runs map-side with NO shuffle of the wedge
    // explosion. Past that size the shuffle path is the right plan
    // (same decision AQE would make if it could see the stats). The
    // count is free: it materializes the checkpoint we need anyway.
    val dim =
      if (oriented.count() <= 5000000L) (d: DataFrame) => broadcast(d)
      else (d: DataFrame) => d
    val tri = oriented.select($"x".as("a"), $"y".as("b"))
      .join(dim(oriented.select($"x".as("b"), $"y".as("c"))), Seq("b"))
      .join(dim(oriented.select($"x".as("a"), $"y".as("c"))), Seq("a", "c"))
    val counts = tri
      .select(explode(array($"a", $"b", $"c")).as("vid"))
      .groupBy($"vid").agg(count(lit(1)).as("tri"))
    dict.join(counts, Seq("vid"), "left_outer")
      .select($"gid", coalesce($"tri", lit(0L)).cast("long")
        .as("n_triangles"))
  }

  /** Multi-hop reachability via Pregel: all vertices within `maxHops`
    * (directed) of the source set — the variable-length-path analog
    * (SURVEY §4: iterative driver loop, not a SparkStrategy).
    */
  def reachableWithin(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame, sourceGids: Set[String], maxHops: Int): DataFrame = {
    import spark.implicits._
    val (dict, g) = build(spark, nodes, edges)
    val srcVids = dict.filter($"gid".isin(sourceGids.toSeq: _*))
      .select($"vid").as[Long].collect().toSet
    val init = g.mapVertices { (vid, _) =>
      if (srcVids.contains(vid)) 0 else Int.MaxValue
    }
    val res = init.pregel(Int.MaxValue, maxIterations = maxHops)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr != Int.MaxValue &&
            triplet.srcAttr + 1 < triplet.dstAttr &&
            triplet.srcAttr + 1 <= maxHops)
          Iterator((triplet.dstId, triplet.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Int.MaxValue).toDF("vid", "hops")
      .join(dict, Seq("vid"))
      .select($"gid", $"hops")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cypher.CypherEngine

/** Gap finder: a battery of everyday-Neo4j text run against the
  * nation-store fixture; prints PASS/FAIL per query. A dev tool, not
  * part of the registry — failures here are candidate round work.
  */
object SyntaxProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val store = graft.queries.GraphOnTpch.nationStore(s, "/root/testdata/sf0.001")
    val probes: Seq[(String, String)] = Seq(
      "skip-limit" -> "MATCH (n:Nation) RETURN n.name AS nm ORDER BY nm SKIP 1 LIMIT 2",
      "case-value-form" -> "MATCH (n:Nation) RETURN CASE n.gid WHEN 'n:1' THEN 'one' ELSE 'other' END AS c LIMIT 3",
      "mod-pow" -> "RETURN 5 % 3 AS m, 2 ^ 3 AS p",
      "undirected" -> "MATCH (a:Nation)--(b) RETURN count(*) AS c",
      "undirected-rel" -> "MATCH (a:Nation)-[r]-(b) RETURN type(r) AS t LIMIT 2",
      "coalesce-optional" -> "MATCH (n:Nation) OPTIONAL MATCH (n)-[:nope]->(m) RETURN coalesce(m.gid, 'none') AS g LIMIT 2",
      "conversions" -> "RETURN toInteger('42') AS i, toFloat('1.5') AS f, toBoolean('true') AS b",
      "list-comp" -> "RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS l",
      "quantifiers" -> "RETURN any(x IN [1,2] WHERE x > 1) AS a, none(x IN [1] WHERE x > 5) AS n",
      "path-fns" -> "MATCH p = (a:Nation)-[*1..2]->(b) RETURN length(p) AS l, size(nodes(p)) AS nn LIMIT 2",
      "exists-sub" -> "MATCH (n:Nation) WHERE EXISTS { MATCH (n)-[:in_region]->() } RETURN count(*) AS c",
      "dyn-prop-str" -> "MATCH (n:Nation) RETURN n['name'] AS nm ORDER BY nm LIMIT 2",
      "dyn-prop-expr" -> "WITH 'name' AS k MATCH (n:Nation) RETURN n[k] AS nm ORDER BY nm LIMIT 2",
      "props-keys-labels" -> "MATCH (n:Nation) RETURN keys(properties(n)) AS ks, labels(n) AS ls LIMIT 1",
      "orderby-expr" -> "MATCH (n:Nation) RETURN n.gid AS g ORDER BY size(n.name) DESC, g LIMIT 3",
      "collect-distinct" -> "MATCH (n:Nation)-[r]->(m) RETURN size(collect(DISTINCT m.gid)) AS c",
      "unwind-maps" -> "UNWIND [{a: 1}, {a: 2}] AS row RETURN row.a AS a",
      "multi-create" -> "CREATE (a:Tmp {gid: 'tmp:1'}), (b:Tmp {gid: 'tmp:2'}) RETURN 1 AS ok",
      "null-arith" -> "RETURN null + 1 AS a, size(null) AS b",
      "union-literal" -> "RETURN 1 AS a UNION RETURN 2 AS a",
      "regex-flags" -> "MATCH (n:Nation) WHERE n.name =~ '(?i)nation.*' RETURN count(*) AS c",
      "reduce-mult" -> "RETURN reduce(acc = 1, x IN [1,2,3,4] | acc * x) AS f",
      "stdev" -> "UNWIND [1.0, 2.0, 3.0] AS x RETURN stdev(x) AS sd, percentileCont(x, 0.5) AS med",
      "not-pattern" -> "MATCH (n:Nation) WHERE NOT (n)-[:nope]->() RETURN count(*) AS c",
      "param-dyn-prop" -> "MATCH (n:Nation) RETURN n[$key] AS v ORDER BY v LIMIT 1",
      "string-norm" -> "RETURN toUpper('a') AS u, trim('  x ') AS t, split('a,b', ',') AS sp",
      "temporal-cmp" -> "RETURN date('2024-01-02') > date('2024-01-01') AS cmp",
      "duration-add" -> "RETURN date('2024-01-31') + duration('P1D') AS d",
      "nested-subscript" -> "RETURN [[1,2],[3]][0][1] AS v",
      "map-subscript" -> "RETURN {a: {b: 7}}['a']['b'] AS v",
      "count-if" -> "MATCH (n:Nation) RETURN count(CASE WHEN n.gid > 'n:2' THEN 1 END) AS c",
      "distinct-with" -> "MATCH (n:Nation)-[r]->(m) WITH DISTINCT m RETURN count(*) AS c",
      "chained-cmp" -> "WITH 5 AS x RETURN 1 < x <= 5 AS inrange",
      "elementid-fn" -> "MATCH (n:Nation) RETURN elementId(n) AS e LIMIT 1",
      "shortest-fn" -> "MATCH p = shortestPath((a:Nation {gid: 'n:1'})-[*1..3]->(b)) RETURN length(p) AS l LIMIT 1")
    val params = Map("key" -> "name", "list" -> Seq(1, 2, 3))
    probes.foreach { case (tag, q) =>
      val res =
        try { CypherEngine.query(store, q, params).collect(); "PASS" }
        catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE $tag: $res")
    }
    // battery 2: write clauses + aggregation/subquery edges, on a
    // private store (the probes mutate it)
    val wstore = graft.queries.GraphOnTpch.freshNationStore(s,
      "/root/testdata/sf0.001")
    val writeProbes: Seq[(String, String)] = Seq(
      "merge-on-clauses" ->
        """MERGE (n:X {gid: 'm:1'}) ON CREATE SET n.c = '1'
           ON MATCH SET n.m = '1'""",
      "set-multi" -> "MATCH (n {gid: 'm:1'}) SET n.a = 1, n.b = 2",
      "remove-prop" -> "MATCH (n {gid: 'm:1'}) REMOVE n.b",
      "with-order-limit-match" ->
        """MATCH (n:Nation) WITH n ORDER BY n.name LIMIT 1
           MATCH (n)-[:in_region]->(m) RETURN m.gid AS g""",
      "count-distinct-prop" ->
        "MATCH (n:Nation) RETURN count(DISTINCT n.name) AS c",
      "cartesian-id" ->
        """MATCH (a:Nation), (b:Nation) WHERE id(a) < id(b)
           RETURN count(*) AS c""",
      "chain-create" ->
        """CREATE (a:Y {gid: 'y:1'})-[:t]->(b:Y {gid: 'y:2'})-[:t]->
           (c:Y {gid: 'y:3'})""",
      "unwind-param" -> "UNWIND $list AS x RETURN x * 2 AS d",
      "in-list" ->
        "MATCH (n:Nation) WHERE n.name IN ['NATION_1'] RETURN count(*) AS c",
      "pow-dynamic" ->
        "MATCH (n:Nation {gid: 'n:1'}) RETURN size(n.name) ^ 2 AS p",
      "orderby-agg-alias" ->
        """MATCH (n:Nation)-[r]->(m) RETURN m.gid AS g, count(*) AS c
           ORDER BY c DESC, g LIMIT 2""",
      "collect-unwind-nodes" ->
        """MATCH (n:Nation) WITH collect(n) AS ns UNWIND ns AS n
           RETURN n.name AS nm ORDER BY nm LIMIT 2""",
      "head-collect" ->
        """MATCH (n:Nation) WITH n ORDER BY n.name
           RETURN head(collect(n.name)) AS first""",
      "size-labels" ->
        "MATCH (n) WHERE size(labels(n)) > 0 RETURN count(*) AS c",
      "multi-when" ->
        """MATCH (n:Nation) RETURN CASE WHEN n.gid = 'n:1' THEN 'a'
           WHEN n.gid = 'n:2' THEN 'b' ELSE 'z' END AS k LIMIT 3""",
      "optional-where" ->
        """MATCH (n:Nation) OPTIONAL MATCH (n)-[:in_region]->(m)
           WHERE m.gid = 'r:0' RETURN count(m) AS c""",
      "limit-expr" ->
        "MATCH (n:Nation) RETURN n.gid AS g ORDER BY g LIMIT 1 + 1",
      "count-bare-pattern" ->
        "MATCH (n:Nation) RETURN n.gid AS g, COUNT { (n)-->() } AS deg LIMIT 2",
      "exists-bare-pattern" ->
        "MATCH (n:Nation) WHERE EXISTS { (n)-[:in_region]->() } RETURN count(*) AS c",
      "delete-rel" ->
        "MATCH (:Y {gid: 'y:1'})-[r:t]->() DELETE r",
      "merge-stub-promote" ->
        "MERGE (n:Region {gid: 'r:0'}) RETURN n.gid AS g")
    writeProbes.foreach { case (tag, q) =>
      val res =
        try { CypherEngine.query(wstore, q, params).collect(); "PASS" }
        catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE2 $tag: $res")
    }
    val probes3: Seq[(String, String)] = Seq(
      "label-pred-where" ->
        "MATCH (n) WHERE n:Nation RETURN count(*) AS c",
      "map-proj-computed" ->
        """MATCH (n:Nation {gid: 'n:1'})
           RETURN n{.name, deg: size([(n)-->() | 1])} AS m""",
      "nested-map-list" -> "WITH {a: [1, 2]} AS m RETURN m.a[0] AS v",
      "step-range" -> "UNWIND range(0, 10, 2) AS x RETURN count(*) AS c",
      "varlen-type-disj" ->
        "MATCH (a:Nation)-[:in_region|nope*1..2]->(b) RETURN count(*) AS c",
      "not-startswith" ->
        """MATCH (n:Nation) WHERE NOT n.name STARTS WITH 'NATION_1'
           RETURN count(*) AS c""",
      "datetime-accessor" ->
        "RETURN datetime('2024-01-01T10:00:00Z').epochMillis AS ms",
      "pattern-comp-with" ->
        """MATCH (n:Nation {gid: 'n:1'})
           WITH n, [(n)-->(m) | m.gid] AS ts RETURN size(ts) AS c""",
      // nodes(p) yields gid REFERENCES (model choice: materializing
      // props per path node would hide a join); property access needs
      // the bound variable — the two nodes-p probes document that
      "nodes-p-lambda-prop" ->
        """MATCH p = (a:Nation {gid: 'n:1'})-[:in_region]->(b)
           RETURN [x IN nodes(p) | x.gid] AS gids""",
      "nodes-p-lambda-dynprop" ->
        """MATCH p = (a:Nation {gid: 'n:1'})-[:in_region]->(b)
           RETURN [x IN nodes(p) | x.name] AS names""",
      "collect-subscript-prop" ->
        """MATCH (n:Nation) WITH n ORDER BY n.gid
           RETURN collect(n)[0].name AS first""",
      "exists-prop-fn" ->
        "MATCH (n:Nation) WHERE exists(n.name) RETURN count(*) AS c",
      "param-cmp" ->
        "MATCH (n:Nation) WHERE n.name >= $minName RETURN count(*) AS c",
      "order-multi-mixed" ->
        """MATCH (n:Nation) RETURN n.gid AS g
           ORDER BY n.name DESC, n.gid ASC LIMIT 2""",
      "tostring-forms" ->
        "RETURN toString(1.5) AS a, toString(true) AS b, toString(7) AS c",
      "order-by-node" ->
        "MATCH (n:Nation) RETURN n ORDER BY n LIMIT 1",
      "merge-whole-pattern" ->
        """MERGE (a:W {gid: 'w:1'})-[:t]->(b:W {gid: 'w:2'})
           RETURN 1 AS ok""",
      "case-list-result" ->
        "RETURN CASE WHEN true THEN [1,2] ELSE [] END AS l")
    probes3.foreach { case (tag, q) =>
      val res =
        try { CypherEngine.query(wstore, q,
          Map("minName" -> "NATION_2")).collect(); "PASS" }
        catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE3 $tag: $res")
    }
    val probes4: Seq[(String, String)] = Seq(
      "time-fn" -> "RETURN time('12:30:05') > time('11:00:00') AS c",
      "localtime-accessor" -> "RETURN localtime('12:30:05').hour AS h",
      "list-map-eq" -> "RETURN [1,2] = [1,2] AS a, {x: 1} = {x: 1} AS b",
      "in-nested-list" -> "RETURN [1,2] IN [[1,2],[3]] AS c",
      "distinct-labels" ->
        "MATCH (n) RETURN DISTINCT labels(n) AS ls ORDER BY ls",
      "node-neq" ->
        "MATCH (a:Nation), (b:Nation) WHERE a <> b RETURN count(*) AS c",
      "merge-rel-return" ->
        """MERGE (a:Z {gid:'z:1'})-[r:t]->(b:Z {gid:'z:2'})
           RETURN type(r) AS t""",
      "case-null-value" ->
        "RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS c",
      "slice-collect" ->
        """MATCH (n:Nation) WITH n.name AS nm ORDER BY nm
           RETURN collect(nm)[..2] AS l""",
      "skip-no-order" -> "MATCH (n:Nation) RETURN n.gid AS g SKIP 20",
      "str-concat-plus" -> "RETURN 'a' + 'b' + 'c' AS s",
      "unwind-nested" ->
        "UNWIND [[1,2],[3]] AS xs UNWIND xs AS x RETURN sum(x) AS s",
      "rel-prop-notnull" ->
        """MATCH ()-[r:in_region]->() WHERE r.source IS NOT NULL
           RETURN count(*) AS c""",
      "with-star-extra" ->
        """MATCH (n:Nation) WITH *, size(n.name) AS len
           RETURN count(*) AS c, max(len) AS m""",
      "with-agg-order-limit" ->
        """MATCH (n:Nation)-[r]->(m) WITH m, count(*) AS c
           ORDER BY c DESC, m.gid RETURN m.gid AS g, c LIMIT 2""",
      "labels-of-null" ->
        "OPTIONAL MATCH (x:Nope) RETURN labels(x) AS l",
      "round-modes" ->
        "RETURN round(2.5) AS a, round(-2.5) AS b, round(2.445, 2) AS c",
      "date-week-accessors" ->
        """RETURN date('2024-01-15').week AS w,
           date('2024-01-15').dayOfWeek AS d""",
      "datetime-offset" ->
        "RETURN datetime('2024-01-01T10:00:00+02:00').epochMillis AS ms",
      "duration-between-months" ->
        """RETURN duration.between(date('2024-01-01'),
           date('2024-03-05')).months AS m""",
      "tostring-date" -> "RETURN toString(date('2024-01-05')) AS s",
      "map-dynamic-iterate" ->
        """WITH {a:1, b:2} AS m UNWIND keys(m) AS k
           RETURN k, m[k] AS v ORDER BY k""")
    probes4.foreach { case (tag, q) =>
      val res =
        try { CypherEngine.query(wstore, q, params).collect(); "PASS" }
        catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE4 $tag: $res")
    }
    // battery 5: lexical trivia, three-valued logic edges, conversion
    // lists, legacy-but-common forms. Value-sensitive ones print rows.
    val probes5: Seq[(String, String)] = Seq(
      "comment-line" -> "MATCH (n:Nation) // trailing comment\nRETURN count(*) AS c",
      "comment-block" -> "MATCH (n:Nation) /* mid */ RETURN count(*) AS c",
      "xor" -> "RETURN true XOR false AS a, true XOR true AS b, true XOR null AS c",
      "sci-hex-lit" -> "RETURN 1e3 AS a, 2.5e-2 AS b, 0xFF AS h",
      "escape-str" -> "RETURN 'a\\nb' AS s, '\\u0041' AS u",
      "in-with-null" -> "RETURN 1 IN [1, null] AS a, 2 IN [1, null] AS b",
      "cross-type-eq" -> "RETURN 1 = '1' AS a, [1] = [1.0] AS b",
      "substring-single" -> "RETURN substring('hello', 2) AS s",
      "split-multi-delim" -> "RETURN split('a;b,c', [';', ',']) AS l",
      "to-list-conv" -> ("RETURN toIntegerList(['1','2']) AS il, " +
        "toFloatList(['1.5']) AS fl, toStringList([1, 2.0]) AS sl, " +
        "toBooleanList(['true']) AS bl"),
      "case-no-else" -> "RETURN CASE WHEN false THEN 1 END AS c",
      "reduce-list-acc" -> "RETURN reduce(acc = [], x IN [1,2] | acc + x) AS l",
      "regex-null" -> "RETURN 'a' =~ null AS r",
      "order-null-asc" -> "UNWIND [3, null, 1] AS x RETURN x ORDER BY x",
      "props-map-param" -> "CREATE (n:PP {gid: 'pp:1'}) SET n = $props RETURN n.k AS k",
      "minmax-lists" -> "UNWIND [[1,2],[0,9]] AS l RETURN min(l) AS lo",
      "type-null" -> "OPTIONAL MATCH (x:Nope)-[r:nope]->() RETURN type(r) AS t",
      "id-rel" -> "MATCH ()-[r:in_region]->() RETURN id(r) AS i LIMIT 1",
      "keys-node-direct" -> "MATCH (n:Nation) RETURN keys(n) AS ks LIMIT 1",
      "properties-of-map" -> "RETURN properties({a: 1}) AS m",
      "exists-legacy-paren" ->
        "MATCH (n:Nation) WHERE exists((n)-[:in_region]->()) RETURN count(*) AS c",
      "allshortest" ->
        """MATCH p = allShortestPaths((a:Nation {gid:'n:1'})-[*1..3]->(b))
           RETURN count(*) AS c""",
      "backtick-prop" ->
        "CREATE (n:BT {gid: 'bt:1', `weird prop`: '1'}) RETURN n.`weird prop` AS w",
      "datetime-map" ->
        "RETURN datetime({year: 2024, month: 2, day: 29, hour: 3}).epochMillis AS ms",
      "duration-accessors" ->
        """RETURN duration('P1Y2M3DT4H').months AS mo,
           duration({days: 2, hours: 3}).hours AS h""",
      "contains-ends" ->
        """MATCH (n:Nation) WHERE n.name CONTAINS 'ATION'
           AND n.name ENDS WITH '1' RETURN count(*) AS c""",
      "distinct-lists" -> "UNWIND [[1],[1],[2]] AS l RETURN DISTINCT l ORDER BY l",
      "valuetype" -> "RETURN valueType(1) AS a, valueType('x') AS b",
      "varlen-open-lower" ->
        "MATCH (a:Nation {gid:'n:1'})-[*..2]->(b) RETURN count(*) AS c",
      "varlen-bare-star" ->
        "MATCH (a:Nation {gid:'n:1'})-[*]->(b) RETURN count(*) AS c",
      "merge-label-only" -> "MERGE (n:OnlyL {gid: 'ol:1'}) MERGE (n2:OnlyL {gid: 'ol:1'}) RETURN count(*) AS c",
      "shortest-undirected-open" ->
        """MATCH p = shortestPath((a:Nation {gid:'n:1'})-[*..2]-(b:Region))
           RETURN length(p) AS l LIMIT 1""")
    val p5params = Map("props" -> Map("k" -> "v"), "key" -> "name",
      "list" -> Seq(1, 2, 3))
    probes5.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, p5params).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE5 $tag: $res")
    }
    // battery 6: trim spec forms, normalization, var-length rel lists,
    // extended CASE, UNWIND null, rel keys, duration rendering
    val probes6: Seq[(String, String)] = Seq(
      "trim-spec" -> ("RETURN trim(BOTH 'x' FROM 'xxaxx') AS b, " +
        "trim(LEADING 'x' FROM 'xxaxx') AS l, trim(TRAILING 'x' FROM 'xxaxx') AS t"),
      "btrim-chars" -> "RETURN btrim('xxaxx', 'x') AS b, ltrim('xxaxx', 'x') AS l, rtrim('xxaxx', 'x') AS r",
      "normalize-fn" -> "RETURN normalize('a\\u0301') = '\\u00E1' AS nfc",
      "lower-upper-alias" -> "RETURN lower('AB') AS lo, upper('ab') AS up",
      "case-extended" -> "WITH 5 AS x RETURN CASE x WHEN > 3 THEN 'big' WHEN IS NULL THEN 'null' ELSE 'small' END AS c",
      "varlen-rel-list" ->
        "MATCH (a:Nation {gid:'n:1'})-[rs:in_region*1..2]->(b) RETURN size(rs) AS n, type(rs[0]) AS t",
      "unwind-null" -> "UNWIND null AS x RETURN count(*) AS c",
      "rel-keys" -> "MATCH ()-[r:in_region]->() RETURN keys(r) AS ks LIMIT 1",
      "rel-missing-prop" -> "MATCH ()-[r:in_region]->() RETURN r.nope IS NULL AS m LIMIT 1",
      "tostring-duration" -> "RETURN toString(duration({days: 1, hours: 2})) AS s",
      "tostring-datetime" -> "RETURN toString(datetime('2024-01-05T10:30:00Z')) AS s",
      "round-mode" -> "RETURN round(2.5, 0, 'HALF_DOWN') AS a, round(1.249, 1, 'UP') AS b",
      "param-subscript" -> "RETURN [10, 20, 30][$idx] AS v",
      "count-undirected-sub" -> "MATCH (n:Nation {gid:'n:1'}) RETURN COUNT { (n)--() } AS deg",
      "exists-label-inside" ->
        "MATCH (n:Nation) WHERE EXISTS { MATCH (n)-->(m:Region) } RETURN count(*) AS c",
      "list-prop-create" -> "CREATE (n:LP {gid: 'lp:1', tags: ['a', 'b']}) RETURN n.tags AS t, size(n.tags) AS n",
      "merge-rel-props" ->
        """MATCH (a:Nation {gid:'n:1'})-[:in_region]->(b)
           MERGE (a)-[r:extra {source: 'probe'}]->(b) RETURN type(r) AS t""",
      "size-keys-node" -> "MATCH (n:Nation) RETURN size(keys(n)) AS c LIMIT 1",
      "last-collect" ->
        "MATCH (n:Nation) WITH n.name AS nm ORDER BY nm RETURN last(collect(nm)) AS l",
      "isempty-null" -> "RETURN isEmpty(null) AS e",
      "datetime-compose" ->
        "RETURN datetime({date: date('2024-01-05'), hour: 10}).epochMillis AS ms",
      "date-truncate-week" ->
        "RETURN date.truncate('week', date('2024-01-18')) AS w",
      "skip-float-rejected" -> "MATCH (n:Nation) RETURN n.gid AS g LIMIT 1.5",
      "min-mixed-null" -> "UNWIND [3, null, 1] AS x RETURN min(x) AS lo, max(x) AS hi",
      "agg-then-match" ->
        """MATCH (n:Nation) WITH count(*) AS c
           MATCH (r:Region) RETURN c, count(*) AS rc""",
      "percentile-param" ->
        "UNWIND [1.0, 2.0, 3.0] AS x RETURN percentileCont(x, $p) AS med")
    val p6params = Map("idx" -> 1, "p" -> 0.5)
    probes6.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, p6params).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE6 $tag: $res")
    }
    // battery 7: shadowing, converging patterns, collected-node
    // membership, write-then-read visibility, range edge cases
    val probes7: Seq[(String, String)] = Seq(
      "with-shadow" ->
        "MATCH (n:Nation) WITH n.name AS n RETURN n ORDER BY n LIMIT 1",
      "converging" ->
        "MATCH (a:Nation)-->(r)<--(b:Nation) WHERE a.gid < b.gid RETURN count(*) AS c",
      "collect-distinct-ordered" ->
        """MATCH (n:Nation) WITH n.gid AS g ORDER BY g DESC
           RETURN collect(DISTINCT g)[0] AS first""",
      "case-in-set" ->
        """MATCH (n:Nation {gid: 'n:1'})
           SET n.sizeclass = CASE WHEN size(n.name) > 7 THEN 'long' ELSE 'short' END
           RETURN n.sizeclass AS sc""",
      "merge-param-map" -> "MERGE (n {gid: $gid}) RETURN n.gid AS g",
      "not-pattern-both-bound" ->
        """MATCH (a:Nation {gid:'n:1'}), (b:Nation {gid:'n:2'})
           WHERE NOT (a)-[:nope]->(b) RETURN count(*) AS c""",
      "range-empty" -> "RETURN range(0, -1) AS r, size(range(0, -1)) AS n",
      "null-string-fns" ->
        "RETURN toUpper(null) AS a, split(null, ',') AS b, trim(null) AS c",
      "orderby-hidden-expr" ->
        "MATCH (n:Nation) RETURN n.gid AS g ORDER BY size(n.name), n.gid LIMIT 2",
      "return-star-extra" ->
        "MATCH (n:Nation {gid:'n:1'}) RETURN *, size(n.name) AS len",
      "optional-null-or" ->
        """MATCH (n:Nation) OPTIONAL MATCH (n)-[:in_region]->(m)
           WHERE m.gid = 'r:0' WITH n, m
           WHERE m IS NULL OR m.gid = 'r:0' RETURN count(*) AS c""",
      "fixed-path-len" ->
        "MATCH p = (a:Nation {gid:'n:1'})-[:in_region]->(b) RETURN length(p) AS l",
      "node-in-collected" ->
        """MATCH (n:Nation) WITH collect(n) AS ns
           MATCH (m:Nation) WHERE m IN ns RETURN count(*) AS c""",
      "ts-arith" -> ("RETURN timestamp() / 1000 > 0 AS ok, " +
        "datetime() + duration({days: 1}) > datetime() AS fut"),
      "nested-map-value" ->
        "RETURN {a: {b: [1, {c: 2}]}} AS m, {a: {b: [1, {c: 2}]}}.a.b[1].c AS v",
      "substr-expr-args" ->
        """MATCH (n:Nation {gid:'n:1'})
           RETURN substring(n.name, size(n.name) - 2) AS tail2""",
      "orderby-case" ->
        """MATCH (n:Nation) RETURN n.gid AS g
           ORDER BY CASE WHEN n.gid = 'n:9' THEN 0 ELSE 1 END, g LIMIT 1""",
      "startswith-fn-rhs" ->
        "MATCH (n:Nation) WHERE n.name STARTS WITH toUpper('nation') RETURN count(*) AS c",
      "write-then-match" ->
        """CREATE (a:WV {gid: 'wv:1'}) WITH a
           MATCH (b:WV) RETURN count(*) AS c""",
      "percentile-group" ->
        """MATCH (n:Nation)-[r]->(m)
           RETURN m.gid AS g, percentileDisc(size(n.name), 0.5) AS p
           ORDER BY g LIMIT 2""")
    val p7params = Map("gid" -> "n:3")
    probes7.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, p7params).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE7 $tag: $res")
    }
    // battery 8: temporal aggregates/equality, invalid dates, zone ids
    val probes8: Seq[(String, String)] = Seq(
      "min-max-date" ->
        """UNWIND [date('2024-03-01'), date('2023-01-01')] AS d
           RETURN min(d) AS lo, max(d) AS hi""",
      "collect-dates" ->
        """UNWIND [date('2024-03-01'), date('2023-01-01')] AS d
           RETURN collect(d)[0] AS first""",
      "orderby-datetime" ->
        """UNWIND [datetime('2024-01-02T00:00:00Z'),
           datetime('2024-01-01T00:00:00Z')] AS t
           RETURN t ORDER BY t LIMIT 1""",
      "duration-eq" ->
        """RETURN duration({seconds: 90}) =
           duration({minutes: 1, seconds: 30}) AS eq""",
      "invalid-date" -> "RETURN date('2024-02-30') AS d",
      "zone-id-datetime" ->
        "RETURN datetime('2024-06-01T12:00:00[Europe/Oslo]').epochMillis AS ms",
      "negative-duration" ->
        "RETURN duration({days: -2}).days AS d, duration('-P1D').days AS i",
      "date-minus-dur" ->
        "RETURN date('2024-01-05') - duration({days: 4}) AS d",
      "sum-duration" ->
        """UNWIND [duration({days: 1}), duration({hours: 12})] AS d
           RETURN sum(d) AS total""",
      "in-tx-date-cmp" ->
        """UNWIND ['2024-01-01', '2023-06-01'] AS s
           WITH date(s) AS d WHERE d > date('2023-12-31')
           RETURN count(*) AS c""",
      "tostring-time" -> "RETURN toString(time('12:30:05')) AS s",
      "dur-between-dates" ->
        """RETURN duration.between(date('2024-01-01'),
           datetime('2024-03-02T06:00:00Z')).days AS d""")
    probes8.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, params).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE8 $tag: $res")
    }
    // battery 9: visibility combinations and tail-end everyday forms
    val probes9: Seq[(String, String)] = Seq(
      "set-on-created" ->
        """CREATE (a:B9 {gid: 'b9:1'}) WITH a
           MATCH (n:B9) SET n.seen = 'y' RETURN n.seen AS s""",
      "foreach-then-match" ->
        """FOREACH (i IN [1, 2] | CREATE (:B9F {gid: 'b9f:' + toString(i)}))
           WITH 1 AS one MATCH (n:B9F) RETURN count(*) AS c""",
      "delete-create-same-gid" ->
        """MATCH (x:B9 {gid: 'b9:1'}) DETACH DELETE x
           CREATE (y:B9 {gid: 'b9:1', k: 'new'})
           WITH y MATCH (n:B9) RETURN count(*) AS c, n.k AS k""",
      "remove-label-then-match" ->
        """CREATE (a:B9R:Extra9 {gid: 'b9r:1'}) WITH a
           REMOVE a:Extra9 WITH a MATCH (n:Extra9) RETURN count(*) AS c""",
      "orderby-aggregate" ->
        """MATCH (n:Nation)-[r]->(m) RETURN m.gid AS g, sum(1) AS s
           ORDER BY count(*) DESC, g LIMIT 2""",
      "with-distinct-expr" ->
        """MATCH (n:Nation) WITH DISTINCT size(n.name) AS ln
           RETURN count(*) AS c""",
      "unwind-empty-literal" -> "UNWIND [] AS x RETURN count(*) AS c",
      "nested-comprehension" ->
        "RETURN [x IN [1,2] | [y IN [10] | x * y]] AS m",
      "exists-on-created" ->
        """CREATE (p:B9E {gid: 'e:1'})-[:t9]->(q:B9E {gid: 'e:2'})
           WITH p MATCH (a:B9E {gid: 'e:1'})
           WHERE EXISTS { (a)-[:t9]->() } RETURN count(*) AS c""",
      "merge-rel-on-created-nodes" ->
        """CREATE (a:B9M {gid: 'b9m:1'}) CREATE (b:B9M {gid: 'b9m:2'})
           WITH a, b MERGE (a)-[r:t9m]->(b) RETURN type(r) AS t""")
    probes9.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, params).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE9 $tag: $res")
    }
    // battery 10: relationship renderings, stub matching, tx batches
    val probes10: Seq[(String, String)] = Seq(
      "rel-map-proj" ->
        "MATCH ()-[r:in_region]->() RETURN r {.source} AS m LIMIT 1",
      "properties-rel" ->
        "MATCH ()-[r:in_region]->() RETURN properties(r) AS p LIMIT 1",
      "collect-rels" ->
        "MATCH (n:Nation {gid:'n:1'})-[r]->() RETURN collect(r) AS rs",
      "return-rel-var" ->
        "MATCH ()-[r:in_region]->() RETURN r LIMIT 1",
      "stub-label-size" ->
        "MATCH (n) WHERE size(labels(n)) = 0 RETURN count(*) AS c",
      "labels-in-where" ->
        "MATCH (n) WHERE 'Nation' IN labels(n) RETURN count(*) AS c",
      "intx-rows-param" ->
        """UNWIND range(1, 4) AS i
           CALL { WITH i CREATE (:TxP {gid: 'txp:' + toString(i)}) }
           IN TRANSACTIONS OF $rows ROWS
           RETURN count(*) AS c""",
      "shortest-bare-undirected" ->
        """MATCH p = shortestPath((a:Nation {gid:'n:1'})-[*..3]-(b:Nation {gid:'n:5'}))
           RETURN length(p) AS l""",
      "count-star-group-empty" ->
        "MATCH (n:NopeL) RETURN n.gid AS g, count(*) AS c",
      "distinct-rels-count" ->
        "MATCH (a:Nation)-[r]-(b) RETURN count(DISTINCT r) AS c")
    probes10.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q,
            Map("rows" -> 2)).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE10 $tag: $res")
    }
    // battery 11: label predicates in WHERE, multi-label SET, path
    // helpers, CASE over aggregates, multi-hop MERGE
    val probes11: Seq[(String, String)] = Seq(
      "not-label-pred" ->
        "MATCH (n) WHERE NOT n:Nation RETURN count(*) AS c",
      "set-two-labels" ->
        """CREATE (n:SL {gid: 'sl:1'}) WITH n
           SET n:L1:L2 RETURN labels(n)[1] AS l1, labels(n)[2] AS l2""",
      "remove-mixed" ->
        """CREATE (n:RM:RX {gid: 'rm:1', a: '1', b: '2'}) WITH n
           REMOVE n.a, n:RX RETURN n.a IS NULL AS gone, labels(n) AS ls""",
      "case-over-agg" ->
        """MATCH (n:Nation)
           RETURN CASE WHEN count(*) > 5 THEN 'many' ELSE 'few' END AS c""",
      "head-nodes-p" ->
        """MATCH p = (a:Nation {gid:'n:1'})-[:in_region]->(b)
           RETURN head(nodes(p)) AS h, last(nodes(p)) AS t""",
      "len-eq-size-rels" ->
        """MATCH p = (a:Nation {gid:'n:1'})-[*1..2]->(b)
           RETURN length(p) = size(relationships(p)) AS eq LIMIT 2""",
      "reverse-nodes-p" ->
        """MATCH p = (a:Nation {gid:'n:1'})-[:in_region]->(b)
           RETURN reverse(nodes(p))[0] AS r0""",
      "merge-two-hops" ->
        """MERGE (x:MH {gid: 'mh:1'})-[:t]->(y:MH {gid: 'mh:2'})-[:t]->
           (z:MH {gid: 'mh:3'}) RETURN 1 AS ok""",
      "in-param-list-gids" ->
        "MATCH (n:Nation) WHERE n.gid IN $gids RETURN count(*) AS c",
      "nested-case-agg" ->
        """MATCH (n:Nation)-[r]->(m)
           RETURN m.gid AS g,
             CASE WHEN count(*) >= 6 THEN 'hub' ELSE 'leaf' END AS k
           ORDER BY g LIMIT 2""")
    probes11.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q,
            Map("gids" -> Seq("n:1", "n:2"))).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE11 $tag: $res")
    }
    // battery 12 (driver round 8): the new correlation/uniqueness/QPP
    // surface under everyday composition, plus common idioms not yet
    // probed
    val probes12: Seq[(String, String)] = Seq(
      "exists-value-in-with" ->
        """MATCH (n:Nation) WITH n.name AS nm, n
           WHERE EXISTS { MATCH (m:Nation) WHERE m.name = nm AND m.gid <> n.gid }
           RETURN count(*) AS c""",
      "count-corr-in-orderby" ->
        """MATCH (n:Nation) WITH n.gid AS g, n.name AS nm
           RETURN g, COUNT { (m:Nation) WHERE m.name < nm } AS smaller
           ORDER BY smaller DESC, g LIMIT 3""",
      "qpp-group-in-where" ->
        """MATCH (a:Nation {gid: 'n:1'}) ((x)-[r:in_region]->(y)){1,1} (c)
           WHERE size(r) = 1 RETURN y[0] AS first""",
      "qpp-group-unwind" ->
        """MATCH (a:Nation {gid: 'n:1'}) ((x)-[r:in_region]->(y)){1,1} (c)
           UNWIND y AS yy RETURN yy""",
      "uniq-undirected-pair" ->
        """MATCH (a:Nation {gid: 'n:1'})-[r1]-(b)-[r2]-(c)
           RETURN count(*) AS c""",
      "call-value-plus-node" ->
        """MATCH (n:Nation) WITH n, n.name AS nm
           CALL { WITH n, nm MATCH (n)-[:in_region]->(m)
                  RETURN nm + '>' + m.gid AS tag }
           RETURN count(*) AS c""",
      "call-star-with-values" ->
        """MATCH (n:Nation {gid: 'n:1'}) WITH n, n.name AS nm
           CALL (*) { MATCH (n)-[:in_region]->(m) RETURN m.gid AS mg }
           RETURN nm, mg""",
      "exists-nested-outer-val" ->
        """WITH 'NATION_3' AS target
           MATCH (n:Nation) WHERE EXISTS {
             MATCH (n)-[:in_region]->(m) WHERE n.name = target }
           RETURN n.gid AS g""",
      "pattern-comp-value-proj" ->
        """MATCH (n:Nation {gid: 'n:1'}) WITH n, 'X' AS mark
           RETURN [(n)-[:in_region]->(m) | mark + m.gid] AS tags""",
      "varlen-plus-fixed-uniq" ->
        """MATCH (a:Nation {gid: 'n:1'})-[r1:in_region]->(b)<-[rs:in_region*1..1]-(c)
           RETURN count(*) AS c""",
      "with-star" ->
        "MATCH (n:Nation {gid: 'n:1'}) WITH * RETURN n.gid AS g",
      "with-limit-then-match" ->
        """MATCH (n:Nation) WITH n ORDER BY n.gid LIMIT 1
           MATCH (n)-[:in_region]->(m) RETURN m.gid AS m""",
      "collect-unwind-nodes" ->
        """MATCH (n:Nation) WITH collect(n) AS ns
           UNWIND ns AS n RETURN count(*) AS c""",
      "map-proj-star" ->
        """MATCH (n:Nation {gid: 'n:1'}) RETURN n {.*} AS m""",
      "orderby-case" ->
        """MATCH (n:Nation) RETURN n.gid AS g
           ORDER BY CASE WHEN n.gid = 'n:3' THEN 0 ELSE 1 END, g LIMIT 2""",
      "distinct-return-nodes" ->
        """MATCH (n:Nation)-[:in_region]->(m) RETURN DISTINCT m ORDER BY m""",
      "string-fns-2" ->
        """RETURN left('hello', 2) AS l, right('hello', 2) AS r,
           replace('aXa', 'X', '-') AS rep, reverse('ab') AS rev""",
      "list-concat-in" ->
        "RETURN ([1,2] + [3])[2] AS v, 2 IN [1,2] AS m",
      "percentile-disc" ->
        """UNWIND [1.0, 2.0, 3.0, 4.0] AS x
           RETURN percentileDisc(x, 0.5) AS p""",
      "keys-size" ->
        "MATCH (n:Nation {gid: 'n:1'}) RETURN size(keys(n)) AS k")
    probes12.foreach { case (tag, q) =>
      val res =
        try {
          // the PRISTINE store — earlier write batteries mutate wstore
          val rows = CypherEngine.query(store, q).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE12 $tag: $res")
    }
    // aggregates over DYNAMIC numeric props (canonical strings): a
    // lexicographic min/max would order "9" > "40" — probe VALUES too
    val cstore = graft.queries.GraphOnTpch.customerGraphStore(s,
      "/root/testdata/sf0.001")
    val aggRows =
      try CypherEngine.query(cstore,
        """MATCH (c:Customer)
           RETURN min(c.acctbal) AS lo, max(c.acctbal) AS hi,
             round(avg(c.acctbal), 2) AS av, count(*) AS n""").collect()
      catch { case e: Throwable => println(
        s"PROBE3 agg-dynamic: FAIL ${e.getMessage.take(100)}"); Array.empty[org.apache.spark.sql.Row] }
    aggRows.foreach(r => println(s"PROBE3 agg-dynamic: $r"))
    // battery 13 (driver round 9): porting-friction surface — planner
    // hints, constraint DDL shims, legacy pattern-size, LOAD CSV,
    // dynamic labels, function-library stragglers
    val probes13: Seq[(String, String)] = Seq(
      "using-index-hint" ->
        """MATCH (n:Nation) USING INDEX n:Nation(gid)
           WHERE n.gid = 'n:1' RETURN n.name AS nm""",
      "using-scan-hint" ->
        """MATCH (n:Nation) USING SCAN n:Nation
           WHERE n.gid = 'n:1' RETURN n.name AS nm""",
      "create-constraint" ->
        """CREATE CONSTRAINT nation_gid IF NOT EXISTS
           FOR (n:Nation) REQUIRE n.gid IS UNIQUE""",
      "show-constraints" -> "SHOW CONSTRAINTS",
      "drop-constraint" -> "DROP CONSTRAINT nation_gid IF EXISTS",
      "legacy-pattern-size" ->
        "MATCH (n:Nation) RETURN size((n)-[:in_region]->()) AS d LIMIT 2",
      "pattern-count-where" ->
        "MATCH (n:Nation) WHERE size((n)-->()) > 0 RETURN count(*) AS c",
      "dyn-label-set" ->
        """CREATE (x:Tmp13 {gid: 'tmp13:1'}) WITH x
           SET x:$('Extra') RETURN labels(x) AS ls""",
      "load-csv" ->
        """LOAD CSV WITH HEADERS FROM 'file:///tmp/probe13.csv'
           AS row RETURN row.a AS a ORDER BY a""",
      "isnan-fn" -> "RETURN isNaN(1.5) AS f",
      "float-div-zero" -> "RETURN 1.5/0.0 AS inf, 0.0/0.0 AS nan",
      "float-div-isnan" -> "RETURN isNaN(0.0/0.0) AS n",
      "atan2-fn" -> "RETURN round(atan2(1.0, 1.0), 4) AS a",
      "char-length" -> "RETURN char_length('abc') AS c, character_length('ab') AS c2",
      "point-distance" ->
        """WITH point({x: 0.0, y: 0.0}) AS p1, point({x: 3.0, y: 4.0}) AS p2
           RETURN point.distance(p1, p2) AS d""",
      "datetime-epoch" ->
        "RETURN datetime({epochMillis: 86400000}).year AS y",
      "min-of-dates" ->
        """UNWIND [date('2024-02-01'), date('2023-01-01')] AS d
           RETURN min(d) AS lo, max(d) AS hi""",
      "toDegrees" -> "RETURN round(degrees(pi()), 2) AS d, round(radians(180.0), 4) AS r",
      "string-repeat-concat" -> "RETURN reduce(s = '', x IN range(1,3) | s + 'ab') AS r",
      "null-in-list-in" -> "RETURN null IN [1, 2] AS a, 1 IN [null, 1] AS b",
      "listcomp-nested" ->
        "RETURN [x IN [1,2] | [y IN [10] | x * y]] AS nested",
      "order-by-agg-alias" ->
        """MATCH (n:Nation)-[r]->(m) WITH m.gid AS g, count(*) AS c
           RETURN g, c ORDER BY c DESC, g LIMIT 2""")
    probes13.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(store, q).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE13 $tag: $res")
    }
    // battery 14 (driver round 9, session 2): semantic corners —
    // zero-length paths, null ordering/aggregation, optional-WHERE
    // placement, mixed-type orderability, boundary slices
    val probes14: Seq[(String, String)] = Seq(
      "varlen-zero" ->
        """MATCH (a:Nation {gid: 'n:1'})-[:in_region*0..1]->(b)
           RETURN b.gid AS g ORDER BY g""",
      "path-zero-len" ->
        "MATCH p = (n:Nation {gid: 'n:1'}) RETURN length(p) AS l",
      "optional-inline-where" ->
        """MATCH (n:Nation {gid: 'n:1'})
           OPTIONAL MATCH (n)-[:in_region]->(m) WHERE m.gid = 'nope'
           RETURN n.gid AS g, m.gid AS mg""",
      "agg-over-empty" ->
        """MATCH (n:Nation) WHERE n.gid = 'nope'
           RETURN sum(n.x) AS s, count(*) AS c, min(n.x) AS lo,
             avg(n.x) AS av, collect(n.gid) AS l""",
      "collect-skips-null" ->
        "UNWIND [1, null, 2] AS x RETURN collect(x) AS l",
      "string-predicates-null" ->
        """RETURN 'abc' STARTS WITH 'a' AS sw, 'abc' CONTAINS 'b' AS ct,
           'abc' ENDS WITH null AS en""",
      "null-prop-compare" ->
        """MATCH (n:Nation {gid: 'n:1'}) WITH n
           WHERE n.missing = 'x' RETURN count(*) AS c""",
      "orderby-null-asc" ->
        """UNWIND [3, null, 1] AS x RETURN x ORDER BY x""",
      "orderby-null-desc" ->
        """UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC""",
      "unwind-empty-agg" ->
        "UNWIND [] AS x RETURN count(x) AS c",
      "double-unwind" ->
        """UNWIND [[1,2],[3]] AS l UNWIND l AS x RETURN sum(x) AS s""",
      "with-shadow-self" ->
        "WITH 1 AS x WITH x + 1 AS x RETURN x",
      "min-mixed-types" ->
        """UNWIND [2, 'a', 1] AS x RETURN min(x) AS lo, max(x) AS hi""",
      "head-last-empty" ->
        "RETURN head([]) AS h, last([]) AS l, head(null) AS hn",
      "label-predicate-expr" ->
        """MATCH (n:Nation {gid: 'n:1'})
           RETURN n:Nation AS isN, n:Region AS isR""",
      "is-not-null-form" ->
        """MATCH (n:Nation) WHERE n.name IS NOT NULL
           RETURN count(*) AS c""",
      "tostring-forms" ->
        "RETURN toString(3.0) AS f, toString(true) AS b, toString(7) AS i",
      "round-half" ->
        "RETURN round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c",
      "slice-beyond" ->
        "RETURN [1,2,3][1..10] AS s, [1,2,3][-10..2] AS t",
      "range-step" ->
        "RETURN range(1, 10, 3) AS r, range(10, 1, -4) AS d",
      "map-equality" ->
        "RETURN {a: 1, b: 'x'} = {b: 'x', a: 1} AS eq",
      "list-in-listlist" ->
        "RETURN [1,2] IN [[1,2],[3]] AS m",
      "count-distinct-null" ->
        "UNWIND [1, null, 1, 2] AS x RETURN count(DISTINCT x) AS c",
      "substring-one-arg" ->
        "RETURN substring('hello', 1) AS s, size('hello') AS n",
      "collect-then-slice" ->
        """MATCH (n:Nation) WITH n.gid AS g ORDER BY g
           WITH collect(g) AS gs RETURN gs[..2] AS first2""",
      "not-null-logic" ->
        "RETURN NOT null AS a, -null AS b, null ^ 2 AS c",
      "double-mod" ->
        "RETURN 5.5 % 2.0 AS m, -5.5 % 2.0 AS n")
    probes14.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(store, q).collect()
          "PASS " + rows.take(3).mkString("; ").take(140)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE14 $tag: $res")
    }
    // battery 15: deletion contracts, EXISTS as a value, null flow
    // through scalar functions, list equality, error contracts
    val probes15: Seq[(String, String)] = Seq(
      "exists-as-value" ->
        """MATCH (n:Nation {gid: 'n:1'})
           RETURN EXISTS { MATCH (n)-[:in_region]->() } AS has,
             EXISTS { MATCH (n)-[:nope]->() } AS hasnt""",
      "count-as-value-return" ->
        """MATCH (n:Nation {gid: 'n:1'})
           RETURN COUNT { (n)-->() } + 10 AS c""",
      "scalar-null-flow" ->
        """RETURN toUpper(null) AS u, trim(null) AS t, size(null) AS s,
           reverse(null) AS r, split(null, ',') AS sp""",
      "labels-type-null" ->
        """OPTIONAL MATCH (n:Nope) RETURN labels(n) AS l,
           coalesce(null, null, 'x') AS c""",
      "list-equality" ->
        """RETURN [1,2] = [1,2] AS eq, [1,2] = [1,3] AS ne,
           [1,2] = [1,2,3] AS len, [1,[2]] = [1,[2]] AS nested""",
      "list-reverse" ->
        "RETURN reverse([1,2,3]) AS r",
      "agg-expr-distinct" ->
        """UNWIND [1,1,2] AS x
           RETURN collect(DISTINCT x * 10) AS l, sum(x * 10) AS s""",
      "case-in-sum" ->
        """MATCH (n:Nation) RETURN
           sum(CASE WHEN n.gid < 'n:2' THEN 1 ELSE 0 END) AS c""",
      "keys-empty" ->
        """MATCH (r:Region) RETURN keys(r) AS ks LIMIT 1""",
      "percentile-empty" ->
        """MATCH (n:Nation) WHERE n.gid = 'nope'
           RETURN percentileCont(n.x, 0.5) AS p""",
      "range-empty-step" ->
        "RETURN range(1, 5, -1) AS r, range(5, 1) AS d",
      "substring-oob" ->
        "RETURN substring('abc', 10) AS s",
      "size-of-map-error" ->
        "RETURN size({a: 1}) AS s",
      "orderby-hidden-distinct" ->
        """MATCH (n:Nation) RETURN DISTINCT n.name AS nm
           ORDER BY n.gid LIMIT 2""",
      "datetime-truncate" ->
        """RETURN date.truncate('month', date('2024-03-17')) AS m,
           datetime.truncate('day', datetime('2024-03-17T10:30:00Z')) AS d""",
      "duration-between" ->
        """RETURN duration.between(date('2024-01-01'),
           date('2024-03-15')) AS d""",
      "timestamp-consistency" ->
        "RETURN timestamp() >= 0 AS ok")
    probes15.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(store, q).collect()
          "PASS " + rows.take(3).mkString("; ").take(140)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE15 $tag: $res")
    }
    // write-path contracts on the mutable store: Neo4j refuses a
    // plain DELETE of a node with relationships (DETACH required)
    val writeProbes15: Seq[(String, String)] = Seq(
      "delete-connected-node" ->
        """MATCH (n:Nation {gid: 'n:2'}) DELETE n""",
      "detach-delete-connected" ->
        """MATCH (n:Nation {gid: 'n:3'}) DETACH DELETE n""",
      "delete-null-noop" ->
        """OPTIONAL MATCH (n:Nope) DELETE n RETURN count(*) AS c""",
      "merge-prop-map-rel" ->
        """MATCH (a:Nation {gid: 'n:4'})-[:in_region]->(b)
           MERGE (a)-[r:in_region {source: 'nations'}]->(b)
           RETURN type(r) AS t""")
    writeProbes15.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE15W $tag: $res")
    }
    // battery 16: write composition, within-statement MERGE dedup,
    // parameter access forms, precedence, nested projections
    val params16 = Map("m" -> Map("key" -> "NATION_1"),
      "list" -> Seq("NATION_1", "NATION_2"))
    val probes16: Seq[(String, String)] = Seq(
      "unwind-merge-dedup" ->
        """UNWIND [1, 1, 1] AS x MERGE (n:T16 {gid: 't16:dup'})
           RETURN count(n) AS c""",
      "set-case-rhs" ->
        """MATCH (n:Nation {gid: 'n:6'})
           SET n.sz = CASE WHEN n.name CONTAINS '6' THEN 'has6'
             ELSE 'no6' END
           RETURN n.sz AS sz""",
      "write-in-call" ->
        """MATCH (n:Nation {gid: 'n:7'})
           CALL { WITH n CREATE (c:T16 {gid: 'c16:' + n.gid}) }
           RETURN count(*) AS c""",
      "remove-then-read" ->
        """CREATE (x:T16 {gid: 't16:rm', p: 1}) WITH x
           REMOVE x.p RETURN x.p IS NULL AS gone""",
      "nested-foreach" ->
        """FOREACH (i IN [1, 2] |
             FOREACH (j IN [1] |
               CREATE (:T16 {gid: 't16:f' + toString(i)})))""",
      "nested-map-proj" ->
        """MATCH (n:Nation {gid: 'n:8'})-[:in_region]->(m)
           RETURN n {.name, region: m {.gid}} AS proj""",
      "param-map-access" ->
        "RETURN $m.key AS v",
      "param-in-list" ->
        """MATCH (n:Nation) WHERE n.name IN $list
           RETURN count(*) AS c""",
      "collect-distinct-nodes" ->
        """MATCH (n:Nation)-[:in_region]->(m)
           RETURN size(collect(DISTINCT m)) AS c""",
      "reduce-over-structs" ->
        """MATCH (n:Nation) WITH collect(n) AS ns
           RETURN reduce(s = 0, x IN ns | s + size(x.gid)) AS tot""",
      "skip0-limit0" ->
        "MATCH (n:Nation) RETURN n.gid AS g SKIP 0 LIMIT 0",
      "count-distinct-two-args" ->
        "MATCH (n:Nation) RETURN count(DISTINCT n.gid, n.name) AS c",
      "datetime-minus-datetime" ->
        """RETURN datetime('2024-01-02T00:00:00Z')
           - datetime('2024-01-01T00:00:00Z') AS d""",
      "precedence-mix" ->
        "RETURN 2 + 3 * 4 ^ 2 % 5 AS v, 'a' + 1 + 2 AS s",
      "with-agg-case" ->
        """MATCH (n:Nation) WITH CASE WHEN count(*) > 10 THEN 'many'
             ELSE 'few' END AS verdict
           RETURN verdict""",
      "tostring-date" ->
        "RETURN toString(date('2024-03-05')) AS d",
      "merge-return-created-flag" ->
        """MERGE (n:T16 {gid: 't16:flag'})
           ON CREATE SET n.created = 'yes'
           RETURN n.created AS c""")
    probes16.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q, params16).collect()
          "PASS " + rows.take(2).mkString("; ").take(120)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE16 $tag: $res")
    }
    // battery 17: UNION name alignment, MERGE direction contracts,
    // EXPLAIN over write CALLs, YIELD filtering, null/empty corners
    val probes17: Seq[(String, String)] = Seq(
      "union-name-order" ->
        "RETURN 1 AS a, 2 AS b UNION RETURN 4 AS b, 3 AS a",
      "union-distinct-rows" ->
        "RETURN 1 AS a UNION RETURN 1 AS a UNION RETURN 2 AS a",
      "merge-undirected-reject" ->
        """MERGE (a:Nation {gid: 'n:1'})-[r:x17]-(b:Nation {gid: 'n:2'})
           RETURN type(r) AS t""",
      "create-undirected-reject" ->
        "CREATE (a:T17 {gid: 't17:1'})-[:u17]-(b:T17 {gid: 't17:2'})",
      "explain-write-call" ->
        """EXPLAIN MATCH (n:Nation)
           CALL { WITH n CREATE (:T17 {gid: 'x'}) } RETURN count(*) AS c""",
      "yield-where" ->
        """CALL dbms.procedures() YIELD name
           WHERE name CONTAINS 'graft' RETURN count(*) AS c""",
      "case-null-cond" ->
        "RETURN CASE WHEN null THEN 1 ELSE 2 END AS v",
      "in-empty-list" ->
        "RETURN 1 IN [] AS a, NOT 1 IN [2] AS b",
      "legacy-exists-prop" ->
        """MATCH (n:Nation {gid: 'n:1'})
           RETURN exists(n.name) AS a, exists(n.nope) AS b""",
      "string-order" ->
        "RETURN 'a' < 'b' AS lt, 'B' < 'a' AS caseord",
      "with-skip-limit-mid" ->
        """MATCH (n:Nation) WITH n.gid AS g ORDER BY g SKIP 2 LIMIT 2
           RETURN collect(g) AS gs""",
      "double-optional-chain" ->
        """MATCH (n:Nation {gid: 'n:1'})
           OPTIONAL MATCH (n)-[:nope]->(m)
           OPTIONAL MATCH (m)-[:in_region]->(r)
           RETURN n.gid AS g, m.gid AS mg, r.gid AS rg""",
      "varlen-prop-filter" ->
        """MATCH (a:Nation {gid: 'n:1'})-[*1..2 {source: 'nations'}]->(b)
           RETURN count(*) AS c""",
      "labels-of-rel" ->
        """MATCH (:Nation {gid: 'n:1'})-[r]->() RETURN labels(r) AS l""")
    probes17.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(wstore, q).collect()
          "PASS " + rows.take(3).mkString("; ").take(130)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE17 $tag: $res")
    }

    // battery 18: the round-10 surface — vector/fulltext index DDL +
    // procedures, dynamic labels/types, typed list subscripts,
    // Math.round boundary parity
    val istore = new graft.store.GraphStore(
      java.nio.file.Files.createTempDirectory("graft-probe18").toString,
      s, 4)
    val isess = CypherEngine.session(istore)
    (1 to 12).foreach(i => isess.run(
      s"CREATE (:P18 {gid: 'p:$i', v: [${i % 5}.0, ${i % 3}.0, 1.0], " +
        s"body: 'alpha w$i ${if (i % 2 == 0) "beta" else "gamma"}'})")
      .collect())
    isess.commit()
    val probes18: Seq[(String, String)] = Seq(
      "create-vector-index" ->
        """CREATE VECTOR INDEX p18v IF NOT EXISTS FOR (n:P18) ON (n.v)
           OPTIONS {indexConfig: {`vector.dimensions`: 3,
             `vector.similarity_function`: 'cosine'}}""",
      "create-fulltext-index" ->
        "CREATE FULLTEXT INDEX p18f FOR (n:P18) ON EACH [n.body]",
      "vector-query" ->
        """CALL db.index.vector.queryNodes('p18v', 3, [1.0, 1.0, 1.0])
           YIELD node, score RETURN node.gid AS g, round(score, 6) AS s""",
      "vector-query-yield-alias" ->
        """CALL db.index.vector.queryNodes('p18v', 2, [0.0, 1.0, 1.0])
           YIELD node AS n, score AS sc WHERE sc > 0
           RETURN n.gid AS g ORDER BY g""",
      "fulltext-query" ->
        """CALL db.index.fulltext.queryNodes('p18f', 'beta')
           YIELD node, score RETURN count(*) AS hits""",
      "fulltext-score-filter" ->
        """CALL db.index.fulltext.queryNodes('p18f', 'alpha beta')
           YIELD node, score WHERE score > 0.1
           RETURN count(*) AS hits""",
      "show-indexes-declared" ->
        "SHOW INDEXES YIELD name WHERE name STARTS WITH 'p18' RETURN name ORDER BY name",
      "vector-wrong-dims" ->
        """CALL db.index.vector.queryNodes('p18v', 2, [1.0])
           YIELD node, score RETURN count(*) AS c""",
      "fulltext-unknown-index" ->
        """CALL db.index.fulltext.queryNodes('nope', 'x')
           YIELD node, score RETURN count(*) AS c""",
      "dyn-label-perrow-create" ->
        """UNWIND [{g: 'd18:1', k: 'D18A'}, {g: 'd18:2', k: 'D18B'}] AS r
           CREATE (:$(r.k) {gid: r.g})""",
      "dyn-label-match-const" ->
        """MATCH (n:$('D18A')) RETURN n.gid AS g""",
      "dyn-reltype-create" ->
        """MATCH (a {gid: 'd18:1'}) MATCH (b {gid: 'd18:2'})
           CREATE (a)-[:$('L18' + 'X')]->(b)""",
      "dyn-reltype-match" ->
        "MATCH ()-[r:$('L18X')]->() RETURN count(*) AS c",
      "typed-subscript-arith" ->
        """MATCH (n:P18 {gid: 'p:1'}) RETURN n.v[0] + 1 AS a,
           n.v[-1] * 2 AS b""",
      "typed-subscript-compare" ->
        "MATCH (n:P18) WHERE n.v[2] >= 1 RETURN count(*) AS c",
      "round-half-boundary" ->
        "RETURN round(0.49999999999999994) AS z, round(0.5) AS h, round(-0.5) AS nh",
      "fulltext-limit-option" ->
        """CALL db.index.fulltext.queryNodes('p18f', 'alpha', {limit: 3})
           YIELD node, score RETURN count(*) AS hits""",
      "show-fulltext-indexes" ->
        "SHOW FULLTEXT INDEXES",
      "show-vector-indexes" ->
        "SHOW VECTOR INDEXES",
      "drop-vector-index" -> "DROP INDEX p18v",
      "vector-query-after-drop" ->
        """CALL db.index.vector.queryNodes('p18v', 2, [1.0, 1.0, 1.0])
           YIELD node, score RETURN count(*) AS c""")
    probes18.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(istore, q).collect()
          "PASS " + rows.take(3).mkString("; ").take(130)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE18 $tag: $res")
    }

    // battery 19 (driver round 11): property indexes + routed
    // lookups, relationship fulltext, analyzers, Lucene query syntax,
    // IVF scale-dial options
    val pstore = new graft.store.GraphStore(
      java.nio.file.Files.createTempDirectory("graft-probe19").toString,
      s, 4)
    val p19sess = CypherEngine.session(pstore)
    (1 to 12).foreach { i =>
      p19sess.run(
        s"CREATE (:U19 {gid: 'u19:$i', mail: 'm$i@x.io', n: ${i % 4}, " +
          s"bio: 'Likes Spark, joins & Hash-maps no$i'})").collect()
    }
    p19sess.run("MERGE (:U19 {gid: 'u19:hub'})").collect()
    (1 to 3).foreach(i => p19sess.run(
      s"""MATCH (a:U19 {gid: 'u19:$i'}), (b:U19 {gid: 'u19:hub'})
         |CREATE (a)-[:FOLLOWS {source: 'Feed Import $i'}]->(b)"""
        .stripMargin).collect())
    p19sess.commit()
    val probes19: Seq[(String, String)] = Seq(
      "prop-index-create" ->
        "CREATE INDEX u19mail FOR (u:U19) ON (u.mail)",
      "prop-index-create-unnamed" ->
        "CREATE INDEX FOR (u:U19) ON (u.n)",
      "prop-index-if-not-exists" ->
        "CREATE INDEX u19mail IF NOT EXISTS FOR (u:U19) ON (u.mail)",
      "prop-index-duplicate" ->
        "CREATE INDEX u19mail FOR (u:U19) ON (u.mail)",
      "prop-index-range-kw" ->
        "CREATE RANGE INDEX u19r FOR (u:U19) ON (u.bio)",
      "prop-index-gid-intrinsic" ->
        "CREATE INDEX gx19 FOR (u:U19) ON (u.gid)",
      "prop-index-composite-error" ->
        "CREATE INDEX c19 FOR (u:U19) ON (u.a, u.b)",
      "prop-lookup-inline" ->
        "MATCH (u:U19 {mail: 'm7@x.io'}) RETURN u.gid AS g",
      "prop-lookup-where" ->
        "MATCH (u:U19) WHERE u.mail = 'm3@x.io' RETURN u.gid AS g",
      "prop-lookup-param" ->
        "MATCH (u:U19 {n: $k}) RETURN count(*) AS c",
      "prop-lookup-numeric-cross" ->
        "MATCH (u:U19 {n: 2.0}) RETURN count(*) AS c",
      "show-range-indexes" ->
        ("SHOW RANGE INDEXES YIELD name WHERE name STARTS WITH 'u19' " +
          "RETURN name ORDER BY name"),
      "ft-analyzer-default" ->
        "CREATE FULLTEXT INDEX f19 FOR (u:U19) ON EACH [u.bio]",
      "ft-query-case-insensitive" ->
        """CALL db.index.fulltext.queryNodes('f19', 'SPARK')
           YIELD node, score RETURN count(*) AS c""",
      "ft-query-punct-stripped" ->
        """CALL db.index.fulltext.queryNodes('f19', 'hash')
           YIELD node, score RETURN count(*) AS c""",
      "ft-lucene-and-not" ->
        """CALL db.index.fulltext.queryNodes('f19', 'spark AND hash NOT no3')
           YIELD node, score RETURN count(*) AS c""",
      "ft-lucene-phrase" ->
        """CALL db.index.fulltext.queryNodes('f19', '"likes spark"')
           YIELD node, score RETURN count(*) AS c""",
      "ft-lucene-prefix" ->
        """CALL db.index.fulltext.queryNodes('f19', 'jo*')
           YIELD node, score RETURN count(*) AS c""",
      "ft-lucene-parens" ->
        """CALL db.index.fulltext.queryNodes('f19', '(no1 OR no2) AND spark')
           YIELD node, score RETURN count(*) AS c""",
      "ft-pure-negative-error" ->
        """CALL db.index.fulltext.queryNodes('f19', 'NOT spark')
           YIELD node, score RETURN count(*) AS c""",
      "ft-whitespace-analyzer-opt" ->
        """CREATE FULLTEXT INDEX f19w FOR (u:U19) ON EACH [u.bio]
           OPTIONS {indexConfig: {`fulltext.analyzer`: 'whitespace'}}""",
      "ft-whitespace-case-sensitive" ->
        """CALL db.index.fulltext.queryNodes('f19w', 'spark')
           YIELD node, score RETURN count(*) AS c""",
      "relft-create" ->
        """CREATE FULLTEXT INDEX rf19 FOR ()-[r:FOLLOWS]-()
           ON EACH [r.source]""",
      "relft-query" ->
        """CALL db.index.fulltext.queryRelationships('rf19', 'feed')
           YIELD relationship, score
           RETURN endNode(relationship).gid AS g, count(*) AS c""",
      "relft-wrong-proc" ->
        """CALL db.index.fulltext.queryNodes('rf19', 'feed')
           YIELD node, score RETURN count(*) AS c""",
      "relft-nonsource-error" ->
        "CREATE FULLTEXT INDEX rb19 FOR ()-[r:FOLLOWS]-() ON EACH [r.weight]",
      "rel-vector-error" ->
        "CREATE VECTOR INDEX rv19 FOR ()-[r:FOLLOWS]-() ON (r.v)",
      "vector-dial-options" ->
        """CREATE VECTOR INDEX v19 FOR (u:U19) ON (u.emb)
           OPTIONS {indexConfig: {`graft.ivf.cells`: 8,
             `graft.ivf.nprobe`: 3}}""",
      "vector-dial-out-of-range" ->
        """CREATE VECTOR INDEX v19b FOR (u:U19) ON (u.emb)
           OPTIONS {indexConfig: {`graft.ivf.cells`: 99999}}""",
      "prop-index-drop" -> "DROP INDEX u19r",
      "merge-chain-pure-match" ->
        """MERGE (a:U19 {gid: 'u19:1'})-[:FOLLOWS]->(b:U19 {gid: 'u19:hub'})
           RETURN a.mail AS m""",
      "prop-index-options-provider" ->
        """CREATE INDEX u19mail2 FOR (u:U19) ON (u.bio)
           OPTIONS {indexProvider: 'range-1.0'}""",
      "await-index" -> "CALL db.awaitIndex('u19mail')",
      "await-indexes-bare" -> "CALL db.awaitIndexes()",
      "await-missing-index" -> "CALL db.awaitIndex('missing19')",
      "legacy-vector-create" ->
        "CALL db.index.vector.createNodeIndex('lv19', 'U19', 'emb', 4)",
      "legacy-fulltext-create" ->
        "CALL db.index.fulltext.createNodeIndex('lf19', ['U19'], ['bio'])",
      "legacy-fulltext-query" ->
        """CALL db.index.fulltext.queryNodes('lf19', 'spark')
           YIELD node, score RETURN count(*) AS c""",
      "graph-tier-create" ->
        """CREATE VECTOR INDEX vgt19 FOR (u:U19) ON (u.emb)
           OPTIONS {indexConfig: {`graft.graph.degree`: 4}}""",
      "prop-in-list-lookup" ->
        """MATCH (u:U19) WHERE u.mail IN ['m2@x.io', 'm9@x.io']
           RETURN count(*) AS c""",
      "show-indexes-new-cols" ->
        ("SHOW INDEXES YIELD name, labelsOrTypes, indexProvider " +
          "WHERE name = 'u19mail' RETURN labelsOrTypes, indexProvider"),
      "hetero-column-list" ->
        """MATCH (u:U19 {gid: 'u19:2'})
           RETURN [u.mail, {k: u.n}, [u.n]][1].k AS k""")
    probes19.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(pstore, q,
            Map("k" -> 2L)).collect()
          "PASS " + rows.take(3).mkString("; ").take(130)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE19 $tag: $res")
    }

    // battery 20 (driver round 12): range/STARTS WITH/composite index
    // routing, constraints, quantized vector tier, dictionary-bounded
    // prefix + fuzzy + field-scoped fulltext, skip pagination
    val qstore = new graft.store.GraphStore(
      java.nio.file.Files.createTempDirectory("graft-probe20").toString,
      s, 4)
    val p20sess = CypherEngine.session(qstore)
    (1 to 30).foreach { i =>
      p20sess.run(
        f"CREATE (:U20 {gid: 'u20:$i', mail: 'm$i%03d@x.io', age: $i, " +
          s"seg: 's${i % 3}', bio: 'doc$i spark merge hash no$i', " +
          s"emb: [${i / 7.0}, ${(i % 5).toDouble}, 1.0, 2.0]})").collect()
    }
    p20sess.commit()
    val probes20: Seq[(String, String)] = Seq(
      "range-index-create" ->
        "CREATE INDEX u20age FOR (u:U20) ON (u.age)",
      "range-gt-lookup" ->
        "MATCH (u:U20) WHERE u.age > 27 RETURN count(*) AS c",
      "range-between-lookup" ->
        ("MATCH (u:U20) WHERE u.age >= 10 AND u.age <= 12 " +
          "RETURN count(*) AS c"),
      "range-param-bound" ->
        "MATCH (u:U20) WHERE u.age < $lo RETURN count(*) AS c",
      "mail-index-create" ->
        "CREATE INDEX u20mail FOR (u:U20) ON (u.mail)",
      "starts-with-lookup" ->
        ("MATCH (u:U20) WHERE u.mail STARTS WITH 'm02' " +
          "RETURN count(*) AS c"),
      "broad-range-keeps-scan" ->
        "MATCH (u:U20) WHERE u.age > 0 RETURN count(*) AS c",
      "composite-create" ->
        "CREATE INDEX u20sm FOR (u:U20) ON (u.seg, u.age)",
      "composite-all-bound-lookup" ->
        "MATCH (u:U20 {seg: 's1', age: 7}) RETURN u.gid AS g",
      "composite-partial-scan" ->
        "MATCH (u:U20 {seg: 's1'}) RETURN count(*) AS c",
      "composite-model-col-error" ->
        "CREATE INDEX bad20 FOR (u:U20) ON (u.gid, u.seg)",
      "constraint-unique-create" ->
        "CREATE CONSTRAINT u20um FOR (u:U20) REQUIRE u.mail IS UNIQUE",
      "constraint-notnull-create" ->
        ("CREATE CONSTRAINT u20nb FOR (u:U20) " +
          "REQUIRE u.bio IS NOT NULL"),
      "constraint-dup-veto" ->
        "CREATE (:U20 {gid: 'u20:99', mail: 'm003@x.io', bio: 'x'})",
      "constraint-null-veto" ->
        "CREATE (:U20 {gid: 'u20:98', mail: 'new@x.io'})",
      "constraint-ok-create" ->
        "CREATE (:U20 {gid: 'u20:97', mail: 'ok@x.io', bio: 'y'})",
      "constraint-show" ->
        ("SHOW CONSTRAINTS YIELD name WHERE name STARTS WITH 'u20' " +
          "RETURN name ORDER BY name"),
      "constraint-node-key-error" ->
        ("CREATE CONSTRAINT nk20 FOR (u:U20) " +
          "REQUIRE (u.a, u.b) IS NODE KEY"),
      "constraint-drop" -> "DROP CONSTRAINT u20nb",
      "constraint-gid-intrinsic" ->
        ("CREATE CONSTRAINT g20 IF NOT EXISTS FOR (u:U20) " +
          "REQUIRE u.gid IS UNIQUE"),
      "quant-sq8-create" ->
        """CREATE VECTOR INDEX q20 FOR (u:U20) ON (u.emb)
           OPTIONS {indexConfig: {`graft.quantization`: 'sq8'}}""",
      "quant-sq8-query" ->
        """CALL db.index.vector.queryNodes('q20', 3, [2.0, 4.0, 1.0, 2.0])
           YIELD node, score RETURN count(*) AS c""",
      "quant-bq-create" ->
        """CREATE VECTOR INDEX qb20 FOR (u:U20) ON (u.emb)
           OPTIONS {indexConfig: {`graft.quantization`: 'bq'}}""",
      "quant-bad-kind-error" ->
        """CREATE VECTOR INDEX qx20 FOR (u:U20) ON (u.emb)
           OPTIONS {indexConfig: {`graft.quantization`: 'pq4'}}""",
      "quant-graph-conflict-error" ->
        """CREATE VECTOR INDEX qg20 FOR (u:U20) ON (u.emb)
           OPTIONS {indexConfig: {`graft.quantization`: 'sq8',
             `graft.graph.degree`: 4}}""",
      "ft-create" ->
        "CREATE FULLTEXT INDEX f20 FOR (u:U20) ON EACH [u.bio, u.mail]",
      "ft-prefix-dict-bounded" ->
        """CALL db.index.fulltext.queryNodes('f20', 'doc2*')
           YIELD node, score RETURN count(*) AS c""",
      "ft-fuzzy" ->
        """CALL db.index.fulltext.queryNodes('f20', 'mergee~1')
           YIELD node, score RETURN count(*) AS c""",
      "ft-fuzzy-default-distance" ->
        """CALL db.index.fulltext.queryNodes('f20', 'mxrgx~')
           YIELD node, score RETURN count(*) AS c""",
      "ft-field-scoped" ->
        """CALL db.index.fulltext.queryNodes('f20', 'bio:spark')
           YIELD node, score RETURN count(*) AS c""",
      "ft-field-unknown-error" ->
        """CALL db.index.fulltext.queryNodes('f20', 'nope:spark')
           YIELD node, score RETURN count(*) AS c""",
      "ft-boost" ->
        """CALL db.index.fulltext.queryNodes('f20', 'spark^2')
           YIELD node, score RETURN count(*) AS c""",
      "ft-slop" -> // positional postings serve proximity queries
        """CALL db.index.fulltext.queryNodes('f20', '"a b"~2')
           YIELD node, score RETURN count(*) AS c""",
      "ft-skip-limit" ->
        """CALL db.index.fulltext.queryNodes('f20', 'spark',
           {skip: 2, limit: 3}) YIELD node, score
           RETURN count(*) AS c""",
      "ft-await-refresh" ->
        "CALL db.index.fulltext.awaitEventuallyConsistentIndexRefresh()")
    probes20.foreach { case (tag, q) =>
      val res =
        try {
          val rows = CypherEngine.query(qstore, q,
            Map("lo" -> 4L)).collect()
          "PASS " + rows.take(3).mkString("; ").take(130)
        } catch { case e: Throwable =>
          s"FAIL ${String.valueOf(e.getMessage).take(130)}" }
      println(s"PROBE20 $tag: $res")
    }
    s.stop()
  }
}

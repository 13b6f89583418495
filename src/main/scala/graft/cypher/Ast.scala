package graft.cypher

/** AST for the openCypher subset the reference evidences
  * (/root/reference/layer_test.go:117 and the D1 `Query()` contract,
  * /root/reference/neo4j.go:289-291): MATCH / OPTIONAL MATCH
  * single-hop patterns, WHERE comparisons, RETURN projections with
  * aliases, COLLECT + the standard aggregates, ORDER BY / SKIP /
  * LIMIT. Not full openCypher 9 (SURVEY §7.4.5) — the grammar is
  * bounded by what the reference's read surface implies.
  */
object Ast {

  sealed trait Expr
  case class Lit(v: Any) extends Expr
  case class VarRef(name: String) extends Expr
  case class PropRef(variable: String, prop: String) extends Expr
  case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  case class And(l: Expr, r: Expr) extends Expr
  case class Or(l: Expr, r: Expr) extends Expr
  case class Not(e: Expr) extends Expr
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** `x IS [NOT] :: TYPE` (Neo4j 5 type predicate); tpe ∈
    * INTEGER/FLOAT/STRING/BOOLEAN/LIST/MAP */
  case class TypePred(e: Expr, tpe: String, negated: Boolean) extends Expr
  case class FuncCall(name: String, args: Seq[Expr], distinct: Boolean)
      extends Expr
  case class MapLit(entries: Seq[(String, Expr)]) extends Expr
  case object Star extends Expr // count(*)

  case class ListLit(items: Seq[Expr]) extends Expr
  case class Param(name: String) extends Expr

  /** `x IN list` membership (list literal, param list, or collected
    * value) */
  case class InList(e: Expr, list: Expr) extends Expr
  /** `STARTS WITH` / `ENDS WITH` / `CONTAINS` string predicates;
    * op ∈ {startswith, endswith, contains} */
  case class StrPred(op: String, l: Expr, r: Expr) extends Expr
  /** CASE — simple form carries the test expression (`CASE x WHEN v
    * THEN r`), searched form has test=None (`CASE WHEN pred THEN r`) */
  case class CaseExpr(test: Option[Expr], whens: Seq[(Expr, Expr)],
      els: Option[Expr]) extends Expr
  /** binary arithmetic; op ∈ {+, -, *, /, %, ^}. `+` doubles as
    * string and list concatenation (openCypher operator overload). */
  case class Arith(op: String, l: Expr, r: Expr) extends Expr
  /** `coll[idx]` — 0-based list index (negative = from the end) or
    * string map-key access */
  case class Subscript(coll: Expr, idx: Expr) extends Expr
  /** `n {.name, .age, alias: expr, x, .*}` map projection (Neo4j).
    * `.k` desugars to `(k, PropRef(n, k))` and a bare variable `x` to
    * `(x, VarRef(x))` at parse time; `all` marks `.*` (every property
    * of `n`, overridden by explicit entries) */
  case class MapProj(variable: String, entries: Seq[(String, Expr)],
      all: Boolean) extends Expr
  /** `n:Label` / `n:A:B` label predicate in expression position
    * (`WHERE n:Admin`, `RETURN n:Admin AS isAdmin`) — true when the
    * node carries EVERY listed label (primary or secondary) */
  case class LabelPred(variable: String, labels: Seq[String]) extends Expr
  /** `coll[from..to]` — end-exclusive list slice, openCypher
    * semantics; either bound may be omitted, negative counts from the
    * end */
  case class Slice(coll: Expr, from: Option[Expr], to: Option[Expr])
      extends Expr
  /** `[x IN list WHERE pred | proj]` list comprehension (both parts
    * optional; bare `[x IN list]` copies) */
  case class ListComp(variable: String, list: Expr, where: Option[Expr],
      proj: Option[Expr]) extends Expr
  /** `any/all/none/single(x IN list WHERE pred)` quantified
    * predicates */
  case class Quant(op: String, variable: String, list: Expr, pred: Expr)
      extends Expr
  /** `reduce(acc = init, x IN list | body)` */
  case class ReduceExpr(acc: String, init: Expr, variable: String,
      list: Expr, body: Expr) extends Expr
  /** `exists((n)-[:T]->(m))` / `EXISTS { [MATCH] pattern [WHERE …] }`
    * pattern predicate — true when the pattern matches at least once
    * for the row's bindings; usable only as a (possibly NOT-negated)
    * top-level WHERE conjunct, where it plans as a semi/anti join */
  /** `full` (Neo4j 5): the body is a whole regular query (multiple
    * MATCHes, WITH stages, UNWIND …) instead of a single pattern —
    * `pattern`/`where` are unused dummies then. Outer variables are
    * auto-imported, as Neo4j scopes these subqueries. */
  case class PatternPred(pattern: PathPattern,
      where: Option[Expr] = None,
      full: Option[Query] = None) extends Expr
  /** `COUNT { [MATCH] pattern [WHERE …] }` — the number of pattern
    * matches per row (a correlated count, NOT a grouping aggregate);
    * usable as a RETURN/WITH item or compared in a WHERE conjunct.
    * `full` as on [[PatternPred]]. */
  case class CountSub(pattern: PathPattern,
      where: Option[Expr] = None,
      full: Option[Query] = None) extends Expr
  /** `[(n)-[:T]->(m) WHERE pred | proj]` pattern comprehension — the
    * projection evaluated over every match of the pattern for the
    * row's bindings, as a list (the collect-subquery idiom; empty
    * list when nothing matches). The projection is mandatory
    * (openCypher grammar — without `|` the text is a list literal).
    */
  /** `full` (Neo4j 5): a whole-query COLLECT{} body — the body's
    * single RETURN item is the collected projection; pattern/where/
    * proj are unused dummies then. */
  case class PatternComp(pattern: PathPattern, where: Option[Expr],
      proj: Expr, full: Option[Query] = None) extends Expr

  /** property values may be literals OR expressions (parameters,
    * `item.k` property references) — the reference's own templates
    * write `MERGE (n {gid: item.gid})` (/root/reference/neo4j.go:103).
    */
  /** `where` is the Neo4j-5 inline form `(n:L WHERE pred)` — the
    * parser folds it into the owning clause's WHERE, so the planner
    * never sees it here.
    */
  /** `altLabels` holds the tail of a label disjunction `(n:A|B|C)` —
    * match-only (writes reject it). `extraLabels` holds the tail of a
    * label CONJUNCTION `(n:A:B)` — every listed label must be present
    * on a match; on CREATE the head is the primary label and the tail
    * lands as secondary labels. The two forms don't mix.
    */
  /** `dynLabel` carries a Cypher 25 dynamic label `(n:$(expr))` —
    * resolved at plan time when the expression is constant
    * (literal/parameter), evaluated per row in CREATE otherwise
    */
  case class NodePattern(
      variable: Option[String],
      label: Option[String],
      props: Seq[(String, Expr)],
      where: Option[Expr] = None,
      altLabels: Seq[String] = Nil,
      extraLabels: Seq[String] = Nil,
      dynLabel: Option[Expr] = None)

  /** direction: +1 for ()-[]->(), -1 for ()<-[]-(), 0 for the
    * undirected ()-[]-() (matches the relationship either way);
    * varLength: Some((min, max)) for `-[:T*min..max]->`
    */
  /** `altRelTypes` holds the tail of a type disjunction `-[:A|B]->`
    * — match-only (CREATE needs one concrete type).
    */
  /** `props` holds an inline property map `-[r:T {source: 'x'}]->` —
    * the edge model's properties are `source` and `type`; in MATCH
    * they desugar to equality predicates, in CREATE/MERGE `source`
    * initializes the edge's source column.
    */
  /** `qppNodeVars` carries a quantified path pattern's inner node
    * GROUP variables `((a)-[r]->(b)){m,n}` — (source, target) names
    * that bind per-iteration gid LISTS (GQL group variables); the
    * rel's own `variable` is the relationship group variable.
    */
  /** `dynType` carries a dynamic relationship type `-[:$(expr)]->` —
    * same resolution rule as NodePattern.dynLabel */
  case class RelPattern(
      variable: Option[String],
      relType: Option[String],
      direction: Int,
      varLength: Option[(Int, Int)] = None,
      altRelTypes: Seq[String] = Nil,
      where: Option[Expr] = None,
      props: Seq[(String, Expr)] = Nil,
      qppNodeVars: Option[(Option[String], Option[String])] = None,
      dynType: Option[Expr] = None)

  /** `pathVar` binds `p = …` (length(p) resolves to the hop count);
    * `shortest` marks `shortestPath(…)` — one minimal-length row per
    * (start, end) pair; `allShortest` marks `allShortestPaths(…)` —
    * every minimal-length path row per pair.
    */
  case class PathPattern(head: NodePattern, hops: Seq[(RelPattern, NodePattern)],
      pathVar: Option[String] = None, shortest: Boolean = false,
      allShortest: Boolean = false)

  sealed trait Clause
  /** one MATCH with all its comma-separated patterns and its WHERE —
    * kept together so OPTIONAL MATCH can treat the whole clause as a
    * single all-or-nothing unit
    */
  case class MatchClause(
      patterns: Seq[PathPattern],
      optional: Boolean,
      where: Option[Expr]) extends Clause

  /** WITH pipeline stage: projection (+ implicit grouping when
    * aggregates appear), post-WHERE (HAVING), order/skip/limit.
    */
  case class WithClause(
      distinct: Boolean,
      items: Seq[ReturnItem],
      where: Option[Expr],
      orderBy: Seq[(Expr, Boolean)],
      skip: Option[Expr], // integer Lit or Param (`SKIP \$n`)
      limit: Option[Expr]) extends Clause

  case class UnwindClause(expr: Expr, alias: String) extends Clause
  /** `LOAD CSV [WITH HEADERS] FROM url AS row [FIELDTERMINATOR ';']`
    * — the Neo4j bulk-ingest clause, mapped onto a Spark csv scan.
    * With headers the row binds as a map<string,string> (`row.name`);
    * without, as an array<string> (`row[0]`). Values are all strings,
    * matching Neo4j (no schema inference).
    */
  case class LoadCsvClause(withHeaders: Boolean, url: Expr, alias: String,
      sep: Option[String]) extends Clause

  /** `CALL { [WITH imports] <read query> }` — a subquery evaluated per
    * outer row. Uncorrelated (no imports): the inner result cross-joins
    * every outer row (UNION inside is allowed). Correlated: imported
    * node variables correlate by gid; inner aggregation scopes per
    * invocation, and inner ORDER BY/SKIP/LIMIT apply PER invocation
    * (lowered as a window over the correlation key). Read-only.
    */
  /** `CALL { … }` subquery; `txRows` is set for the
    * `IN TRANSACTIONS [OF n ROWS]` form (outer None = plain CALL,
    * Some(None) = default batch size, Some(Some(e)) = OF e ROWS)
    */
  case class CallSub(imports: Seq[String], inner: Query,
      txRows: Option[Option[Expr]] = None,
      optional: Boolean = false) extends Clause

  /** `CALL db.labels() YIELD label [AS l]` — the introspection
    * procedures (db.labels / db.relationshipTypes / db.propertyKeys);
    * each yields one column whose rows cross-product with the
    * incoming binding table like Neo4j's procedure CALL
    */
  case class CallProc(name: String,
      yields: Seq[(String, Option[String])],
      where: Option[Expr] = None,
      args: Seq[Expr] = Nil) extends Clause

  case class ReturnItem(expr: Expr, alias: Option[String]) {
    def name: String = alias.getOrElse(Render.expr(expr))
  }

  /** Write clauses — the statement forms the reference's generated
    * templates and cleanup queries use (/root/reference/neo4j.go:95-127,
    * layer_test.go:275-281). Writes may interleave with reading clauses
    * (the UpdateNode template is `MERGE … WITH … OPTIONAL MATCH …
    * DELETE r … SET …`); all effects of one statement commit atomically
    * at the end (the reference's single Bolt transaction).
    */
  sealed trait WriteClauseT extends Clause

  /** `[DETACH] DELETE var, …`: `detach` cascades incident edges; plain
    * DELETE on a still-connected node is a runtime error (Neo4j
    * semantics).
    */
  case class DeleteClause(detach: Boolean, targets: Seq[String])
      extends WriteClauseT

  /** one SET/REMOVE item */
  sealed trait SetItem
  /** `SET v.prop = expr` (the template's `SET r.source = item.source`
    * shape, neo4j.go:122); a NULL value removes the property.
    */
  case class SetProp(variable: String, prop: String, value: Expr)
      extends SetItem
  /** `SET v = expr`: full property replacement — the template's
    * `SET n = item` (neo4j.go:108). The map's `gid` key must equal the
    * node key; its `source` key maps to the source column; the rest
    * becomes the (fully replaced) props map.
    */
  case class SetAll(variable: String, value: Expr) extends SetItem
  /** `SET v += map`: partial update — overlay the map's entries onto
    * the existing props (null-valued entries remove the key, other
    * props survive). Model keys (`gid`, `source`, `label`) in the map
    * are ignored: `+=` patches properties only.
    */
  case class SetPlus(variable: String, value: Expr) extends SetItem
  /** `SET v:Label` — the template's `SET n:%s` (neo4j.go:107). */
  case class SetLabelItem(variable: String, label: String,
      dynLabel: Option[Expr] = None) extends SetItem
  /** `REMOVE v:Label` — clears the label when it matches (the node
    * becomes an unlabeled stub; this engine's single-label model).
    */
  case class RemoveLabelItem(variable: String, label: String,
      dynLabel: Option[Expr] = None) extends SetItem

  case class SetClause(items: Seq[SetItem]) extends WriteClauseT

  /** `FOREACH (x IN list | write clauses…)` — runs the writes once per
    * list element (per binding row); an empty/null list writes
    * nothing, which makes `FOREACH (_ IN CASE WHEN p THEN [1] ELSE []
    * END | …)` the standard conditional-write idiom. Does not change
    * the cardinality or bindings of the surrounding statement.
    */
  case class ForeachClause(variable: String, list: Expr,
      clauses: Seq[Clause]) extends WriteClauseT

  /** `CREATE pattern, …` / `MERGE pattern`: new nodes carry their gid
    * as a property (the engine's node key — literal or expression);
    * `merge` = match-or-create instead of error-on-existing
    * (neo4j.go:103,111). `onCreate`/`onMatch` hold the MERGE
    * sub-clauses `ON CREATE SET …` / `ON MATCH SET …` — applied only
    * to the rows the merge created / matched respectively.
    */
  case class CreateClause(patterns: Seq[PathPattern], merge: Boolean,
      onCreate: Seq[SetItem] = Nil, onMatch: Seq[SetItem] = Nil)
      extends WriteClauseT

  /** `unions` chains further queries combined with UNION [ALL] —
    * (all?, query) pairs in source order; parts may not mix ALL and
    * non-ALL, and every part must RETURN the same column names. The
    * final part's ORDER BY / SKIP / LIMIT scope to the whole union.
    */
  case class Query(
      clauses: Seq[Clause],
      distinct: Boolean,
      items: Seq[ReturnItem],
      orderBy: Seq[(Expr, Boolean)],
      skip: Option[Expr], // integer Lit or Param (`LIMIT \$n`)
      limit: Option[Expr],
      unions: Seq[(Boolean, Query)] = Nil)

  /** default output names for un-aliased return items */
  object Render {
    def expr(e: Expr): String = e match {
      case Lit(v: String) => s"'$v'"
      case Lit(v) => String.valueOf(v)
      case VarRef(n) => n
      case PropRef(v, p) => s"$v.$p"
      case Cmp(op, l, r) => s"${expr(l)} $op ${expr(r)}"
      case And(l, r) => s"${expr(l)} AND ${expr(r)}"
      case Or(l, r) => s"${expr(l)} OR ${expr(r)}"
      case Not(x) => s"NOT ${expr(x)}"
      case IsNull(x, neg) =>
        s"${expr(x)} IS ${if (neg) "NOT " else ""}NULL"
      case FuncCall(n, args, d) =>
        s"$n(${if (d) "DISTINCT " else ""}${args.map(expr).mkString(", ")})"
      case MapLit(es) =>
        es.map { case (k, v) => s"$k: ${expr(v)}" }.mkString("{", ", ", "}")
      case ListLit(es) => es.map(expr).mkString("[", ", ", "]")
      case Param(n) => s"$$$n"
      case Star => "*"
      case Arith(op, l, r) => s"${expr(l)} $op ${expr(r)}"
      case Subscript(c, i) => s"${expr(c)}[${expr(i)}]"
      case other => other.toString // alias these in practice
    }
  }
}

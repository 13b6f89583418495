package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.store.GraphStore

/** Lowers [[Ast.Query]] onto DataFrame plans over a [[GraphStore]]:
  * node patterns become filtered scans of the node table, hops become
  * equi-joins through the edge table (left-outer for OPTIONAL MATCH —
  * C3), RETURN becomes projection/aggregation (COLLECT → collect_list,
  * with Cypher's null-entry semantics — C4), ORDER/SKIP/LIMIT become
  * sort + offset + limit.
  *
  * Catalyst owns physical planning: label/property predicates push to
  * the parquet scan, the batch-sized pattern side broadcasts, AQE
  * handles skewed expansion.
  *
  * Documented simplifications (evidenced subset only):
  *  - a bare relationship variable renders as its type string;
  *  - property values surface as canonical strings unless wrapped in
  *    toString/toInteger/toFloat/toBoolean;
  *  - WHERE on an OPTIONAL MATCH applies after the join.
  */
class Planner(store: GraphStore) {
  import Ast._

  case class PlanError(msg: String) extends RuntimeException(msg)

  private sealed trait VarKind
  private case object NodeVar extends VarKind
  private case object RelVar extends VarKind

  private var anon = 0
  private def fresh(prefix: String): String = { anon += 1; s"__$prefix$anon" }

  def plan(q: Query): DataFrame = {
    var env = Map.empty[String, VarKind]
    var df: DataFrame = null

    def nodeDf(v: String, n: NodePattern): DataFrame = {
      var d = store.nodes.select(
        col("gid").as(s"${v}__gid"), col("label").as(s"${v}__label"),
        col("source").as(s"${v}__source"), col("props").as(s"${v}__props"))
      n.label.foreach(l => d = d.filter(col(s"${v}__label") === l))
      n.props.foreach { case (k, Lit(value)) =>
        d = d.filter(propCmp(s"${v}__props", k, value))
      }
      d
    }

    def propCmp(propsCol: String, key: String, value: Any): Column = {
      val pv = col(propsCol).getItem(key)
      value match {
        case s: String => pv.getField("s") === s
        case l: Long => coalesce(pv.getField("l").cast("double"),
          pv.getField("d")) === l.toDouble
        case d: Double => coalesce(pv.getField("l").cast("double"),
          pv.getField("d")) === d
        case b: Boolean => pv.getField("b") === b
        case null => pv.isNull
        case other => throw PlanError(s"unsupported literal: $other")
      }
    }

    // bind pattern clauses
    q.matches.foreach { m =>
      val joinType = if (m.optional) "left_outer" else "inner"
      val headVar = m.pattern.head.variable.getOrElse(fresh("n"))
      if (!env.contains(headVar)) {
        val d = nodeDf(headVar, m.pattern.head)
        env += headVar -> NodeVar
        df = if (df == null) d else df.crossJoin(d)
      } else if (m.pattern.head.label.nonEmpty ||
          m.pattern.head.props.nonEmpty) {
        m.pattern.head.label.foreach(l =>
          df = df.filter(col(s"${headVar}__label") === l))
        m.pattern.head.props.foreach { case (k, Lit(v)) =>
          df = df.filter(propCmp(s"${headVar}__props", k, v))
        }
      }
      var boundVar = headVar
      m.pattern.hops.foreach { case (rel, node) =>
        val rv = rel.variable.getOrElse(fresh("r"))
        if (env.contains(rv)) throw PlanError(s"rel var $rv already bound")
        env += rv -> RelVar
        var e = store.edges.select(
          col("src").as(s"${rv}__src"), col("dst").as(s"${rv}__dst"),
          col("relType").as(s"${rv}__relType"),
          col("source").as(s"${rv}__source"))
        rel.relType.foreach(t => e = e.filter(col(s"${rv}__relType") === t))
        val (fromCol, toCol) =
          if (rel.direction > 0) (s"${rv}__src", s"${rv}__dst")
          else (s"${rv}__dst", s"${rv}__src")
        df = df.join(e, col(s"${boundVar}__gid") === col(fromCol), joinType)
        val nv = node.variable.getOrElse(fresh("n"))
        if (env.contains(nv)) {
          // closing a cycle onto an already-bound node variable
          df = df.filter(col(toCol).isNull ||
            col(toCol) === col(s"${nv}__gid"))
        } else {
          env += nv -> NodeVar
          val d = nodeDf(nv, node)
          df = df.join(d, col(toCol) === col(s"${nv}__gid"), joinType)
        }
        boundVar = nv
      }
      m.where.foreach(w => df = df.filter(toPredicate(w, env)))
    }

    // RETURN
    val hasAgg = q.items.exists(i => containsAgg(i.expr))
    var out: DataFrame =
      if (!hasAgg) {
        df.select(q.items.map(i => itemCol(i, env)): _*)
      } else {
        val keyItems = q.items.filter(i => !containsAgg(i.expr))
        val aggItems = q.items.filter(i => containsAgg(i.expr))
        // node-variable keys group by gid (unique) + scalar cols;
        // the props map rides through first()
        val groupCols = keyItems.flatMap(i => groupingCols(i.expr, env))
        val aggCols = aggItems.map(i => aggCol(i.expr, env).as(i.name)) ++
          keyItems.flatMap(i => reassembleAfterGroup(i, env))
        val grouped =
          if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
          else df.groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)
        grouped.select(q.items.map(i => col(quote(i.name))): _*)
      }
    if (q.distinct) out = out.distinct()

    if (q.orderBy.nonEmpty) {
      val sorts = q.orderBy.map { case (e, asc) =>
        val c = resolveOrderCol(e, q.items, env)
        if (asc) c.asc else c.desc
      }
      out = out.orderBy(sorts: _*)
    }
    q.skip.foreach(n => out = out.offset(n.toInt))
    q.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  private def quote(name: String): String = s"`$name`"

  private def resolveOrderCol(e: Ast.Expr, items: Seq[Ast.ReturnItem],
      env: Map[String, VarKind]): Column = {
    val item = items.find(i => i.expr == e || i.alias.contains(Ast.Render.expr(e)))
      .orElse(e match {
        case Ast.VarRef(n) => items.find(_.name == n)
        case _ => None
      })
    val c = item.map(i => col(quote(i.name))).getOrElse(valueCol(e, env))
    e match {
      // a node value is a struct holding a map — not orderable; Cypher
      // node ordering is by identity, so sort on gid
      case Ast.VarRef(n) if env.get(n).contains(NodeVar) => c.getField("gid")
      case _ => c
    }
  }

  private def containsAgg(e: Ast.Expr): Boolean = e match {
    case Ast.FuncCall(n, args, _) =>
      Set("collect", "count", "sum", "avg", "min", "max").contains(n) ||
        args.exists(containsAgg)
    case Ast.MapLit(es) => es.exists(x => containsAgg(x._2))
    case Ast.Cmp(_, l, r) => containsAgg(l) || containsAgg(r)
    case Ast.And(l, r) => containsAgg(l) || containsAgg(r)
    case Ast.Or(l, r) => containsAgg(l) || containsAgg(r)
    case Ast.Not(x) => containsAgg(x)
    case _ => false
  }

  /** grouping columns for a key item */
  private def groupingCols(e: Ast.Expr, env: Map[String, VarKind]): Seq[Column] =
    e match {
      case Ast.VarRef(n) if env.get(n).contains(NodeVar) =>
        Seq(col(s"${n}__gid"), col(s"${n}__label"), col(s"${n}__source"))
      case other => Seq(valueCol(other, env).as(Ast.Render.expr(other)))
    }

  /** rebuild a key item's output column after groupBy */
  private def reassembleAfterGroup(i: Ast.ReturnItem,
      env: Map[String, VarKind]): Seq[Column] = i.expr match {
    case Ast.VarRef(n) if env.get(n).contains(NodeVar) =>
      Seq(struct(
        col(s"${n}__gid").as("gid"), col(s"${n}__label").as("label"),
        col(s"${n}__source").as("source"),
        first(col(s"${n}__props")).as("props")).as(i.name))
    case other =>
      Seq(first(valueCol(other, env)).as(i.name))
  }

  private def itemCol(i: Ast.ReturnItem, env: Map[String, VarKind]): Column =
    valueCol(i.expr, env).as(i.name)

  private def aggCol(e: Ast.Expr, env: Map[String, VarKind]): Column = e match {
    case Ast.FuncCall("count", Seq(Ast.Star), _) => count(lit(1))
    case Ast.FuncCall("count", Seq(a), true) => countDistinct(valueCol(a, env))
    case Ast.FuncCall("count", Seq(a), false) => count(valueCol(a, env))
    case Ast.FuncCall("collect", Seq(a), distinct) =>
      val c = valueCol(a, env)
      if (distinct) sort_array(collect_set(c)) else sort_array(collect_list(c))
    case Ast.FuncCall("sum", Seq(a), _) => sum(numCol(a, env))
    case Ast.FuncCall("avg", Seq(a), _) => avg(numCol(a, env))
    case Ast.FuncCall("min", Seq(a), _) => min(valueCol(a, env))
    case Ast.FuncCall("max", Seq(a), _) => max(valueCol(a, env))
    case other => throw PlanError(s"unsupported aggregate: $other")
  }

  /** numeric view of an expression (PV: long else double slot) */
  private def numCol(e: Ast.Expr, env: Map[String, VarKind]): Column = e match {
    case Ast.PropRef(v, p) if env.get(v).contains(NodeVar) =>
      val pv = col(s"${v}__props").getItem(p)
      coalesce(pv.getField("l").cast("double"), pv.getField("d"))
    case other => valueCol(other, env).cast("double")
  }

  /** value of an expression in projection context */
  private def valueCol(e: Ast.Expr, env: Map[String, VarKind]): Column =
    e match {
      case Ast.Lit(null) => lit(null)
      case Ast.Lit(v) => lit(v)
      case Ast.Star => throw PlanError("* outside count()")
      case Ast.VarRef(n) => env.get(n) match {
        case Some(NodeVar) => struct(
          col(s"${n}__gid").as("gid"), col(s"${n}__label").as("label"),
          col(s"${n}__source").as("source"), col(s"${n}__props").as("props"))
        case Some(RelVar) => col(s"${n}__relType")
        case None => throw PlanError(s"unbound variable: $n")
      }
      case Ast.PropRef(v, p) => env.get(v) match {
        case Some(NodeVar) => p match {
          case "gid" => col(s"${v}__gid")
          case "label" => col(s"${v}__label")
          case "source" => col(s"${v}__source")
          case _ =>
            val pv = col(s"${v}__props").getItem(p)
            coalesce(pv.getField("s"),
              pv.getField("l").cast("string"),
              pv.getField("d").cast("string"),
              pv.getField("b").cast("string"))
        }
        case Some(RelVar) => p match {
          case "type" | "relType" => col(s"${v}__relType")
          case "source" => col(s"${v}__source")
          case other => throw PlanError(s"unknown rel property: $other")
        }
        case None => throw PlanError(s"unbound variable: $v")
      }
      case Ast.MapLit(entries) =>
        struct(entries.map { case (k, ex) => valueCol(ex, env).as(k) }: _*)
      case Ast.FuncCall("tostring", Seq(a), _) => typedProp(a, env, "s")
        .getOrElse(valueCol(a, env).cast("string"))
      case Ast.FuncCall("tointeger", Seq(a), _) => typedProp(a, env, "l")
        .getOrElse(valueCol(a, env).cast("long"))
      case Ast.FuncCall("tofloat", Seq(a), _) => typedProp(a, env, "d")
        .getOrElse(valueCol(a, env).cast("double"))
      case Ast.FuncCall("toboolean", Seq(a), _) => typedProp(a, env, "b")
        .getOrElse(valueCol(a, env).cast("boolean"))
      case Ast.FuncCall("id", Seq(Ast.VarRef(n)), _) => col(s"${n}__gid")
      case Ast.FuncCall("type", Seq(Ast.VarRef(n)), _)
          if env.get(n).contains(RelVar) => col(s"${n}__relType")
      case Ast.FuncCall("labels", Seq(Ast.VarRef(n)), _) =>
        array(col(s"${n}__label"))
      case c: Ast.Cmp => toPredicate(c, env)
      case a: Ast.And => toPredicate(a, env)
      case o: Ast.Or => toPredicate(o, env)
      case n: Ast.Not => toPredicate(n, env)
      case i: Ast.IsNull => toPredicate(i, env)
      case other => throw PlanError(s"unsupported expression: $other")
    }

  /** typed slot extraction when the arg is a node property */
  private def typedProp(e: Ast.Expr, env: Map[String, VarKind],
      slot: String): Option[Column] = e match {
    case Ast.PropRef(v, p) if env.get(v).contains(NodeVar) &&
        !Set("gid", "label", "source").contains(p) =>
      val pv = col(s"${v}__props").getItem(p)
      slot match {
        case "s" => Some(coalesce(pv.getField("s"),
          pv.getField("l").cast("string"), pv.getField("d").cast("string"),
          pv.getField("b").cast("string")))
        case "l" => Some(coalesce(pv.getField("l"),
          pv.getField("d").cast("long"), pv.getField("s").cast("long")))
        case "d" => Some(coalesce(pv.getField("d"),
          pv.getField("l").cast("double"), pv.getField("s").cast("double")))
        case "b" => Some(coalesce(pv.getField("b"),
          pv.getField("s").cast("boolean")))
      }
    case _ => None
  }

  private def toPredicate(e: Ast.Expr, env: Map[String, VarKind]): Column =
    e match {
      case Ast.And(l, r) => toPredicate(l, env) && toPredicate(r, env)
      case Ast.Or(l, r) => toPredicate(l, env) || toPredicate(r, env)
      case Ast.Not(x) => !toPredicate(x, env)
      case Ast.IsNull(x, negated) =>
        val c = valueCol(x, env)
        if (negated) c.isNotNull else c.isNull
      case Ast.Cmp(op, l, r) =>
        val (lc, rc) = cmpSides(l, r, env)
        op match {
          case "=" => lc === rc
          case "<>" => lc =!= rc
          case "<" => lc < rc
          case ">" => lc > rc
          case "<=" => lc <= rc
          case ">=" => lc >= rc
        }
      case other => valueCol(other, env).cast("boolean")
    }

  /** type-aware comparison: a node-property side takes the slot
    * implied by the literal side.
    */
  private def cmpSides(l: Ast.Expr, r: Ast.Expr,
      env: Map[String, VarKind]): (Column, Column) = (l, r) match {
    case (p: Ast.PropRef, Ast.Lit(v)) =>
      (typedSide(p, v, env), lit(v))
    case (Ast.Lit(v), p: Ast.PropRef) =>
      (lit(v), typedSide(p, v, env))
    case _ => (valueCol(l, env), valueCol(r, env))
  }

  private def typedSide(p: Ast.PropRef, litVal: Any,
      env: Map[String, VarKind]): Column = litVal match {
    case _: String => typedProp(p, env, "s").getOrElse(valueCol(p, env))
    case _: Long | _: Double =>
      typedProp(p, env, "d").getOrElse(valueCol(p, env).cast("double"))
    case _: Boolean => typedProp(p, env, "b").getOrElse(valueCol(p, env))
    case _ => valueCol(p, env)
  }
}

/** Facade: the D1 `Query(query string)` contract, made real. */
object CypherEngine {
  def query(store: GraphStore, cypher: String): DataFrame =
    new Planner(store).plan(Parser.parse(cypher))
}

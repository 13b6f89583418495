package graft.cypher

import scala.util.matching.Regex

/** Hand-rolled tokenizer + recursive-descent parser for the subset
  * grammar in [[Ast]]. Keywords are case-insensitive; identifiers may
  * be bare or backquoted; strings use single or double quotes.
  */
object Parser {

  case class ParseException(msg: String) extends RuntimeException(msg)

  // ---- lexer ----
  sealed trait Tok
  /** uppercased keyword token; `raw` keeps the source spelling so a
    * keyword-named label/property/relType (`:Order`, `n.count`) is not
    * case-mangled. The curried param stays out of equality/unapply, so
    * `Kw("MATCH")` patterns keep working.
    */
  case class Kw(s: String)(val raw: String) extends Tok
  case class Ident(s: String) extends Tok
  case class StrLit(s: String) extends Tok
  case class NumLit(v: Any) extends Tok
  case class Sym(s: String) extends Tok
  case class ParamTok(name: String) extends Tok

  private val keywords = Set("MATCH", "OPTIONAL", "WHERE", "RETURN",
    "ORDER", "BY", "ASC", "DESC", "LIMIT", "SKIP", "AND", "OR", "NOT",
    "AS", "DISTINCT", "IS", "NULL", "TRUE", "FALSE", "COLLECT", "COUNT",
    "SUM", "AVG", "MIN", "MAX", "WITH", "UNWIND", "DELETE", "DETACH",
    "SET", "CREATE", "MERGE", "REMOVE", "ON", "CALL", "FOREACH",
    "IN", "STARTS", "ENDS", "CONTAINS", "CASE", "WHEN", "THEN", "ELSE",
    "END", "UNION", "ALL", "XOR")

  private val tokenRe: Regex =
    """\s*(?:(<=|>=|<>|<-|->|=~|\+=|\|\||\.\.|[-()\[\]{}:,.*=<>+/%^|&!])|`([^`]*)`|'((?:[^'\\]|\\.)*)'|"((?:[^"\\]|\\.)*)"|(0[xX][0-9a-fA-F]+)|(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)|(\d+)|\$([A-Za-z_][A-Za-z0-9_]*)|([A-Za-z_][A-Za-z0-9_]*)|(\$))""".r

  /** Cypher string-escape decoding: \t \b \n \r \f \' \" \\ \uXXXX. */
  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b += '\t'; i += 2
          case 'b' => b += '\b'; i += 2
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 'f' => b += '\f'; i += 2
          case 'u' if i + 5 < s.length =>
            val hex = s.substring(i + 2, i + 6)
            b += (try Integer.parseInt(hex, 16).toChar
              catch { case _: NumberFormatException => throw ParseException(
                s"invalid unicode escape \\u$hex") })
            i += 6
          case other => b += other; i += 2 // \' \" \\ and unknown → literal
        }
      } else { b += c; i += 1 }
    }
    b.result()
  }

  /** Skips whitespace and Cypher comments — `//` to end of line and
    * block comments (slash-star … star-slash) — outside string and
    * backquote literals: callers invoke this between tokens.
    */
  private def skipTrivia(q: String, from: Int): Int = {
    var pos = from
    var moved = true
    while (moved) {
      moved = false
      while (pos < q.length && q.charAt(pos).isWhitespace) { pos += 1; moved = true }
      if (pos + 1 < q.length && q.charAt(pos) == '/' && q.charAt(pos + 1) == '/') {
        while (pos < q.length && q.charAt(pos) != '\n') pos += 1
        moved = true
      } else if (pos + 1 < q.length && q.charAt(pos) == '/' && q.charAt(pos + 1) == '*') {
        val end = q.indexOf("*/", pos + 2)
        if (end < 0) throw ParseException("unterminated /* comment")
        pos = end + 2
        moved = true
      }
    }
    pos
  }

  def tokenize(q: String): List[Tok] = {
    var pos = 0
    val out = List.newBuilder[Tok]
    while ({ pos = skipTrivia(q, pos); pos < q.length }) {
      tokenRe.findPrefixMatchOf(q.substring(pos)) match {
        case Some(m) if m.end > 0 =>
          pos += m.end
          if (m.group(1) != null) out += Sym(m.group(1))
          else if (m.group(2) != null) out += Ident(m.group(2))
          else if (m.group(3) != null) out += StrLit(unescape(m.group(3)))
          else if (m.group(4) != null) out += StrLit(unescape(m.group(4)))
          else if (m.group(5) != null)
            out += NumLit(
              try java.lang.Long.parseLong(m.group(5).drop(2), 16)
              catch { case _: NumberFormatException => throw ParseException(
                s"integer literal out of range: ${m.group(5)}") })
          else if (m.group(6) != null) out += NumLit(m.group(6).toDouble)
          else if (m.group(7) != null) out += NumLit(
            try m.group(7).toLong
            catch { case _: NumberFormatException => throw ParseException(
              s"integer literal out of range: ${m.group(7)}") })
          else if (m.group(8) != null) out += ParamTok(m.group(8))
          else if (m.group(9) != null) {
            val w = m.group(9)
            if (keywords.contains(w.toUpperCase)) out += Kw(w.toUpperCase)(w)
            else out += Ident(w)
          }
          // a bare `$` (not a parameter): the Cypher 25 dynamic
          // label/type marker `$(expr)`
          else out += Sym("$")
        case _ =>
          if (q.substring(pos).trim.isEmpty) pos = q.length
          else throw ParseException(
            s"unexpected input at: ${q.substring(pos).take(30)}")
      }
    }
    out.result()
  }

  // ---- parser state ----
  private class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = {
      val t = toks.headOption.getOrElse(
        throw ParseException("unexpected end of query"))
      toks = toks.tail
      t
    }
    def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case other => throw ParseException(s"expected '$s', got $other")
    }
    def expectKw(s: String): Unit = next() match {
      case Kw(`s`) => ()
      case other => throw ParseException(s"expected $s, got $other")
    }
    def tryKw(s: String): Boolean = peek match {
      case Some(Kw(`s`)) => next(); true
      case _ => false
    }
    def trySym(s: String): Boolean = peek match {
      case Some(Sym(`s`)) => next(); true
      case _ => false
    }
    def identOrKw(): String = next() match {
      case Ident(s) => s
      // keyword-named labels/props/relTypes keep their SOURCE spelling
      // (`:Order` must filter label 'Order', not 'order'/'ORDER')
      case k: Kw => k.raw
      case other => throw ParseException(s"expected identifier, got $other")
    }
  }

  def parse(query: String): Ast.Query = {
    val p = new P(tokenize(query))
    val first = parseQuery(p)
    val unions = Seq.newBuilder[(Boolean, Ast.Query)]
    var allMode: Option[Boolean] = None
    var prev = first
    while (p.tryKw("UNION")) {
      val all = p.tryKw("ALL")
      if (allMode.exists(_ != all))
        throw ParseException("cannot mix UNION and UNION ALL")
      allMode = Some(all)
      if (first.items.isEmpty)
        throw ParseException("UNION requires RETURN in every part")
      // Neo4j rejects ORDER BY/SKIP/LIMIT in non-final union parts
      // (the tail is union-level, not branch-level) — accepting them
      // with branch-local semantics would quietly diverge
      if (prev.orderBy.nonEmpty || prev.skip.nonEmpty || prev.limit.nonEmpty)
        throw ParseException(
          "ORDER BY/SKIP/LIMIT is only allowed in the final UNION part")
      val q = parseQuery(p)
      if (q.items.isEmpty)
        throw ParseException("UNION requires RETURN in every part")
      unions += ((all, q))
      prev = q
    }
    if (p.peek.nonEmpty)
      throw ParseException(s"trailing input: ${p.toks.take(5)}")
    first.copy(unions = unions.result())
  }

  private def parseQuery(p: P, returnOptional: Boolean = false)
      : Ast.Query = {
    val clauses = Seq.newBuilder[Ast.Clause]
    var sawAny = false
    var sawWrite = false
    var done = false
    // CALL — a procedure call or a subquery; `optional` marks
    // Neo4j 5.21's OPTIONAL CALL (zero body rows keep the outer row,
    // nulls for the returned columns)
    def parseCallClause(optional: Boolean): Unit = {
          // `CALL (n, m) { }` / `CALL (*) { }` / `CALL () { }` — the
          // Neo4j 5.23 variable-scope form; the scope list IS the
          // import list (no importing WITH inside)
          var scopeImports: Option[Seq[String]] = None
          if (p.peek.contains(Sym("("))) {
            p.next()
            val vars = Seq.newBuilder[String]
            var star = false
            if (!p.trySym(")")) {
              if (p.trySym("*")) star = true
              else {
                vars += p.identOrKw()
                while (p.trySym(",")) vars += p.identOrKw()
              }
              p.expectSym(")")
            }
            scopeImports = Some(if (star) Seq("*") else vars.result())
            if (!p.peek.contains(Sym("{")))
              throw ParseException("CALL (scope) needs a { subquery }")
          }
          if (!p.trySym("{")) {
            // procedure call: CALL db.labels() [YIELD col [AS alias], …]
            val nameParts = Seq.newBuilder[String]
            nameParts += p.identOrKw()
            while (p.trySym(".")) nameParts += p.identOrKw()
            p.expectSym("(")
            val procArgs = Seq.newBuilder[Ast.Expr]
            if (!p.trySym(")")) {
              procArgs += parseExpr(p)
              while (p.trySym(",")) procArgs += parseExpr(p)
              p.expectSym(")")
            }
            val yields = Seq.newBuilder[(String, Option[String])]
            var procWhere: Option[Ast.Expr] = None
            p.peek match {
              case Some(Ident(y)) if y.equalsIgnoreCase("YIELD") =>
                p.next()
                def one(): Unit = {
                  val n = p.identOrKw()
                  yields += ((n,
                    if (p.tryKw("AS")) Some(p.identOrKw()) else None))
                }
                one()
                while (p.trySym(",")) one()
                if (p.tryKw("WHERE")) procWhere = Some(parseExpr(p))
              case _ => ()
            }
            if (optional) throw ParseException(
              "OPTIONAL CALL supports subqueries only, not procedures")
            sawAny = true
            clauses += Ast.CallProc(nameParts.result().mkString("."),
              yields.result(), procWhere, procArgs.result())
          } else {
          // optional importing WITH of bare variable names — repeated
          // per UNION part (Neo4j requires each part to re-import)
          val imports = Seq.newBuilder[String]
          def parseImports(): Unit =
            // the scope form supplies the imports; a leading WITH in
            // the body stays an ordinary clause
            if (scopeImports.nonEmpty) ()
            else if (p.peek.contains(Kw("WITH")("WITH"))) {
              p.next()
              def one(): Unit = p.next() match {
                case Ident(v) => imports += v
                case other => throw ParseException(
                  s"CALL imports must be bare variable names, got $other")
              }
              one()
              while (p.trySym(",")) one()
            }
          parseImports()
          val inner = parseQuery(p)
          // UNION parts inside a CALL subquery
          val unions = Seq.newBuilder[(Boolean, Ast.Query)]
          var allMode: Option[Boolean] = None
          var prevPart = inner
          while (p.tryKw("UNION")) {
            val all = p.tryKw("ALL")
            if (allMode.exists(_ != all))
              throw ParseException("cannot mix UNION and UNION ALL")
            allMode = Some(all)
            if (prevPart.orderBy.nonEmpty || prevPart.skip.nonEmpty ||
                prevPart.limit.nonEmpty)
              throw ParseException(
                "ORDER BY/SKIP/LIMIT is only allowed in the final UNION part")
            parseImports()
            val part = parseQuery(p)
            unions += ((all, part))
            prevPart = part
          }
          p.expectSym("}")
          // `CALL { … } IN TRANSACTIONS [OF n ROWS]` — batched-commit
          // write subquery (the Neo4j bulk-ingest idiom)
          var txRows: Option[Option[Ast.Expr]] = None
          if (p.peek.contains(Kw("IN")("IN"))) {
            p.next()
            // `IN [n] CONCURRENT TRANSACTIONS` (Neo4j 5.21): accepted
            // — batches run through the SAME per-batch commit loop,
            // serialized, which is a legal schedule of the concurrent
            // form over a single-writer store (README divergences).
            // The concurrency hint parses and is deliberately unused.
            p.peek match {
              case Some(Ident(t)) if t.equalsIgnoreCase("TRANSACTIONS") =>
                ()
              case Some(Ident(t)) if t.equalsIgnoreCase("CONCURRENT") =>
                p.next()
              case _ =>
                parseExpr(p)
                p.peek match {
                  case Some(Ident(t))
                      if t.equalsIgnoreCase("CONCURRENT") => p.next()
                  case other => throw ParseException(
                    "expected CONCURRENT after the concurrency hint, " +
                      s"got $other")
                }
            }
            p.peek match {
              case Some(Ident(t)) if t.equalsIgnoreCase("TRANSACTIONS") =>
                p.next()
              case other => throw ParseException(
                s"expected TRANSACTIONS after IN, got $other")
            }
            txRows = Some(
              if (p.peek.exists {
                case Ident(o) => o.equalsIgnoreCase("OF"); case _ => false
              }) {
                p.next()
                val n = parseExpr(p)
                p.peek match {
                  case Some(Ident(r)) if r.equalsIgnoreCase("ROWS") =>
                    p.next()
                  case other => throw ParseException(
                    s"expected ROWS after the batch size, got $other")
                }
                Some(n)
              } else None)
          }
          if (optional && txRows.nonEmpty) throw ParseException(
            "OPTIONAL CALL cannot be combined with IN TRANSACTIONS")
          sawAny = true
          // the IN TRANSACTIONS form is itself a write statement (its
          // body commits) — a trailing RETURN is optional like any write
          if (txRows.nonEmpty) sawWrite = true
          clauses += Ast.CallSub(
            scopeImports.getOrElse(imports.result().distinct),
            inner.copy(unions = unions.result()), txRows, optional)
          }
    }
    while (!done) {
      p.peek match {
        case Some(Kw("OPTIONAL")) if p.toks.drop(1).headOption
            .contains(Kw("CALL")("CALL")) =>
          p.next(); p.next()
          parseCallClause(optional = true)
        case Some(Kw("MATCH")) | Some(Kw("OPTIONAL")) =>
          val optional = p.tryKw("OPTIONAL")
          p.expectKw("MATCH")
          sawAny = true
          // comma-separated patterns share one MATCH (and its WHERE)
          val pats = Seq.newBuilder[Ast.PathPattern]
          pats += parsePattern(p)
          while (p.trySym(",")) pats += parsePattern(p)
          // Neo4j planner hints — USING INDEX [SEEK] v:L(p,…) /
          // USING SCAN v:L / USING JOIN ON v,… — are advice to a
          // cost-based planner this engine does not have (Catalyst
          // owns physical planning); accept-and-ignore so ported
          // queries run verbatim, validating only the shape
          while (p.peek.exists {
              case Ident(w) => w.equalsIgnoreCase("USING"); case _ => false
            }) {
            p.next()
            p.identOrKw().toUpperCase match {
              case "INDEX" =>
                if (p.peek.exists { case Ident(w) =>
                    w.equalsIgnoreCase("SEEK"); case _ => false }) p.next()
                p.identOrKw(); p.expectSym(":"); p.identOrKw()
                p.expectSym("(")
                p.identOrKw()
                while (p.trySym(",")) p.identOrKw()
                p.expectSym(")")
              case "SCAN" =>
                p.identOrKw(); p.expectSym(":"); p.identOrKw()
              case "JOIN" =>
                if (!p.identOrKw().equalsIgnoreCase("ON"))
                  throw ParseException("USING JOIN expects ON <var>")
                p.identOrKw()
                while (p.trySym(",")) p.identOrKw()
              case other => throw ParseException(
                s"unknown planner hint USING $other")
            }
          }
          val where = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
          val ps = pats.result()
          // inline node predicates fold into the clause WHERE
          val whereAll = (ps.flatMap(inlineWhere) ++ where.toSeq)
            .reduceOption(Ast.And(_, _))
          clauses += Ast.MatchClause(ps, optional, whereAll)
        case Some(Kw("WITH")) =>
          p.next()
          sawAny = true // leading WITH projects one imaginary row
          val distinct = p.tryKw("DISTINCT")
          val items = parseItems(p)
          val (orderBy, skip, limit) = parseTail(p)
          val where = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
          clauses += Ast.WithClause(distinct, items, where, orderBy, skip,
            limit)
        case Some(Kw("UNWIND")) =>
          p.next()
          sawAny = true
          val e = parseExpr(p)
          p.expectKw("AS")
          clauses += Ast.UnwindClause(e, p.identOrKw())
        case Some(Ident(w)) if w.equalsIgnoreCase("LOAD") =>
          // LOAD CSV [WITH HEADERS] FROM url AS row [FIELDTERMINATOR s]
          p.next()
          p.peek match {
            case Some(Ident(c)) if c.equalsIgnoreCase("CSV") => p.next()
            case other => throw ParseException(s"expected CSV, got $other")
          }
          val headers = p.peek.contains(Kw("WITH")("WITH")) && {
            p.next()
            p.peek match {
              case Some(Ident(h)) if h.equalsIgnoreCase("HEADERS") =>
                p.next(); true
              case other => throw ParseException(
                s"expected HEADERS after WITH, got $other")
            }
          }
          p.peek match {
            case Some(Ident(f)) if f.equalsIgnoreCase("FROM") => p.next()
            case other => throw ParseException(s"expected FROM, got $other")
          }
          val url = parseExpr(p)
          p.expectKw("AS")
          val rowVar = p.identOrKw()
          val sep = p.peek match {
            case Some(Ident(ft)) if ft.equalsIgnoreCase("FIELDTERMINATOR") =>
              p.next()
              p.next() match {
                case StrLit(s) => Some(s)
                case other => throw ParseException(
                  s"FIELDTERMINATOR needs a string, got $other")
              }
            case _ => None
          }
          sawAny = true
          clauses += Ast.LoadCsvClause(headers, url, rowVar, sep)
        case Some(Kw("CALL")) =>
          p.next()
          parseCallClause(optional = false)
        case Some(Kw("DETACH")) | Some(Kw("DELETE")) | Some(Kw("SET")) |
            Some(Kw("REMOVE")) | Some(Kw("CREATE")) | Some(Kw("MERGE")) =>
          val c = parseWriteClause(p)
          sawWrite = true
          if (c.isInstanceOf[Ast.CreateClause]) sawAny = true
          clauses += c
        case Some(Kw("FOREACH")) =>
          // FOREACH (x IN list | write clauses…) — per-element writes;
          // an empty list writes nothing (the Neo4j conditional-write
          // idiom: FOREACH (_ IN CASE WHEN p THEN [1] ELSE [] END | …)).
          // Bodies may nest FOREACH (probe 16) — the planner already
          // recurses; parsing does too.
          p.next()
          def parseForeachBody(): Ast.ForeachClause = {
            p.expectSym("(")
            val v = p.identOrKw()
            p.expectKw("IN")
            val listE = parseExpr(p)
            p.expectSym("|")
            val inner = Seq.newBuilder[Ast.Clause]
            var more = true
            while (more) {
              p.peek match {
                case Some(Kw("DETACH")) | Some(Kw("DELETE")) |
                    Some(Kw("SET")) | Some(Kw("REMOVE")) |
                    Some(Kw("CREATE")) | Some(Kw("MERGE")) =>
                  inner += parseWriteClause(p)
                case Some(Kw("FOREACH")) =>
                  p.next(); inner += parseForeachBody()
                case _ => more = false
              }
            }
            val body = inner.result()
            if (body.isEmpty)
              throw ParseException("FOREACH needs at least one write clause")
            p.expectSym(")")
            Ast.ForeachClause(v, listE, body)
          }
          sawAny = true
          sawWrite = true
          clauses += parseForeachBody()
        case _ => done = true
      }
    }
    p.peek match {
      case Some(Kw("RETURN")) =>
        // clause-less `RETURN 1` is a single-row projection
        p.next()
        val distinct = p.tryKw("DISTINCT")
        val items = parseItems(p)
        val (orderBy, skip, limit) = parseTail(p)
        Ast.Query(clauses.result(), distinct, items, orderBy, skip, limit)
      case None | Some(Kw("UNION")) | Some(Sym("}")) =>
        val cs = clauses.result()
        if (sawWrite || returnOptional)
          Ast.Query(cs, distinct = false, Nil, Nil, None, None)
        else if (!sawAny)
          throw ParseException("query must start with MATCH/UNWIND")
        // standalone CALL (Neo4j): a RETURN-less procedure call is only
        // legal when the call IS the whole query — `MATCH (n) CALL
        // db.labels()` without RETURN is an error in Neo4j, so a
        // malformed ported query must not silently project *
        else if (cs.size == 1 && cs.head.isInstanceOf[Ast.CallProc])
          Ast.Query(cs, distinct = false,
            Seq(Ast.ReturnItem(Ast.Star, None)), Nil, None, None)
        else throw ParseException("expected RETURN or a write clause")
      case Some(other) =>
        throw ParseException(s"trailing input: $other")
    }
  }

  /** one write clause: [DETACH] DELETE / SET / REMOVE / CREATE / MERGE
    * (shared by the statement loop and FOREACH bodies) */
  private def parseWriteClause(p: P): Ast.Clause = p.peek match {
    case Some(Kw("DETACH")) | Some(Kw("DELETE")) =>
      // [DETACH] DELETE var, … (/root/reference/layer_test.go:275-281,
      // neo4j.go:95-127); may be followed by further clauses (the
      // UpdateNode template continues with SET after DELETE r)
      val detach = p.tryKw("DETACH")
      p.expectKw("DELETE")
      val targets = Seq.newBuilder[String]
      def one(): Unit = p.next() match {
        case Ident(v) => targets += v
        case other =>
          throw ParseException(s"expected variable to delete, got $other")
      }
      one()
      while (p.trySym(",")) one()
      Ast.DeleteClause(detach, targets.result())
    case Some(Kw("SET")) =>
      p.next()
      Ast.SetClause(parseSetItems(p))
    case Some(Kw("REMOVE")) =>
      // REMOVE v.prop, … — sugar for SET v.prop = null (property
      // drop; the planner routes null-valued patches to `removes`).
      // REMOVE v:Label clears the label (back to an unlabeled stub).
      p.next()
      val items = Seq.newBuilder[Ast.SetItem]
      def one(): Unit = {
        val v = p.next() match {
          case Ident(s) => s
          case other => throw ParseException(s"expected variable, got $other")
        }
        if (p.trySym(":")) items += (tryDynRef(p) match {
          case Some(e) => Ast.RemoveLabelItem(v, "", Some(e))
          case None => Ast.RemoveLabelItem(v, p.identOrKw())
        })
        else {
          p.expectSym(".")
          items += Ast.SetProp(v, p.identOrKw(), Ast.Lit(null))
        }
      }
      one()
      while (p.trySym(",")) one()
      Ast.SetClause(items.result())
    case Some(Kw("CREATE")) | Some(Kw("MERGE")) =>
      val merge = p.peek.exists { case Kw("MERGE") => true; case _ => false }
      p.next()
      val pats = Seq.newBuilder[Ast.PathPattern]
      pats += parsePattern(p)
      while (p.trySym(",")) pats += parsePattern(p)
      val result = pats.result()
      // openCypher rejects path bindings / shortestPath in writes
      if (result.exists(r =>
          r.pathVar.nonEmpty || r.shortest || r.allShortest))
        throw ParseException(
          "path variables and shortestPath are MATCH-only")
      if (result.exists(r => inlineWhere(r).nonEmpty))
        throw ParseException("WHERE inside a write pattern is not allowed")
      // MERGE takes ONE pattern. Multi-hop chains merge PER ELEMENT
      // (each node, then each relationship) — in a gid-keyed store
      // "create the whole pattern fresh" cannot duplicate keyed
      // nodes, so per-element merge IS the coherent whole-pattern
      // semantics here. ON CREATE/ON MATCH stay single-element (the
      // matched flag is per element, not per chain).
      if (merge && result.length != 1)
        throw ParseException("MERGE takes a single pattern")
      if (merge && result.head.hops.length > 1 &&
          p.peek.exists { case Kw("ON") => true; case _ => false })
        throw ParseException(
          "ON CREATE / ON MATCH SET needs a single-element MERGE")
      // MERGE sub-clauses: ON CREATE SET … / ON MATCH SET …
      var onCreate = Seq.empty[Ast.SetItem]
      var onMatch = Seq.empty[Ast.SetItem]
      while (merge && p.tryKw("ON")) {
        if (p.tryKw("CREATE")) {
          p.expectKw("SET"); onCreate ++= parseSetItems(p)
        } else {
          p.expectKw("MATCH"); p.expectKw("SET")
          onMatch ++= parseSetItems(p)
        }
      }
      Ast.CreateClause(result, merge, onCreate, onMatch)
    case other => throw ParseException(s"expected a write clause, got $other")
  }

  /** SET items: `v.prop = expr` | `v = expr` (full-map replacement,
    * the template's `SET n = item`, neo4j.go:108) | `v += map`
    * (partial update / merge overlay) | `v:Label` (the template's
    * `SET n:%s`, neo4j.go:107). Values are full expressions —
    * `SET n.cnt = n.cnt + 1` is bread-and-butter Cypher.
    */
  private def parseSetItems(p: P): Seq[Ast.SetItem] = {
    val items = Seq.newBuilder[Ast.SetItem]
    def one(): Unit = {
      val v = p.next() match {
        case Ident(s) => s
        case other => throw ParseException(s"expected variable, got $other")
      }
      p.peek match {
        case Some(Sym(".")) =>
          p.next()
          val prop = p.identOrKw()
          p.expectSym("=")
          items += Ast.SetProp(v, prop, parseExpr(p))
        case Some(Sym(":")) =>
          // `SET n:L1:L2` adds every label in the chain
          while (p.trySym(":")) items += (tryDynRef(p) match {
            case Some(e) => Ast.SetLabelItem(v, "", Some(e))
            case None => Ast.SetLabelItem(v, p.identOrKw())
          })
        case Some(Sym("=")) =>
          p.next()
          items += Ast.SetAll(v, parseExpr(p))
        case Some(Sym("+=")) =>
          p.next()
          items += Ast.SetPlus(v, parseExpr(p))
        case other =>
          throw ParseException(
            s"expected '.', ':', '=' or '+=' in SET, got $other")
      }
    }
    one()
    while (p.trySym(",")) one()
    items.result()
  }

  private def parseItems(p: P): Seq[Ast.ReturnItem] = {
    val items = Seq.newBuilder[Ast.ReturnItem]
    // `RETURN *` / `WITH *` — all bound variables (may be followed by
    // further explicit items: `RETURN *, count`)
    def one(): Unit =
      if (p.trySym("*")) items += Ast.ReturnItem(Ast.Star, None)
      else items += parseReturnItem(p)
    one()
    while (p.trySym(",")) one()
    items.result()
  }

  private def parseTail(p: P)
      : (Seq[(Ast.Expr, Boolean)], Option[Ast.Expr], Option[Ast.Expr]) = {
    val orderBy = Seq.newBuilder[(Ast.Expr, Boolean)]
    if (p.tryKw("ORDER")) {
      p.expectKw("BY")
      def one(): Unit = {
        val e = parseExpr(p)
        val asc = if (p.tryKw("DESC")) false else { p.tryKw("ASC"); true }
        orderBy += ((e, asc))
      }
      one()
      while (p.trySym(",")) one()
    }
    // OFFSET is the Cypher-25 alias of SKIP
    val isOffset = p.peek match {
      case Some(Ident(s)) if s.equalsIgnoreCase("OFFSET") => p.next(); true
      case _ => false
    }
    val skip =
      if (isOffset || p.tryKw("SKIP")) Some(parseBound(p)) else None
    val limit = if (p.tryKw("LIMIT")) Some(parseBound(p)) else None
    (orderBy.result(), skip, limit)
  }

  /** SKIP/LIMIT operand: any constant integer expression (Neo4j
    * allows `LIMIT 1 + 1`) — the planner folds it (boundVal) and
    * rejects non-constant / non-integer forms there
    */
  private def parseBound(p: P): Ast.Expr = parseAddSub(p)

  /** `{ [MATCH] pattern [WHERE expr] }` — the EXISTS/COUNT subquery
    * body. Falls back to a FULL regular query body (Neo4j 5:
    * `EXISTS { MATCH … WITH … MATCH … }`) when the classic
    * single-pattern form doesn't parse to the closing brace.
    */
  private def parseSubqueryBody(p: P)
      : (Ast.PathPattern, Option[Ast.Expr], Option[Ast.Query]) = {
    p.expectSym("{")
    val saved = p.toks
    try {
      p.tryKw("MATCH")
      val pat = parsePattern(p)
      val whereE = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
      p.expectSym("}")
      (pat, (inlineWhere(pat).toSeq ++ whereE.toSeq)
        .reduceOption(Ast.And(_, _)), None)
    } catch {
      case _: ParseException =>
        p.toks = saved
        // RETURN is optional in these bodies (`EXISTS { MATCH … WITH
        // … MATCH … }` — the row count is the semantics)
        val q = parseQuery(p, returnOptional = true)
        p.expectSym("}")
        (Ast.PathPattern(Ast.NodePattern(None, None, Nil), Nil),
          None, Some(q))
    }
  }

  /** quantified predicate body: `(x IN list WHERE pred)` */
  private def parseQuant(p: P, fn: String): Ast.Expr = {
    p.expectSym("(")
    val v = p.identOrKw()
    p.expectKw("IN")
    val listE = parseExpr(p)
    p.expectKw("WHERE")
    val pred = parseExpr(p)
    p.expectSym(")")
    Ast.Quant(fn, v, listE, pred)
  }

  private def parseReturnItem(p: P): Ast.ReturnItem = {
    val e = parseExpr(p)
    val alias = if (p.tryKw("AS")) Some(p.identOrKw()) else None
    Ast.ReturnItem(e, alias)
  }

  // pattern := node ( rel node )*
  private def parsePattern(p: P): Ast.PathPattern = {
    // optional `p = ` path binding and `shortestPath( … )` wrapper
    val pathVar = (p.toks.headOption, p.toks.drop(1).headOption) match {
      case (Some(Ident(v)), Some(Sym("="))) =>
        p.next(); p.next(); Some(v)
      case _ => None
    }
    val (shortest, allShortest) = p.toks.headOption match {
      case Some(Ident(f)) if f.equalsIgnoreCase("shortestPath") =>
        p.next(); p.expectSym("("); (true, false)
      case Some(Ident(f)) if f.equalsIgnoreCase("allShortestPaths") =>
        p.next(); p.expectSym("("); (false, true)
      case _ => (false, false)
    }
    val head = parseNode(p)
    val hops = Seq.newBuilder[(Ast.RelPattern, Ast.NodePattern)]
    var continue = true
    while (continue) {
      p.peek match {
        case Some(Sym("-")) | Some(Sym("<-")) =>
          val rel = parseRel(p)
          val node = parseNode(p)
          hops += ((rel, node))
        case Some(Sym("(")) =>
          // quantified path pattern (GQL / Neo4j 5): the supported
          // subset (()-[:T]->()){m,n} desugars to a var-length hop —
          // bare inner nodes, one relationship, bounded quantifier;
          // the node FOLLOWING the group is the hop's target
          p.expectSym("(")
          val innerHead = parseNode(p)
          val innerRel = parseRel(p)
          val innerTo = parseNode(p)
          p.expectSym(")")
          // inner VARIABLES are GQL group variables (each binds a
          // per-iteration list); labels/props/WHERE on inner elements
          // stay out of scope — constrain endpoints outside the group
          def bare(n: Ast.NodePattern): Boolean =
            n.label.isEmpty && n.props.isEmpty &&
              n.where.isEmpty && n.altLabels.isEmpty && n.extraLabels.isEmpty
          if (!bare(innerHead) || !bare(innerTo)) throw ParseException(
            "quantified path pattern inner nodes take group VARIABLES " +
              "only — put labels/properties outside the group")
          if (innerRel.varLength.nonEmpty ||
              innerRel.where.nonEmpty || innerRel.props.nonEmpty)
            throw ParseException(
              "quantified path patterns support a plain -[r:T]-> inner " +
                "relationship")
          def qnum(): Int = p.next() match {
            case NumLit(v: Long) => v.toInt
            case other => throw ParseException(
              s"expected a quantifier bound, got $other")
          }
          // GQL quantifiers: {m,n} / {m} braces, or the * / +
          // shorthands (unbounded upper lowers to the engine's hop
          // cap of 10, the same bound var-length `*` carries)
          val (lo, hi) = p.peek match {
            case Some(Sym("*")) => p.next(); (0, 10)
            case Some(Sym("+")) => p.next(); (1, 10)
            case _ =>
              p.expectSym("{")
              val l = qnum()
              val h = if (p.trySym(",")) qnum() else l
              p.expectSym("}")
              (l, h)
          }
          if (lo < 0 || hi < lo || hi > 10) throw ParseException(
            s"unsupported quantifier {$lo,$hi} (bounded 0..10)")
          val target = parseNode(p)
          hops += ((innerRel.copy(varLength = Some((lo, hi)),
            qppNodeVars =
              if (innerHead.variable.nonEmpty || innerTo.variable.nonEmpty)
                Some((innerHead.variable, innerTo.variable))
              else None), target))
        case _ => continue = false
      }
    }
    if (shortest || allShortest) p.expectSym(")")
    Ast.PathPattern(head, hops.result(), pathVar, shortest, allShortest)
  }

  // node := '(' var? (':' Label)? ('{' k: expr, ... '}')? ')'
  private def parseNode(p: P): Ast.NodePattern = {
    p.expectSym("(")
    var variable: Option[String] = None
    p.peek match {
      case Some(Ident(v)) => p.next(); variable = Some(v)
      case _ => ()
    }
    // label expressions: disjunction (n:A|B|C), conjunction (n:A:B)
    // or the Neo4j-5 (n:A&B) form, and negation (n:!A) which folds
    // into the pattern's inline WHERE as NOT n:A. Mixing | with the
    // all-of/negation forms is rejected.
    var label: Option[String] = None
    var dynLabel: Option[Ast.Expr] = None
    val altLabels = Seq.newBuilder[String]
    val extraLabels = Seq.newBuilder[String]
    val negLabels = Seq.newBuilder[String]
    var amp = false
    if (p.trySym(":")) {
      def item(): Unit =
        if (p.trySym("!")) negLabels += p.identOrKw()
        else tryDynRef(p) match {
          case Some(e) =>
            if (label.nonEmpty || dynLabel.nonEmpty) throw ParseException(
              "a dynamic label $(…) must be the pattern's only label")
            dynLabel = Some(e)
          case None =>
            if (label.isEmpty && dynLabel.isEmpty) label = Some(p.identOrKw())
            else extraLabels += p.identOrKw()
        }
      item()
      while (p.trySym("&")) { amp = true; item() }
      while (p.trySym("|")) altLabels += p.identOrKw()
      while (p.trySym(":")) extraLabels += p.identOrKw()
      val (alts, extras) = (altLabels.result(), extraLabels.result())
      if (alts.nonEmpty &&
          (extras.nonEmpty || amp || negLabels.result().nonEmpty))
        throw ParseException(
          "label expression mixes | (any-of) with all-of/negation forms")
    }
    val props = Seq.newBuilder[(String, Ast.Expr)]
    if (p.trySym("{")) {
      def one(): Unit = {
        val k = p.identOrKw()
        p.expectSym(":")
        // any expression — the reference's template form
        // `{gid: item.gid}` (neo4j.go:103) and the computed-key
        // ingest idiom `{gid: 'b:' + toString(k)}` alike; the planner
        // evaluates them per row (pvCol)
        props += ((k, parseExpr(p)))
      }
      one()
      while (p.trySym(",")) one()
      p.expectSym("}")
    }
    // Neo4j-5 inline predicate: (n:Label WHERE n.x > 1)
    val where = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
    p.expectSym(")")
    val negs = negLabels.result()
    val whereAll =
      if (negs.isEmpty) where
      else {
        val v = variable.getOrElse(throw ParseException(
          "a negated label (:!A) needs a named variable"))
        val negPred = negs.map(l =>
            Ast.Not(Ast.LabelPred(v, Seq(l))): Ast.Expr)
          .reduce(Ast.And(_, _))
        Some(where.map(Ast.And(_, negPred)).getOrElse(negPred))
      }
    Ast.NodePattern(variable, label, props.result(), whereAll,
      altLabels.result(), extraLabels.result(), dynLabel)
  }

  /** the conjunction of a pattern's inline node + relationship
    * predicates */
  private def inlineWhere(pat: Ast.PathPattern): Option[Ast.Expr] =
    (pat.head.where.toSeq ++
      pat.hops.flatMap(h => h._1.where.toSeq ++ h._2.where.toSeq))
      .reduceOption(Ast.And(_, _))

  /** `$(expr)` in a label/type position — the Cypher 25 dynamic
    * label/type reference (`SET n:$(x)`, `CREATE (n:$(x))`,
    * `-[:$(x)]->`) */
  private def tryDynRef(p: P): Option[Ast.Expr] =
    if (!p.trySym("$")) None
    else {
      p.expectSym("(")
      val e = parseExpr(p)
      p.expectSym(")")
      Some(e)
    }

  // rel := '-[' var? (':' TYPE)? ('*' min? ('..' max)?)? ']->' | '<-[' ... ']-'
  private def parseRel(p: P): Ast.RelPattern = {
    val incoming = p.peek.contains(Sym("<-"))
    if (incoming) p.next() else p.expectSym("-")
    var variable: Option[String] = None
    var relType: Option[String] = None
    var dynType: Option[Ast.Expr] = None
    var varLength: Option[(Int, Int)] = None
    var relWhere: Option[Ast.Expr] = None
    val altTypes = Seq.newBuilder[String]
    val relProps = Seq.newBuilder[(String, Ast.Expr)]
    if (p.trySym("[")) {
      p.peek match {
        case Some(Ident(v)) => p.next(); variable = Some(v)
        case _ => ()
      }
      if (p.trySym(":")) {
        tryDynRef(p) match {
          case Some(e) => dynType = Some(e)
          case None =>
            relType = Some(p.identOrKw())
            // type disjunction: -[:A|B]-> (match-only)
            while (p.trySym("|")) altTypes += p.identOrKw()
        }
      }
      if (p.trySym("*")) {
        // Neo4j forms: `*` (1..∞), `*n` (exact), `*n..`, `*..m`,
        // `*n..m`, `*0..m` — an open upper bound lowers to the
        // engine's hop cap of 10 (documented; unbounded expansion
        // over a cyclic store is unbounded work)
        val minOpt = p.peek match {
          case Some(NumLit(v: Long)) => p.next(); Some(v.toInt)
          case _ => None
        }
        val (min, max) =
          if (p.trySym("..")) {
            val maxOpt = p.peek match {
              case Some(NumLit(v: Long)) => p.next(); Some(v.toInt)
              case _ => None
            }
            (minOpt.getOrElse(1), maxOpt.getOrElse(10))
          } else minOpt match {
            case Some(n) => (n, n)
            case None => (1, 10)
          }
        if (min < 0 || max < min || max > 10)
          throw ParseException(s"unsupported hop range *$min..$max")
        varLength = Some((min, max))
      }
      // inline property map: -[r:T {source: 'x'}]->
      if (p.trySym("{")) {
        def one(): Unit = {
          val k = p.identOrKw()
          p.expectSym(":")
          relProps += ((k, parseExpr(p)))
        }
        one()
        while (p.trySym(",")) one()
        p.expectSym("}")
      }
      // Neo4j-5 inline predicate: -[r:T WHERE type(r) <> 'x']->
      // (fixed-length only — Neo4j rejects it on var-length too)
      if (p.tryKw("WHERE")) {
        if (varLength.nonEmpty) throw ParseException(
          "inline WHERE is not allowed on a variable-length relationship")
        relWhere = Some(parseExpr(p))
      }
      p.expectSym("]")
    }
    val direction =
      if (incoming) { p.expectSym("-"); -1 }
      else if (p.trySym("->")) 1
      else { p.expectSym("-"); 0 } // undirected: `-[r]-` / `--`
    Ast.RelPattern(variable, relType, direction, varLength,
      altTypes.result(), relWhere, relProps.result(), dynType = dynType)
  }

  // ---- expressions (precedence: OR < AND < NOT < cmp < atom) ----
  private def parseExpr(p: P): Ast.Expr = parseOr(p)

  private def parseOr(p: P): Ast.Expr = {
    var l = parseXor(p)
    while (p.tryKw("OR")) l = Ast.Or(l, parseXor(p))
    l
  }

  /** `a XOR b` desugars to `(a OR b) AND NOT (a AND b)` — the same
    * three-valued truth table (null if either side is null), with no
    * new AST node for downstream match sites to learn.
    */
  private def parseXor(p: P): Ast.Expr = {
    var l = parseAnd(p)
    while (p.tryKw("XOR")) {
      val r = parseAnd(p)
      l = Ast.And(Ast.Or(l, r), Ast.Not(Ast.And(l, r)))
    }
    l
  }

  private def parseAnd(p: P): Ast.Expr = {
    var l = parseNot(p)
    while (p.tryKw("AND")) l = Ast.And(l, parseNot(p))
    l
  }

  private def parseNot(p: P): Ast.Expr =
    if (p.tryKw("NOT")) Ast.Not(parseNot(p)) else parseCmp(p)

  private def parseCmp(p: P): Ast.Expr = {
    val l = parseAddSub(p)
    p.peek match {
      case Some(Sym(op0)) if Set("=", "<>", "<", ">", "<=", ">=")
          .contains(op0) =>
        // chained comparisons (openCypher): 1 < x <= 5 desugars to
        // 1 < x AND x <= 5 (every adjacent pair conjoined)
        var cur = l
        var acc: Option[Ast.Expr] = None
        var more = true
        while (more) p.peek match {
          case Some(Sym(op)) if Set("=", "<>", "<", ">", "<=", ">=")
              .contains(op) =>
            p.next()
            val r = parseAddSub(p)
            val c = Ast.Cmp(op, cur, r)
            acc = Some(acc.map(a => Ast.And(a, c): Ast.Expr).getOrElse(c))
            cur = r
          case _ => more = false
        }
        acc.get
      case Some(Sym("=~")) =>
        p.next()
        Ast.StrPred("regex", l, parseAddSub(p))
      case Some(Kw("IS")) =>
        p.next()
        val negated = p.tryKw("NOT")
        if (p.trySym(":")) {
          // `x IS [NOT] :: TYPE` (Neo4j 5 type predicate); the inner
          // element type of LIST<...> is accepted and ignored (values
          // here are untyped lists)
          p.expectSym(":")
          val tname = p.identOrKw().toUpperCase match {
            case "INT" | "INTEGER" => "INTEGER"
            case "FLOAT" => "FLOAT"
            case "STRING" => "STRING"
            case "BOOL" | "BOOLEAN" => "BOOLEAN"
            case "LIST" =>
              if (p.trySym("<")) { p.identOrKw(); p.expectSym(">") }
              "LIST"
            case "MAP" => "MAP"
            case other => throw ParseException(
              s"unsupported type in IS ::, got $other")
          }
          Ast.TypePred(l, tname, negated)
        } else {
          p.expectKw("NULL")
          Ast.IsNull(l, negated)
        }
      case Some(Kw("IN")) =>
        p.next()
        Ast.InList(l, parseAddSub(p))
      case Some(Kw("STARTS")) =>
        p.next(); p.expectKw("WITH")
        Ast.StrPred("startswith", l, parseAddSub(p))
      case Some(Kw("ENDS")) =>
        p.next(); p.expectKw("WITH")
        Ast.StrPred("endswith", l, parseAddSub(p))
      case Some(Kw("CONTAINS")) =>
        p.next()
        Ast.StrPred("contains", l, parseAddSub(p))
      case _ => l
    }
  }

  // arithmetic precedence: +/- < */ /% < unary - < ^ (right-assoc)
  // < postfix [] < atom. openCypher binds ^ TIGHTER than unary minus:
  // -2^2 = -(2^2) = -4.0 (the exponent itself may be signed: 2^-3).
  private def parseAddSub(p: P): Ast.Expr = {
    var l = parseMulDiv(p)
    var continue = true
    while (continue) {
      p.peek match {
        // `||` is Cypher 5's explicit string/list concatenation —
        // same precedence as `+`, but never numeric
        case Some(Sym(op @ ("+" | "-" | "||"))) =>
          p.next(); l = Ast.Arith(op, l, parseMulDiv(p))
        case _ => continue = false
      }
    }
    l
  }

  private def parseMulDiv(p: P): Ast.Expr = {
    var l = parseUnary(p)
    var continue = true
    while (continue) {
      p.peek match {
        case Some(Sym(op @ ("*" | "/" | "%"))) =>
          p.next(); l = Ast.Arith(op, l, parseUnary(p))
        case _ => continue = false
      }
    }
    l
  }

  private def parseUnary(p: P): Ast.Expr =
    if (p.trySym("-")) parseUnary(p) match {
      // fold literal negation; general case lowers as 0 - e
      case Ast.Lit(l: Long) => Ast.Lit(-l)
      case Ast.Lit(d: Double) => Ast.Lit(-d)
      case other => Ast.Arith("-", Ast.Lit(0L), other)
    }
    else if (p.trySym("+")) parseUnary(p)
    else parsePow(p)

  private def parsePow(p: P): Ast.Expr = {
    val l = parsePostfix(p)
    // right-assoc via parseUnary: the exponent may itself be signed
    if (p.trySym("^")) Ast.Arith("^", l, parseUnary(p))
    else l
  }

  /** postfix subscript / slice / dot: `expr[idx]` (0-based list index
    * / map key), `expr[from..to]` (end-exclusive; either bound
    * optional), `expr.key` (map/struct access on a non-variable —
    * `properties(n).name`, `collect(x)[0].k`; variables' `n.prop`
    * parses in the atom as PropRef)
    */
  private def parsePostfix(p: P): Ast.Expr = {
    var e = parseAtom(p)
    // `n:Label[:More]` label predicate in expression position
    // (`WHERE n:Admin`, `RETURN n:Admin AS flag`). Only after a bare
    // variable — map keys and projection aliases consume their ':'
    // before their value expression parses, so there is no ambiguity.
    e match {
      case Ast.VarRef(v) if p.peek.contains(Sym(":")) &&
          p.toks.drop(1).headOption.exists {
            case _: Ident | _: Kw => true; case _ => false } =>
        val labels = Seq.newBuilder[String]
        while (p.trySym(":")) labels += p.identOrKw()
        e = Ast.LabelPred(v, labels.result())
      case _ => ()
    }
    var continue = true
    while (continue) {
      if (p.peek.contains(Sym(".")) &&
          p.toks.drop(1).headOption.exists {
            case _: Ident | _: Kw => true; case _ => false }) {
        p.next()
        e = Ast.Subscript(e, Ast.Lit(p.identOrKw()))
      } else if (p.peek.contains(Sym("["))) {
        p.next()
        if (p.trySym("..")) { // l[..to]
          val to = parseExpr(p)
          p.expectSym("]")
          e = Ast.Slice(e, None, Some(to))
        } else {
          val idx = parseExpr(p)
          if (p.trySym("..")) {
            val to = p.peek match {
              case Some(Sym("]")) => None // l[from..]
              case _ => Some(parseExpr(p))
            }
            p.expectSym("]")
            e = Ast.Slice(e, Some(idx), to)
          } else {
            p.expectSym("]")
            e = Ast.Subscript(e, idx)
          }
        }
      } else continue = false
    }
    e
  }

  private def parseAtom(p: P): Ast.Expr = p.next() match {
    case StrLit(s) => Ast.Lit(s)
    case NumLit(v) => Ast.Lit(v)
    case ParamTok(n) => Ast.Param(n)
    case Sym("-") => // unary minus ('-' lexes as a symbol first)
      parseAtom(p) match {
        case Ast.Lit(l: Long) => Ast.Lit(-l)
        case Ast.Lit(d: Double) => Ast.Lit(-d)
        case other => throw ParseException(s"cannot negate $other")
      }
    case Kw("TRUE") => Ast.Lit(true)
    case Kw("FALSE") => Ast.Lit(false)
    case Kw("NULL") => Ast.Lit(null)
    case Sym("(") =>
      // a bare pattern predicate — `WHERE (n)-[:T]->(m)` without the
      // exists() wrapper (everyday Neo4j) — starts at this same '(';
      // try a full pattern parse and backtrack to the parenthesized
      // expression on failure (a pattern needs ≥1 hop, so `(n.x)`
      // and `(a) - (b)` arithmetic never match)
      val afterParen = p.toks
      val asPattern =
        try {
          p.toks = Sym("(") :: afterParen
          val pat = parsePattern(p)
          if (pat.hops.isEmpty || pat.pathVar.nonEmpty ||
              pat.shortest || pat.allShortest) { p.toks = afterParen; None }
          else Some(Ast.PatternPred(pat, inlineWhere(pat)))
        } catch { case _: ParseException => p.toks = afterParen; None }
      asPattern.getOrElse {
        val e = parseExpr(p)
        p.expectSym(")")
        e
      }
    case Sym("[") =>
      // `[x IN list …]` is a comprehension, anything else a literal —
      // except `[(…)-[…]->(…) … | proj]`, a pattern comprehension:
      // try the pattern parse at a '[' + '(' opening and backtrack to
      // the list literal on failure (the mandatory `|` disambiguates:
      // a parenthesized first ELEMENT is never followed by `|`)
      val asPatternComp: Option[Ast.Expr] =
        if (!p.toks.headOption.contains(Sym("("))) None
        else {
          val saved = p.toks
          try {
            val pat = parsePattern(p)
            val whereE = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
            if (pat.hops.isEmpty || pat.pathVar.nonEmpty ||
                pat.shortest || pat.allShortest || !p.trySym("|")) {
              p.toks = saved; None
            } else {
              val projE = parseExpr(p)
              p.expectSym("]")
              val inline = inlineWhere(pat)
              val w = (whereE, inline) match {
                case (Some(a), Some(b)) => Some(Ast.And(a, b))
                case (a, b) => a.orElse(b)
              }
              Some(Ast.PatternComp(pat, w, projE))
            }
          } catch {
            case _: ParseException => p.toks = saved; None
          }
        }
      asPatternComp.getOrElse {
      (p.toks.headOption, p.toks.drop(1).headOption) match {
        case (Some(Ident(v)), Some(Kw("IN"))) =>
          p.next(); p.next()
          val listE = parseExpr(p)
          val whereE = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
          val projE = if (p.trySym("|")) Some(parseExpr(p)) else None
          p.expectSym("]")
          Ast.ListComp(v, listE, whereE, projE)
        case _ =>
          val items = Seq.newBuilder[Ast.Expr]
          if (!p.trySym("]")) {
            items += parseExpr(p)
            while (p.trySym(",")) items += parseExpr(p)
            p.expectSym("]")
          }
          Ast.ListLit(items.result())
      }
      }
    case Sym("{") =>
      val entries = Seq.newBuilder[(String, Ast.Expr)]
      def one(): Unit = {
        val k = p.identOrKw()
        p.expectSym(":")
        entries += ((k, parseExpr(p)))
      }
      if (!p.trySym("}")) { // `{}` is the empty map
        one()
        while (p.trySym(",")) one()
        p.expectSym("}")
      }
      Ast.MapLit(entries.result())
    case Kw("CASE") =>
      // searched form starts directly with WHEN; simple form carries
      // a test expression compared for equality against each WHEN.
      // Neo4j 5.19 extended simple form: `WHEN > 3`, `WHEN IS NULL`,
      // and comma-separated alternatives — those desugar the whole
      // CASE to the searched form (OR of predicates per WHEN)
      val test = p.peek match {
        case Some(Kw("WHEN")) => None
        case _ => Some(parseExpr(p))
      }
      var extended = false
      val whens =
        Seq.newBuilder[(Seq[Either[Ast.Expr, Ast.Expr]], Ast.Expr)]
      while (p.tryKw("WHEN")) {
        val conds = Seq.newBuilder[Either[Ast.Expr, Ast.Expr]]
        def one(): Unit = (test, p.peek) match {
          case (Some(t), Some(Sym(op)))
              if Set(">", "<", ">=", "<=", "=", "<>").contains(op) =>
            p.next(); extended = true
            conds += Right(Ast.Cmp(op, t, parseExpr(p)))
          case (Some(t), Some(Kw("IS"))) =>
            p.next(); extended = true
            val not = p.tryKw("NOT")
            p.expectKw("NULL")
            conds += Right(Ast.IsNull(t, negated = not))
          case _ => conds += Left(parseExpr(p))
        }
        one()
        while (p.trySym(",")) { extended = true; one() }
        p.expectKw("THEN")
        whens += ((conds.result(), parseExpr(p)))
      }
      val els = if (p.tryKw("ELSE")) Some(parseExpr(p)) else None
      p.expectKw("END")
      val ws = whens.result()
      if (ws.isEmpty) throw ParseException("CASE needs at least one WHEN")
      if (!extended)
        Ast.CaseExpr(test, ws.map { case (cs, v) => (cs.head.merge, v) }, els)
      else {
        val searched = ws.map { case (cs, v) =>
          val preds = cs.map {
            case Left(value) => Ast.Cmp("=", test.getOrElse(
              throw ParseException(
                "extended WHEN forms need a CASE test expression")), value)
            case Right(pred) => pred
          }
          (preds.reduce(Ast.Or(_, _)), v)
        }
        Ast.CaseExpr(None, searched, els)
      }
    case Kw("COUNT") if p.peek.contains(Sym("{")) =>
      // COUNT { [MATCH] pattern [WHERE …] } — correlated match count;
      // or a full regular-query body (Neo4j 5)
      val (pat, whereE, full) = parseSubqueryBody(p)
      Ast.CountSub(pat, whereE, full)
    case Kw("COLLECT") if p.peek.contains(Sym("{")) =>
      // COLLECT { [MATCH] pattern [WHERE …] RETURN expr } (Neo4j 5.6)
      // — the list-valued member of the COUNT{}/EXISTS{} family; the
      // MATCH/WHERE/RETURN-expression subset lowers exactly like a
      // pattern comprehension [pattern WHERE pred | proj]; a body
      // that doesn't fit falls back to a FULL regular query whose
      // single RETURN item is the collected projection
      p.expectSym("{")
      val savedCollect = p.toks
      try {
        p.tryKw("MATCH")
        val pat = parsePattern(p)
        val whereE = if (p.tryKw("WHERE")) Some(parseExpr(p)) else None
        p.expectKw("RETURN")
        val proj = parseExpr(p)
        p.expectSym("}")
        Ast.PatternComp(pat,
          (inlineWhere(pat).toSeq ++ whereE.toSeq)
            .reduceOption(Ast.And(_, _)),
          proj)
      } catch {
        case _: ParseException =>
          p.toks = savedCollect
          val q = parseQuery(p) // RETURN mandatory for COLLECT
          p.expectSym("}")
          Ast.PatternComp(Ast.PathPattern(Ast.NodePattern(None, None, Nil),
            Nil), None, Ast.Lit(null), Some(q))
      }
    case Kw(fn) if Set("COLLECT", "COUNT", "SUM", "AVG", "MIN", "MAX")
        .contains(fn) =>
      p.expectSym("(")
      val distinct = p.tryKw("DISTINCT")
      val args: Seq[Ast.Expr] =
        if (p.trySym("*")) Seq(Ast.Star)
        else {
          val as = Seq.newBuilder[Ast.Expr]
          as += parseExpr(p)
          while (p.trySym(",")) as += parseExpr(p)
          as.result()
        }
      p.expectSym(")")
      Ast.FuncCall(fn.toLowerCase, args, distinct)
    case Ident(fn) if p.peek.contains(Sym("(")) &&
        Set("any", "all", "none", "single").contains(fn.toLowerCase) &&
        (p.toks.drop(1).headOption.exists(_.isInstanceOf[Ident]) &&
          p.toks.drop(2).headOption.contains(Kw("IN")("IN"))) =>
      parseQuant(p, fn.toLowerCase)
    // `all` lexes as the UNION ALL keyword — still a quantifier here
    case k: Kw if k.s == "ALL" && p.peek.contains(Sym("(")) =>
      parseQuant(p, "all")
    case Ident(fn) if fn.equalsIgnoreCase("reduce") &&
        p.peek.contains(Sym("(")) =>
      // reduce(acc = init, x IN list | body)
      p.next() // '('
      val acc = p.identOrKw()
      p.expectSym("=")
      val init = parseExpr(p)
      p.expectSym(",")
      val v = p.identOrKw()
      p.expectKw("IN")
      val listE = parseExpr(p)
      p.expectSym("|")
      val body = parseExpr(p)
      p.expectSym(")")
      Ast.ReduceExpr(acc, init, v, listE, body)
    case Ident(fn) if fn.equalsIgnoreCase("exists") &&
        p.peek.contains(Sym("{")) =>
      // EXISTS { [MATCH] pattern [WHERE …] } — Neo4j 5 form; or a
      // full regular-query body
      val (pat, whereE, full) = parseSubqueryBody(p)
      Ast.PatternPred(pat, whereE, full)
    case Ident(fn) if fn.equalsIgnoreCase("exists") &&
        p.peek.contains(Sym("(")) &&
        p.toks.drop(1).headOption.contains(Sym("(")) =>
      // exists((n)-[:T]->(m)) — pattern predicate. A parenthesized
      // NON-pattern (`exists((n.age))`) backtracks to the value form.
      val saved = p.toks
      p.next() // '('
      try {
        val pat = parsePattern(p)
        p.expectSym(")")
        if (pat.hops.isEmpty)
          throw ParseException("bare node exists() is a value check")
        Ast.PatternPred(pat, inlineWhere(pat))
      } catch {
        case _: ParseException =>
          p.toks = saved
          p.next() // '('
          val e = parseExpr(p)
          p.expectSym(")")
          Ast.FuncCall("exists", Seq(e), distinct = false)
      }
    case Ident(fn) if fn.equalsIgnoreCase("trim") &&
        p.peek.contains(Sym("(")) &&
        (p.toks.drop(1).headOption match {
          case Some(Ident(s)) =>
            Set("both", "leading", "trailing", "from")
              .contains(s.toLowerCase)
          case _ => false
        }) =>
      // trim([BOTH|LEADING|TRAILING] [chars] FROM s) — the Cypher 5
      // trim-specification form desugars to trim/btrim/ltrim/rtrim
      p.next() // '('
      val spec = p.peek match {
        case Some(Ident(s))
            if Set("both", "leading", "trailing").contains(s.toLowerCase) =>
          p.next(); s.toLowerCase
        case _ => "both"
      }
      val chars: Option[Ast.Expr] = p.peek match {
        case Some(Ident(s)) if s.equalsIgnoreCase("from") => None
        case _ => Some(parseExpr(p))
      }
      p.next() match {
        case Ident(s) if s.equalsIgnoreCase("from") => ()
        case other =>
          throw ParseException(s"expected FROM in trim(), got $other")
      }
      val subject = parseExpr(p)
      p.expectSym(")")
      val fname = spec match {
        case "both" => if (chars.isEmpty) "trim" else "btrim"
        case "leading" => "ltrim"
        case "trailing" => "rtrim"
      }
      Ast.FuncCall(fname, subject +: chars.toSeq, distinct = false)
    case Ident(fn) if p.peek.contains(Sym("(")) =>
      p.next() // '('
      val as = Seq.newBuilder[Ast.Expr]
      if (!p.trySym(")")) {
        as += parseExpr(p)
        while (p.trySym(",")) as += parseExpr(p)
        p.expectSym(")")
      }
      as.result() match {
        // legacy Neo4j 3/4 pattern-count idiom `size((n)-[:T]->())` —
        // exactly COUNT { pattern }, which Neo4j 5 replaced it with;
        // desugar so ported queries run verbatim
        case Seq(pp: Ast.PatternPred) if fn.equalsIgnoreCase("size") =>
          Ast.CountSub(pp.pattern, pp.where, pp.full)
        case args => Ast.FuncCall(fn.toLowerCase, args, distinct = false)
      }
    case Ident(ns) if ns.equalsIgnoreCase("vector") &&
        p.peek.contains(Sym(".")) &&
        p.toks.drop(1).headOption.exists {
          case Ident(s) => s.equalsIgnoreCase("similarity"); case _ => false
        } && p.toks.drop(2).headOption.contains(Sym(".")) &&
        p.toks.drop(4).headOption.contains(Sym("(")) =>
      // vector.similarity.cosine(a, b) / .euclidean(a, b) (Neo4j 5.18)
      p.next(); p.next(); p.next() // '.', 'similarity', '.'
      val fn = p.identOrKw()
      p.next() // '('
      val as = Seq.newBuilder[Ast.Expr]
      if (!p.trySym(")")) {
        as += parseExpr(p)
        while (p.trySym(",")) as += parseExpr(p)
        p.expectSym(")")
      }
      Ast.FuncCall(s"vector.similarity.${fn.toLowerCase}", as.result(),
        distinct = false)
    case Ident(ns) if Set("date", "datetime", "localdatetime", "duration",
        "point").contains(ns.toLowerCase) && p.peek.contains(Sym(".")) &&
        p.toks.drop(1).headOption.exists {
          case _: Ident | _: Kw => true; case _ => false } &&
        p.toks.drop(2).headOption.contains(Sym("(")) =>
      // temporal namespace call: duration.between(a, b),
      // datetime.truncate('month', dt), …
      p.next() // '.'
      val fn = p.identOrKw()
      p.next() // '('
      val as = Seq.newBuilder[Ast.Expr]
      if (!p.trySym(")")) {
        as += parseExpr(p)
        while (p.trySym(",")) as += parseExpr(p)
        p.expectSym(")")
      }
      Ast.FuncCall(s"${ns.toLowerCase}.${fn.toLowerCase}", as.result(),
        distinct = false)
    case Ident(v) =>
      if (p.trySym(".")) Ast.PropRef(v, p.identOrKw())
      else if (p.peek.contains(Sym("{"))) parseMapProj(p, v)
      else Ast.VarRef(v)
    case other => throw ParseException(s"unexpected token: $other")
  }

  /** `v {.k, .*, alias: expr, x}` — Neo4j map projection. `.k`
    * desugars to `k: v.k`, a bare identifier `x` to `x: x`, `.*`
    * sets the all-properties flag.
    */
  private def parseMapProj(p: P, v: String): Ast.Expr = {
    p.next() // '{'
    val entries = Seq.newBuilder[(String, Ast.Expr)]
    var all = false
    def one(): Unit =
      if (p.trySym(".")) {
        if (p.trySym("*")) all = true
        else { val k = p.identOrKw(); entries += ((k, Ast.PropRef(v, k))) }
      } else {
        val k = p.identOrKw()
        if (p.trySym(":")) entries += ((k, parseExpr(p)))
        else entries += ((k, Ast.VarRef(k)))
      }
    if (!p.trySym("}")) {
      one()
      while (p.trySym(",")) one()
      p.expectSym("}")
    }
    Ast.MapProj(v, entries.result(), all)
  }
}

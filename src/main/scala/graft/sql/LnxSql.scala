package graft.sql

/** Parser for the lnx SQL dialect (PostgreSQL-flavored subset documented
  * at lnx-server/src/apis/mod.rs:86-152 and parsed by sqlparser in
  * lnx-query/src/sql.rs — the reference's own planner is stubbed,
  * query.rs:22-23, so execution semantics follow the OpenAPI docs).
  * Hand-rolled recursive descent; no dependencies.
  *
  * Supported surface:
  *   SELECT cols|score() [AS a] FROM t
  *     [WHERE pred AND pred ...] [ORDER BY x [ASC|DESC]] [LIMIT n]
  *   preds: fts|fuzzy|levenshtein|regex|fastfuzzy(col, 'q' | $n),
  *          score() <op> num, col <op> literal | $n
  *   INSERT INTO t (cols) VALUES (...), (...)     -- always UPSERT
  *   DELETE FROM t WHERE ...
  *   CREATE TABLE [IF NOT EXISTS] t (col type [PRIMARY KEY] [NOT NULL]
  *     [DEFAULT lit], ...) [WITH (tokenizers = (col = 'name', ...))]
  *   multiple ';'-separated statements (sql.rs:112-118)
  *   $n parameters substituted server-side (apis/mod.rs:51-69)
  */
object LnxSql {

  // ---------- AST ----------
  sealed trait Lit
  final case class SLit(v: String) extends Lit
  /** Decimal literal (has a '.'): double semantics. */
  final case class NLit(v: Double) extends Lit
  /** Integer literal: Long-backed so bigint/uint64 values above 2^53
    * keep exact precision (a Double round-trip silently stores
    * 9007199254740993 as ...992). Values outside Long range are
    * rejected at parse — the uint64 storable range is [0, 2^63-1]
    * (apis/mod.rs:168-169; Spark has no unsigned 64-bit type).
    */
  final case class ILit(v: Long) extends Lit
  final case class BLit(v: Boolean) extends Lit
  case object NullLit extends Lit
  final case class Param(n: Int) extends Lit
  /** ARRAY[lit, ...] — values for `dtype[]` columns (apis/mod.rs:184-187). */
  final case class ALit(items: Seq[Lit]) extends Lit

  sealed trait Pred
  /** fts/fuzzy/levenshtein/regex/fastfuzzy(col, q) [ <op> num ] */
  final case class SearchPred(func: String, col: String, arg: Lit,
      cmp: Option[(String, Double)]) extends Pred
  final case class ScorePred(op: String, value: Double) extends Pred
  final case class ColPred(col: String, op: String, value: Lit) extends Pred

  sealed trait SelectCol
  final case class NamedCol(name: String, alias: Option[String]) extends SelectCol
  final case class ScoreCol(alias: Option[String]) extends SelectCol
  /** `facet_counts(col)`: hierarchical facet drill-down over the match
    * set — count-per-facet-path-prefix, the one aggregation the `facet`
    * type exists for (apis/mod.rs:177). Result columns (facet, cnt).
    */
  final case class FacetCol(col: String) extends SelectCol
  case object StarCol extends SelectCol

  final case class ColumnDef(name: String, tpe: String, primaryKey: Boolean,
      notNull: Boolean, default: Option[Lit], isArray: Boolean)

  sealed trait Statement
  final case class Select(cols: Seq[SelectCol], table: String, where: Seq[Pred],
      orderBy: Option[(String, Boolean)], limit: Option[Int]) extends Statement
  final case class Insert(table: String, cols: Seq[String], rows: Seq[Seq[Lit]]) extends Statement
  final case class Delete(table: String, where: Seq[Pred]) extends Statement
  final case class Update(table: String, sets: Seq[(String, Lit)], where: Seq[Pred]) extends Statement
  final case class CreateTable(table: String, ifNotExists: Boolean,
      columns: Seq[ColumnDef], tokenizers: Map[String, String]) extends Statement
  /** EXPLAIN <stmt> — the reference's query-debug surface
    * (lnx-server/src/apis/query.rs:36-43).
    */
  final case class Explain(stmt: Statement) extends Statement

  final case class ParseException(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  // ---------- lexer ----------
  private sealed trait Tok
  private final case class Ident(s: String) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Punct(s: String) extends Tok
  private final case class Par(n: Int) extends Tok

  private def lex(sql: String): Vector[(Tok, Int)] = {
    val out = Vector.newBuilder[(Tok, Int)]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = sql.charAt(i)
          if (ch == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
          else if (ch == '\'') { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) throw ParseException("unterminated string", start)
        out += ((Str(sb.toString), start))
      } else if (c == '$') {
        val start = i
        i += 1
        val ds = new StringBuilder
        while (i < n && sql.charAt(i).isDigit) { ds += sql.charAt(i); i += 1 }
        if (ds.isEmpty) throw ParseException("bad parameter", start)
        // toInt on an over-long digit run would leak NumberFormatException
        // through the ParseException contract (fuzz-found)
        val pn = try ds.toString.toInt catch {
          case _: NumberFormatException =>
            throw ParseException(s"parameter number out of range: $$$ds", start)
        }
        out += ((Par(pn), start))
      } else if (c.isDigit || (c == '-' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val start = i
        val sb = new StringBuilder
        if (c == '-') { sb += c; i += 1 }
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) { sb += sql.charAt(i); i += 1 }
        out += ((Num(sb.toString), start))
      } else if (c.isLetter || c == '_') {
        val start = i
        val sb = new StringBuilder
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) { sb += sql.charAt(i); i += 1 }
        out += ((Ident(sb.toString), start))
      } else {
        val start = i
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "!=").contains(two)) { out += ((Punct(two), start)); i += 2 }
        else { out += ((Punct(c.toString), start)); i += 1 }
      }
    }
    out.result()
  }

  // ---------- parser ----------
  private final class P(toks: Vector[(Tok, Int)]) {
    private var p = 0
    def pos: Int = if (p < toks.length) toks(p)._2 else -1
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)._1) else None
    def next(): Tok = {
      // every truncated statement ("UPDATE ", "SELECT * FROM") funnels
      // through here — bounds-check or the contract leaks IOOBE (fuzz-found)
      if (p >= toks.length) throw ParseException("unexpected end of statement", pos)
      val t = toks(p)._1; p += 1; t
    }
    def done: Boolean = p >= toks.length
    def isKw(kw: String): Boolean = peek match {
      case Some(Ident(s)) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def eatKw(kw: String): Unit =
      if (isKw(kw)) p += 1 else throw ParseException(s"expected $kw", pos)
    def tryKw(kw: String): Boolean = { val ok = isKw(kw); if (ok) p += 1; ok }
    def isPunct(s: String): Boolean = peek match {
      case Some(Punct(x)) => x == s
      case _ => false
    }
    def eatPunct(s: String): Unit =
      if (isPunct(s)) p += 1 else throw ParseException(s"expected '$s'", pos)
    def tryPunct(s: String): Boolean = { val ok = isPunct(s); if (ok) p += 1; ok }
    def ident(): String = next() match {
      case Ident(s) => s
      case t => throw ParseException(s"expected identifier, got $t", pos)
    }
    def literal(): Lit = next() match {
      case Str(s) => SLit(s)
      case Num(s) =>
        // both branches keep the parser's error contract: malformed
        // numbers ("1.2.3") surface as ParseException with a position,
        // never a raw NumberFormatException
        if (s.contains('.'))
          try NLit(s.toDouble)
          catch {
            case _: NumberFormatException =>
              throw ParseException(s"malformed number: $s", pos)
          }
        else try ILit(s.toLong)
        catch {
          case _: NumberFormatException =>
            throw ParseException(s"integer literal out of range: $s", pos)
        }
      case Par(i) => Param(i)
      case Ident(s) if s.equalsIgnoreCase("array") && isPunct("[") =>
        eatPunct("[")
        val items = Vector.newBuilder[Lit]
        if (!isPunct("]")) {
          items += literal()
          while (tryPunct(",")) items += literal()
        }
        eatPunct("]")
        ALit(items.result())
      case Ident(s) if s.equalsIgnoreCase("true") => BLit(true)
      case Ident(s) if s.equalsIgnoreCase("false") => BLit(false)
      case Ident(s) if s.equalsIgnoreCase("null") => NullLit
      case t => throw ParseException(s"expected literal, got $t", pos)
    }
  }

  private val SearchFuncs = Set("fts", "fuzzy", "levenshtein", "regex", "fastfuzzy")
  private val CmpOps = Set("=", ">", "<", ">=", "<=", "<>", "!=")

  def parse(sql: String): Seq[Statement] = {
    // split on top-level ';' (strings already lexed, so split tokens)
    val toks = lex(sql)
    val stmts = Vector.newBuilder[Vector[(Tok, Int)]]
    var cur = Vector.newBuilder[(Tok, Int)]
    toks.foreach {
      case (Punct(";"), _) =>
        val v = cur.result(); if (v.nonEmpty) stmts += v; cur = Vector.newBuilder
      case t => cur += t
    }
    val last = cur.result()
    if (last.nonEmpty) stmts += last
    val all = stmts.result()
    if (all.isEmpty) throw ParseException("empty statement", 0)
    all.map(ts => parseOne(new P(ts)))
  }

  private def parseOne(p: P): Statement = {
    if (p.tryKw("explain")) {
      val inner = parseOne(p)
      return Explain(inner)
    }
    val s =
      if (p.isKw("select")) parseSelect(p)
      else if (p.isKw("insert")) parseInsert(p)
      else if (p.isKw("delete")) parseDelete(p)
      else if (p.isKw("update")) parseUpdate(p)
      else if (p.isKw("create")) parseCreate(p)
      else throw ParseException("expected SELECT/INSERT/DELETE/UPDATE/CREATE", p.pos)
    if (!p.done) throw ParseException("trailing tokens", p.pos)
    s
  }

  private def parseSelect(p: P): Select = {
    p.eatKw("select")
    val cols = Vector.newBuilder[SelectCol]
    var more = true
    while (more) {
      if (p.tryPunct("*")) cols += StarCol
      else {
        val name = p.ident()
        if (name.equalsIgnoreCase("score") && p.tryPunct("(")) {
          p.eatPunct(")")
          val alias = if (p.tryKw("as")) Some(p.ident()) else None
          cols += ScoreCol(alias)
        } else if (name.equalsIgnoreCase("facet_counts") && p.tryPunct("(")) {
          val c = p.ident()
          p.eatPunct(")")
          cols += FacetCol(c)
        } else {
          val alias = if (p.tryKw("as")) Some(p.ident()) else None
          cols += NamedCol(name, alias)
        }
      }
      more = p.tryPunct(",")
    }
    p.eatKw("from")
    val table = p.ident()
    val where = if (p.tryKw("where")) parsePreds(p) else Nil
    val orderBy = if (p.tryKw("order")) {
      p.eatKw("by")
      val name = p.ident()
      val nm = if (name.equalsIgnoreCase("score") && p.tryPunct("(")) { p.eatPunct(")"); "score" } else name
      val asc = if (p.tryKw("desc")) false else { p.tryKw("asc"); true }
      Some((nm, asc))
    } else None
    val limit = if (p.tryKw("limit")) Some(p.literal() match {
      // validate at parse: Long.toInt silently WRAPS (LIMIT 2^32 would
      // return zero rows; LIMIT 2^31 would crash Spark with a negative
      // limit), and a negative literal must be a ParseException with a
      // position, not a deep AnalysisException
      case ILit(v) =>
        if (v < 0 || v > Int.MaxValue)
          throw ParseException(s"LIMIT out of range [0, ${Int.MaxValue}]: $v", p.pos)
        v.toInt
      case _ => throw ParseException("LIMIT expects an integer", p.pos)
    }) else None
    Select(cols.result(), table, where, orderBy, limit)
  }

  private def parsePreds(p: P): Seq[Pred] = {
    val preds = Vector.newBuilder[Pred]
    var more = true
    while (more) {
      preds += parsePred(p)
      more = p.tryKw("and")
    }
    preds.result()
  }

  private def parsePred(p: P): Pred = {
    val name = p.ident()
    if (SearchFuncs.contains(name.toLowerCase) && p.isPunct("(")) {
      p.eatPunct("(")
      val col = p.ident()
      p.eatPunct(",")
      val arg = p.literal()
      p.eatPunct(")")
      val cmp = p.peek match {
        case Some(Punct(op)) if CmpOps.contains(op) =>
          p.next()
          p.literal() match {
            case NLit(v) => Some((op, v))
            case ILit(v) => Some((op, v.toDouble))
            case _ => throw ParseException("search comparison expects a number", p.pos)
          }
        case _ => None
      }
      SearchPred(name.toLowerCase, col, arg, cmp)
    } else if (name.equalsIgnoreCase("score") && p.isPunct("(")) {
      p.eatPunct("("); p.eatPunct(")")
      val op = p.next() match {
        case Punct(o) if CmpOps.contains(o) => o
        case t => throw ParseException(s"expected comparison after score(), got $t", p.pos)
      }
      p.literal() match {
        case NLit(v) => ScorePred(op, v)
        case ILit(v) => ScorePred(op, v.toDouble)
        case _ => throw ParseException("score() comparison expects a number", p.pos)
      }
    } else {
      val op = p.next() match {
        case Punct(o) if CmpOps.contains(o) => o
        case t => throw ParseException(s"expected comparison, got $t", p.pos)
      }
      ColPred(name, op, p.literal())
    }
  }

  private def parseInsert(p: P): Insert = {
    p.eatKw("insert"); p.eatKw("into")
    val table = p.ident()
    p.eatPunct("(")
    val cols = Vector.newBuilder[String]
    cols += p.ident()
    while (p.tryPunct(",")) cols += p.ident()
    p.eatPunct(")")
    p.eatKw("values")
    val rows = Vector.newBuilder[Seq[Lit]]
    var more = true
    while (more) {
      p.eatPunct("(")
      val row = Vector.newBuilder[Lit]
      row += p.literal()
      while (p.tryPunct(",")) row += p.literal()
      p.eatPunct(")")
      rows += row.result()
      more = p.tryPunct(",")
    }
    Insert(table, cols.result(), rows.result())
  }

  private def parseDelete(p: P): Delete = {
    p.eatKw("delete"); p.eatKw("from")
    val table = p.ident()
    val where = if (p.tryKw("where")) parsePreds(p) else Nil
    Delete(table, where)
  }

  private def parseUpdate(p: P): Update = {
    p.eatKw("update")
    val table = p.ident()
    p.eatKw("set")
    val sets = Vector.newBuilder[(String, Lit)]
    var more = true
    while (more) {
      val c = p.ident()
      p.eatPunct("=")
      sets += ((c, p.literal()))
      more = p.tryPunct(",")
    }
    val where = if (p.tryKw("where")) parsePreds(p) else Nil
    Update(table, sets.result(), where)
  }

  private def parseCreate(p: P): CreateTable = {
    p.eatKw("create"); p.eatKw("table")
    val ifNot = if (p.tryKw("if")) { p.eatKw("not"); p.eatKw("exists"); true } else false
    val table = p.ident()
    p.eatPunct("(")
    val cols = Vector.newBuilder[ColumnDef]
    var more = true
    while (more) {
      val name = p.ident()
      val tpe = p.ident()
      val isArray = if (p.tryPunct("[")) { p.eatPunct("]"); true } else false
      var pk = false
      var notNull = false
      var default: Option[Lit] = None
      var flags = true
      while (flags) {
        if (p.tryKw("primary")) { p.eatKw("key"); pk = true }
        else if (p.tryKw("not")) { p.eatKw("null"); notNull = true }
        else if (p.tryKw("default")) default = Some(p.literal())
        else flags = false
      }
      cols += ColumnDef(name, tpe.toLowerCase, pk, notNull, default, isArray)
      more = p.tryPunct(",")
    }
    p.eatPunct(")")
    // WITH (tokenizers = ( col = 'name', ... ))  (sql.rs:110)
    var tokenizers = Map.empty[String, String]
    if (p.tryKw("with")) {
      p.eatPunct("(")
      p.eatKw("tokenizers")
      p.eatPunct("=")
      p.eatPunct("(")
      var m = true
      while (m) {
        val c = p.ident()
        p.eatPunct("=")
        val v = p.literal() match {
          case SLit(s) => s
          case _ => throw ParseException("tokenizer name must be a string", p.pos)
        }
        tokenizers += (c -> v)
        m = p.tryPunct(",")
      }
      p.eatPunct(")")
      p.eatPunct(")")
    }
    CreateTable(table, ifNot, cols.result(), tokenizers)
  }

  /** Substitute $n parameters (1-based, apis/mod.rs:51-69); array
    * literals bind their elements recursively and a parameter may bind
    * a whole array value.
    */
  def bind(l: Lit, params: Seq[Lit]): Lit = l match {
    case Param(i) =>
      if (i < 1 || i > params.length) throw ParseException(s"missing parameter $$$i", -1)
      params(i - 1)
    case ALit(items) => ALit(items.map(bind(_, params)))
    case other => other
  }
}

package graft.sqlparse

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Tokenizer + recursive-descent parser for the reference dialect.
  * Accepts the same language as the reference's indexOf-splitter
  * (sql/SQLSelect.java:154-401) including its quirks: bracketed IN
  * lists `[v1, v2]` (sql/ValueCondition.java:92-141), one boolean
  * connective kind per nesting level (sql/NestedCondition.java:366-438),
  * `SELECT STREAM`, and `PROCESS … WITHIN 'class'`.
  */
object Parser {

  // ---- tokenizer -----------------------------------------------------
  sealed trait Tok
  final case class Word(s: String) extends Tok   // identifier or keyword
  final case class Num(s: String) extends Tok
  final case class Str(s: String) extends Tok    // quoted literal, quotes stripped
  final case class Sym(s: String) extends Tok    // punctuation / operators

  def tokenize(sql: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        // '' inside a literal is an escaped quote — a safe superset of
        // the reference's indexOf splitter (there, 'O''Brien' is two
        // adjacent literals, i.e. a parse error downstream), and what
        // the remote client's literal rendering emits
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          if (sql(j) != '\'') { sb += sql(j); j += 1 }
          else if (j + 1 < n && sql(j + 1) == '\'') { sb += '\''; j += 2 }
          else { closed = true; j += 1 }
        }
        if (!closed) throw ParseException(s"unterminated string literal at $i")
        out += Str(sb.toString); i = j
      } else if (c.isDigit || (c == '-' && i + 1 < n && sql(i + 1).isDigit &&
                 (out.isEmpty || out.last.isInstanceOf[Sym]))) {
        val j = Iterator.range(i + 1, n)
          .find(k => !(sql(k).isDigit || sql(k) == '.')).getOrElse(n)
        out += Num(sql.substring(i, j)); i = j
      } else if (c.isLetter || c == '_') {
        val j = Iterator.range(i + 1, n)
          .find(k => !(sql(k).isLetterOrDigit || sql(k) == '_' || sql(k) == '$')).getOrElse(n)
        out += Word(sql.substring(i, j)); i = j
      } else if (c == '<' && i + 1 < n && (sql(i + 1) == '=' || sql(i + 1) == '>')) {
        out += Sym(sql.substring(i, i + 2)); i += 2
      } else if (c == '>' && i + 1 < n && sql(i + 1) == '=') {
        out += Sym(">="); i += 2
      } else if ("(),.[]=<>*".contains(c)) {
        out += Sym(c.toString); i += 1
      } else throw ParseException(s"unexpected character '$c' at $i")
    }
    out.toVector
  }

  // ---- parser --------------------------------------------------------
  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def done: Boolean = pos >= toks.length

    def isKw(t: Tok, kw: String): Boolean = t match {
      case Word(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def peekKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    def eatKw(kw: String): Boolean = if (peekKw(kw)) { pos += 1; true } else false
    def expectKw(kw: String): Unit =
      if (!eatKw(kw)) throw ParseException(s"expected $kw at token $pos: ${peek.getOrElse("EOF")}")
    def eatSym(s: String): Boolean = peek match {
      case Some(Sym(x)) if x == s => pos += 1; true
      case _ => false
    }
    def expectSym(s: String): Unit =
      if (!eatSym(s)) throw ParseException(s"expected '$s' at token $pos: ${peek.getOrElse("EOF")}")

    def ident(): String = next() match {
      case Word(s) => s
      case t => throw ParseException(s"expected identifier, got $t")
    }

    /** [alias.]name — dotted class names (su.interference.test.entity.Emp)
      * collapse to the last segment, matching the reference's
      * table-name resolution. */
    def colRef(): ColRef = {
      var parts = List(ident())
      while (eatSym(".")) parts = ident() :: parts
      parts match {
        case name :: Nil => ColRef(None, name)
        case name :: qual => ColRef(Some(qual.head), name)
      }
    }

    /** Multi-segment table name: keep only the simple (last) name. */
    def tableName(): String = {
      var last = ident()
      while (eatSym(".")) last = ident()
      last
    }

    private val clauseKw = Set("FROM", "WHERE", "GROUP", "ORDER", "WINDOW", "WITHIN")

    def selCol(): SelCol = {
      peek match {
        // any identifier followed by '(' is a function call: the fixed
        // built-ins plus session-registered custom aggregates (the
        // reference's F_CUSTOM slot, sql/SQLGroupFunction.java:53,60-63
        // — a dead stub there, real here; unknown names are rejected at
        // lowering time with the schema in hand)
        case Some(Word(w)) if pos + 1 < toks.length && toks(pos + 1) == Sym("(") =>
          val f = ident().toUpperCase
          expectSym("(")
          val ref = colRef()
          expectSym(")")
          val alias = peek match {
            case Some(Word(a)) if !clauseKw.contains(a.toUpperCase) => pos += 1; Some(a)
            case _ => None
          }
          SelCol(Some(f), ref, alias)
        case _ =>
          val ref = colRef()
          val alias = peek match {
            case Some(Word(a)) if !clauseKw.contains(a.toUpperCase) => pos += 1; Some(a)
            case _ => None
          }
          SelCol(None, ref, alias)
      }
    }

    def literal(): Literal = next() match {
      case Num(s) => NumLit(s.toDouble, !s.contains('.'))
      case Str(s) => StrLit(s)
      case t => throw ParseException(s"expected literal, got $t")
    }

    /** One boolean level: terms joined by a single connective kind
      * (mixing AND and OR at one level is invalid in the reference —
      * sql/NestedCondition.java:366-438 — and rejected here too). */
    def cond(): Cond = {
      val terms = ArrayBuffer(condTerm())
      var op: Option[String] = None
      var more = true
      while (more) {
        val k =
          if (eatKw("AND")) Some("AND")
          else if (eatKw("OR")) Some("OR")
          else None
        k match {
          case Some(kk) =>
            if (op.exists(_ != kk))
              throw ParseException("mixing AND and OR at one nesting level (use parentheses)")
            op = Some(kk)
            terms += condTerm()
          case None => more = false
        }
      }
      if (terms.size == 1) terms.head else BoolOp(op.get, terms.toSeq)
    }

    def condTerm(): Cond = {
      if (eatSym("(")) {
        val c = cond(); expectSym(")"); c
      } else {
        val left = colRef()
        if (eatKw("NOT")) {
          if (eatKw("IN")) inList(left, negated = true)
          else if (eatKw("LIKE")) like(left, negated = true)
          else throw ParseException("expected IN or LIKE after NOT")
        } else if (eatKw("IN")) inList(left, negated = false)
        else if (eatKw("LIKE")) like(left, negated = false)
        else {
          val op = next() match {
            case Sym(s) if Set("=", "<>", "<", ">", "<=", ">=").contains(s) => s
            case t => throw ParseException(s"expected comparison operator, got $t")
          }
          peek match {
            case Some(Num(_)) | Some(Str(_)) => Cmp(op, left, Left(literal()))
            case _ => Cmp(op, left, Right(colRef()))
          }
        }
      }
    }

    private def inList(c: ColRef, negated: Boolean): Cond = {
      // reference uses square brackets (sql/ValueCondition.java:92-141);
      // accept parentheses too.
      val close = if (eatSym("[")) "]" else { expectSym("("); ")" }
      if (peekKw("SELECT")) {
        // IN [SELECT …] subquery (reference stubs it — sql/ValueCondition.java:92-96)
        val sub = selectInner()
        expectSym(close)
        InSubquery(c, sub, negated)
      } else {
        val vs = ArrayBuffer(literal())
        while (eatSym(",")) vs += literal()
        expectSym(close)
        InList(c, vs.toSeq, negated)
      }
    }

    private def like(c: ColRef, negated: Boolean): Cond = next() match {
      case Str(s) => Like(c, s, negated)
      case t => throw ParseException(s"expected string after LIKE, got $t")
    }

    def select(): SelectStmt = {
      val stmt = selectInner()
      if (!done) throw ParseException(s"trailing tokens from ${peek.get}")
      stmt
    }

    /** One SELECT/PROCESS statement, stopping at the first token that
      * doesn't belong to it (so subqueries can be parsed in place). */
    def selectInner(): SelectStmt = {
      val isProcess = eatKw("PROCESS")
      if (!isProcess) expectKw("SELECT")
      val stream = eatKw("STREAM")
      val distinct = eatKw("DISTINCT")
      var star = false
      val cols = ArrayBuffer.empty[SelCol]
      if (eatSym("*")) star = true
      else {
        cols += selCol()
        while (eatSym(",")) cols += selCol()
      }
      expectKw("FROM")
      val tabs = ArrayBuffer.empty[TableRef]
      def tableRef(): TableRef = {
        val name = tableName()
        val alias = peek match {
          case Some(Word(a)) if !clauseKw.contains(a.toUpperCase) => pos += 1; Some(a)
          case _ => None
        }
        TableRef(name, alias)
      }
      tabs += tableRef()
      while (eatSym(",")) tabs += tableRef()

      var processWithin: Option[String] = None
      if (isProcess) {
        expectKw("WITHIN")
        processWithin = Some(next() match {
          case Str(s) => s
          case Word(s) => s
          case t => throw ParseException(s"expected processor class after WITHIN, got $t")
        })
      }
      val where = if (eatKw("WHERE")) Some(cond()) else None
      var groupBy = Seq.empty[ColRef]
      var orderBy = Seq.empty[OrderCol]
      var windowBy: Option[(ColRef, Int)] = None
      var windowPartition = Seq.empty[ColRef]
      var limit: Option[Int] = None
      var more = true
      while (more && !done) {
        if (eatKw("GROUP")) {
          expectKw("BY")
          val g = ArrayBuffer(colRef()); while (eatSym(",")) g += colRef()
          groupBy = g.toSeq
        } else if (eatKw("ORDER")) {
          expectKw("BY")
          def orderCol(): OrderCol = {
            val r = colRef()
            // ASC/DESC extension (reference is ascending-only)
            if (eatKw("DESC")) OrderCol(r, desc = true)
            else { eatKw("ASC"); OrderCol(r) }
          }
          val o = ArrayBuffer(orderCol()); while (eatSym(",")) o += orderCol()
          orderBy = o.toSeq
        } else if (eatKw("WINDOW")) {
          // WINDOW BY col INTERVAL = n (sql/CList.java:97-111), with an
          // optional PARTITION BY extension (keyed windows — scale path)
          expectKw("BY")
          val c = colRef()
          expectKw("INTERVAL"); expectSym("=")
          val n = next() match {
            case Num(s) => s.toInt
            case t => throw ParseException(s"expected window size, got $t")
          }
          windowBy = Some((c, n))
          if (eatKw("PARTITION")) {
            expectKw("BY")
            val p = ArrayBuffer(colRef()); while (eatSym(",")) p += colRef()
            windowPartition = p.toSeq
          }
        } else if (eatKw("LIMIT")) {
          // beyond-reference extension (no LIMIT in the reference grammar)
          limit = Some(next() match {
            case Num(v) => v.toInt
            case t => throw ParseException(s"expected limit count, got $t")
          })
        } else more = false
      }
      if (star && tabs.size > 1)
        throw ParseException("SELECT * is only valid for a single table") // sql/SQLSelect.java:292-301
      SelectStmt(stream, distinct, star, cols.toSeq, tabs.toSeq, where,
        groupBy, orderBy, windowBy, processWithin, windowPartition, limit)
    }
  }

  def parse(sql: String): SelectStmt = new P(tokenize(sql)).select()
}

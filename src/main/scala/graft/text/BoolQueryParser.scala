package graft.text

import graft.index.BoolSearch._

/** Recursive-descent parser for the boolean query-string surface:
  *
  * {{{  expr  := and ( OR and )*
  *      and   := unary ( [AND] unary )*     // adjacency = implicit AND
  *      unary := NOT unary | '(' expr ')' | term
  *      term  := "double quoted phrase" | bare-word  }}}
  *
  * Operators are case-sensitive upper-case words (a lower-case `and`
  * is a search term — corpus text is lowercased before matching, so
  * upper-case operator words can never collide with a bare term a user
  * actually needs; a literal AND is expressible as `"and"`). Quoted
  * terms may contain spaces and parens; `\"` escapes a quote inside.
  */
object BoolQueryParser {

  def parse(s: String): Bq = {
    val p = new P(tokenize(s))
    val e = p.expr()
    require(p.eof, s"trailing tokens in boolean query: $s")
    e
  }

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private final case class TTerm(t: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case '"' =>
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < s.length && !closed) {
            val c = s.charAt(i)
            if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == '"') {
              sb += '"'; i += 2
            } else if (c == '"') { closed = true; i += 1 }
            else { sb += c; i += 1 }
          }
          require(closed, s"unterminated quote in boolean query: $s")
          out += TTerm(sb.toString)
        case _ =>
          val j0 = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            s.charAt(i) != '(' && s.charAt(i) != ')' &&
            s.charAt(i) != '"') i += 1
          s.substring(j0, i) match {
            case "AND" => out += TAnd
            case "OR"  => out += TOr
            case "NOT" => out += TNot
            case w     => out += TTerm(w)
          }
      }
    }
    out.result()
  }

  private final class P(var ts: List[Tok]) {
    def eof: Boolean = ts.isEmpty
    private def peek: Option[Tok] = ts.headOption
    private def next(): Tok = {
      val h = ts.head; ts = ts.tail; h
    }

    def expr(): Bq = {
      var l = and()
      val arms = List.newBuilder[Bq]
      arms += l
      while (peek.contains(TOr)) { next(); arms += and() }
      val as = arms.result()
      if (as.size == 1) as.head else Or(as)
    }

    private def and(): Bq = {
      val arms = List.newBuilder[Bq]
      arms += unary()
      // adjacency is implicit AND (`black and white` = three terms
      // conjoined — the standard search-box convention)
      var more = true
      while (more) peek match {
        case Some(TAnd) => next(); arms += unary()
        case Some(TNot) | Some(LP) | Some(TTerm(_)) => arms += unary()
        case _ => more = false
      }
      val as = arms.result()
      if (as.size == 1) as.head else And(as)
    }

    private def unary(): Bq = peek match {
      case Some(TNot) => next(); Not(unary())
      case Some(LP) =>
        next()
        val e = expr()
        require(peek.contains(RP), "missing ')' in boolean query")
        next()
        e
      case Some(TTerm(t)) => next(); Term(t)
      case other =>
        throw new IllegalArgumentException(
          s"unexpected token $other in boolean query")
    }
  }
}

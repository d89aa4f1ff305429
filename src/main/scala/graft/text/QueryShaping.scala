package graft.text

/** Query shaping for substring probes.
  *
  * The reference bounds index-probe cost on long queries: it keeps only
  * the last `token_viable_limit` tokens of the query for the FM probe
  * (reference: src/lava/substring/search.rs:512-524) and, for sampled
  * indexes, issues one sub-query per offset residue
  * (reference: search.rs:493-507). Both preserve correctness because a
  * probe on a SUBSET of the query's grams yields a candidate SUPERSET —
  * the mandatory refine restores exactness.
  *
  * The gram analogue here: cap the number of distinct grams used for
  * the posting probe. Fewer grams = fewer pruned-partition reads and a
  * cheaper intersection, at the cost of more candidates to refine.
  */
object QueryShaping {

  val DefaultGramLimit = 24

  /** Keep at most `limit` grams, preferring the LAST ones (the
    * reference keeps the query's token suffix). Deterministic.
    */
  def viableGrams(grams: Seq[String], limit: Int = DefaultGramLimit): Seq[String] =
    if (grams.size <= limit) grams else grams.takeRight(limit)

  /** Maximal literal runs every match of `pattern` MUST contain —
    * the prune keys that let a regex query ride the substring index
    * (the log-grep accelerant: probe the index for the required
    * literals, regex-refine only the candidate row groups).
    *
    * Conservative single-pass scan over Java-regex syntax. Any
    * construct it does not fully model only WEAKENS the result toward
    * fewer/shorter literals — a candidate SUPERSET, never unsound
    * pruning:
    *   - groups `(...)` are skipped whole (their content may be
    *     optional or alternated, so nothing inside is required);
    *   - classes `[...]`, `.`, class escapes (`\d` `\w` `\s` …,
    *     upper-case negations, back-references) break the current run;
    *   - `?` `*` `{m,n}` drop the preceding char from its run (it may
    *     match zero times / a different count); `+` keeps it (at least
    *     once) but ends the run (repeats may follow);
    *   - escaped punctuation (`\.` `\+` …) is a literal char;
    *   - a TOP-LEVEL `|` means no literal is required at all → `Nil`
    *     (callers fall back to the scan-and-refine path).
    */
  def requiredLiterals(pattern: String): Seq[String] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(dropLast: Boolean): Unit = {
      if (dropLast && cur.nonEmpty) cur.setLength(cur.length - 1)
      if (cur.nonEmpty) runs += cur.toString
      cur.setLength(0)
    }
    val n = pattern.length
    // consume one quantifier (incl. reluctant/possessive suffix)
    def skipQuant(j0: Int): Int = {
      var j = j0
      if (j < n && (pattern(j) == '?' || pattern(j) == '*' ||
          pattern(j) == '+')) j += 1
      else if (j < n && pattern(j) == '{') {
        while (j < n && pattern(j) != '}') j += 1
        if (j < n) j += 1
      } else return j0
      if (j < n && (pattern(j) == '?' || pattern(j) == '+')) j += 1
      j
    }
    var i = 0
    while (i < n) {
      pattern(i) match {
        case '|' => return Nil // top-level alternation: nothing required
        case '(' =>
          var depth = 0; var inClass = false; var j = i
          while (j < n && (depth > 0 || j == i)) {
            pattern(j) match {
              case '\\' => j += 1
              case '[' if !inClass => inClass = true
              case ']' if inClass => inClass = false
              case '(' if !inClass => depth += 1
              case ')' if !inClass => depth -= 1
              case _ =>
            }
            j += 1
          }
          flush(dropLast = false)
          i = skipQuant(j)
        case '[' =>
          var j = i + 1
          if (j < n && pattern(j) == '^') j += 1
          if (j < n && pattern(j) == ']') j += 1 // leading ] is literal
          while (j < n && pattern(j) != ']') {
            if (pattern(j) == '\\') j += 1
            j += 1
          }
          flush(dropLast = false)
          i = skipQuant(j + 1)
        case '.' =>
          flush(dropLast = false)
          i = skipQuant(i + 1)
        case '^' | '$' =>
          flush(dropLast = false); i += 1
        case '?' | '*' | '{' =>
          flush(dropLast = true)
          i = skipQuant(i)
        case '+' =>
          flush(dropLast = false)
          i = skipQuant(i)
        case '\\' =>
          if (i + 1 >= n) { flush(dropLast = false); i += 1 }
          else if (pattern(i + 1).isLetterOrDigit) {
            // class escape / anchor / back-reference — not a literal
            flush(dropLast = false)
            i = skipQuant(i + 2)
          } else { cur.append(pattern(i + 1)); i += 2 }
        case c =>
          cur.append(c); i += 1
      }
    }
    flush(dropLast = false)
    runs.toSeq
  }

  /** Shape-based routing of a raw search-box string to a query MODE:
    *   - "bool"  — contains a quoted phrase or a stand-alone upper-case
    *     operator word (AND/OR/NOT; lower-case stays a plain term, the
    *     [[BoolQueryParser]] convention);
    *   - "regex" — contains a regex metacharacter beyond '.' (a bare
    *     dot in prose should stay a literal contains) AND compiles;
    *   - "exact" — everything else (plain contains; callers may retry
    *     typo-tolerant when exact finds nothing).
    * Deterministic and purely lexical — the runtime fuzzy fallback is
    * the caller's decision because it depends on RESULTS, not shape.
    */
  def routeOf(q: String): String = {
    val boolOp = "(^|\\s)(AND|OR|NOT)(\\s|$)".r
    if (q.contains('"') || boolOp.findFirstIn(q).isDefined) "bool"
    else if (q.exists(c => "[](){}|*+?^$\\".indexOf(c.toInt) >= 0) &&
      scala.util.Try(java.util.regex.Pattern.compile(q)).isSuccess)
      "regex"
    else "exact"
  }

  /** [[routeOf]] with the search-box ESCAPE and degradation rules the
    * raw lexical router can't carry — returns (mode, effective query):
    *   - a query that is entirely ONE quoted phrase
    *     (`"TO BE OR NOT TO BE"`) means exact-contains of the INNER
    *     text: quoting is how a user escapes operator words and regex
    *     metacharacters, so the quotes route exact and are stripped
    *     (lower-case operators were already literal — this closes the
    *     upper-case hole);
    *   - a bool-shaped query that does NOT parse (unbalanced quote like
    *     `5'6" tall`, trailing operator like `x AND`) is raw prose, not
    *     a malformed boolean program — it degrades to exact with the
    *     original string, mirroring routeOf's regex compile guard;
    *   - every other query keeps routeOf's mode, string unchanged (the
    *     regex mode's literal-only lowercasing happens later, in
    *     [[smartRegexForm]] — route() itself never rewrites the
    *     pattern).
    * Invariant (RoutingFuzzSpec): the routed result is always ⊆ the
    * union of the individual mode results for the same string.
    */
  /** The pattern form smartSearch's regex route matches against
    * `lower(column)`: LITERAL characters are lowercased — so
    * `Customer#\d+` finds customer rows on the lowered column — while
    * every regex construct survives untouched: escape pairs (`\W`
    * must not become `\w`), `\Q…\E` markers (content inside IS
    * literal and lowers), inline group prefixes after `(?` (flags,
    * names, lookaround markers, copied verbatim through their closing
    * `:`/`)`/`=`/`!`/`>`), `\p{…}`/`\P{…}` property names, and
    * `\k<…>` backreference names. Character-class content lowers
    * (`[A-Z]` → the intended `[a-z]`, matching the simple-pattern
    * behavior). If the transform ever produced a non-compiling form
    * for a compiling input, the original passes verbatim — never
    * worse than the pre-transform behavior.
    */
  def smartRegexForm(p: String): String = {
    if (!p.contains('\\') && !p.contains("(?")) return Text.sparkLower(p)
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = {
      out.append(Text.sparkLower(lit.toString)); lit.setLength(0)
    }
    def copyThrough(i0: Int, stops: String): Int = {
      var i = i0
      while (i < p.length && stops.indexOf(p.charAt(i)) < 0) {
        out.append(p.charAt(i)); i += 1
      }
      if (i < p.length) { out.append(p.charAt(i)); i += 1 }
      i
    }
    var i = 0
    var inQ = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (inQ) {
        if (c == '\\' && i + 1 < p.length && p.charAt(i + 1) == 'E') {
          flush(); out.append("\\E"); i += 2; inQ = false
        } else { lit.append(c); i += 1 }
      } else if (c == '\\' && i + 1 < p.length) {
        val e = p.charAt(i + 1)
        flush()
        if (e == 'Q') { out.append("\\Q"); inQ = true; i += 2 }
        else {
          out.append(c).append(e); i += 2
          // verbatim tails whose case is load-bearing: \p{Lu} / \P{Lu}
          // property names, \k<Name> backreference names
          if ((e == 'p' || e == 'P') && i < p.length && p.charAt(i) == '{')
            i = copyThrough(i, "}")
          else if (e == 'k' && i < p.length && p.charAt(i) == '<')
            i = copyThrough(i, ">")
        }
      } else if (c == '(' && i + 1 < p.length && p.charAt(i + 1) == '?') {
        flush(); out.append("(?"); i = copyThrough(i + 2, ":)=!>")
      } else { lit.append(c); i += 1 }
    }
    flush()
    val form = out.toString
    if (scala.util.Try(java.util.regex.Pattern.compile(form)).isSuccess)
      form
    else p
  }

  def route(q: String): (String, String) = {
    val t = q.trim
    val inner = t.drop(1).dropRight(1)
    if (t.length >= 2 && t.head == '"' && t.last == '"' &&
        !inner.contains('"')) ("exact", inner)
    else routeOf(q) match {
      case "bool"
          if scala.util.Try(BoolQueryParser.parse(q)).isFailure =>
        ("exact", q)
      case m => (m, q)
    }
  }
}

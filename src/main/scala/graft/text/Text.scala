package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the substring/BM25 indexes, the
  * dedup suite and the text-analysis operators.
  *
  * Tokenization mirrors the reference's lowercase-then-split scheme
  * (reference: src/lava/bm25/tokenizer_utils.rs:14-34 uses a trained
  * tokenizer; src/lava/substring/build.rs:420-437 lowercases and drops a
  * punctuation SKIP set — reference: src/lava/substring/constants.rs:2).
  * We use a deterministic regex tokenizer (`[^a-z0-9]+` delimiters) so the
  * exact same semantics are expressible in ANSI SQL for the DuckDB oracle.
  *
  * Everything here is `org.apache.spark.sql.functions` composition — no
  * UDFs — so it stays inside whole-stage codegen.
  */
object Text {
  val TokenDelim = "[^a-z0-9]+"

  /** Lowercased word tokens, empty strings removed.
    *
    * `array_remove` rather than the `filter` higher-order function:
    * HOFs are CodegenFallback (interpreted per row with an InternalRow
    * wrap), while ArrayRemove participates in whole-stage codegen, and
    * this expression sits on the hot path of every tokenizing operator.
    * Equivalent on split output: both drop exactly the "" elements in
    * order (split never yields null elements, the one case where the
    * two differ).
    */
  def tokens(c: Column): Column =
    array_remove(split(lower(c), TokenDelim), "")

  /** Pluggable tokenizer seam: the reference parameterizes BM25 with a
    * trained HF tokenizer (reference: src/lava/tokenizer_utils.rs:14-34,
    * default bert-base-uncased). An implementation must keep both sides
    * — the column form used at build and the driver form used on query
    * strings — semantically identical, or index and query vocabularies
    * diverge. The default is the deterministic regex scheme, chosen so
    * the DuckDB oracle can express the exact same tokenization.
    */
  trait Tokenizer extends Serializable {
    /** Token array column (build side). */
    def tokenize(c: Column): Column
    /** Tokens of a query string (driver side, same semantics). */
    def tokenizeQuery(q: String): Seq[String]
    /** DuckDB list expression producing exactly [[tokenize]]'s token
      * stream from `column` — the oracle side of the seam.
      */
    def oracleListExpr(column: String): String
    /** Stable discriminator mixed into index-kind names so two
      * tokenizations of the same column register as DIFFERENT indexes
      * in one lake (empty = the default regex scheme).
      */
    def id: String = ""
  }

  object RegexTokenizer extends Tokenizer {
    def tokenize(c: Column): Column = tokens(c)
    def tokenizeQuery(q: String): Seq[String] =
      sparkLower(q).split(TokenDelim).filter(_.nonEmpty).toSeq
    def oracleListExpr(column: String): String =
      s"list_filter(string_split_regex(lower($column), '$TokenDelim'), t -> t <> '')"
  }

  /** Subword (wordpiece-style) tokenizer over a FIXED in-repo vocab —
    * the stand-in for the reference's trained HF wordpiece
    * (reference: src/lava/bm25/tokenizer_utils.rs:14-34, default
    * bert-base-uncased; the trained vocab is an external artifact, so
    * a deterministic curated one stands in, exactly like the vocab-
    * embedding table stands in for the expansion model).
    *
    * Greedy longest-match-first segmentation — wordpiece's algorithm —
    * is expressed as ONE regex: an alternation of the vocab pieces
    * sorted by length descending with a single-char fallback. A regex
    * scan consumes, at each position, the first alternative that
    * matches = the longest vocab piece, then continues after it; for
    * an alternation of literals this is identical under leftmost-first
    * (java.util.regex, which Spark's regexp_extract_all uses) AND
    * leftmost-longest (POSIX) semantics, so Spark, the driver, and
    * DuckDB (RE2) produce bit-identical token streams from one shared
    * pattern string. Unknown characters fall back to single-symbol
    * tokens (wordpiece-with-saturated-char-vocab behavior; no `##`
    * continuation marking — BM25 only needs a stable vocabulary).
    */
  object SubwordTokenizer extends Tokenizer {
    /** Curated subword pieces: common English words, affixes, and
      * technical fragments. Lowercase a-z only (no regex
      * metacharacters, enforced below).
      */
    val Vocab: Seq[String] = Seq(
      // common whole words
      "the", "and", "that", "with", "this", "from", "have", "not",
      "for", "are", "was", "were", "you", "all", "can", "will",
      "one", "out", "about", "which", "when", "there", "their",
      "what", "more", "other", "into", "time", "than", "some",
      "very", "just", "over", "also", "after", "most", "only",
      // technical / corpus-frequent fragments
      "vector", "stream", "data", "index", "search", "merge", "dup",
      "batch", "spark", "query", "table", "file", "row", "column",
      "text", "doc", "log", "event", "user", "value", "count",
      "build", "read", "write", "scan", "join", "group", "sort",
      "filter", "page", "key", "hash", "graph", "node", "token",
      // prefixes
      "un", "re", "pre", "dis", "non", "anti", "inter", "trans",
      "sub", "super", "over", "under", "multi", "micro", "semi",
      "com", "con", "pro", "per", "ex", "de", "en",
      // suffixes
      "ing", "tion", "sion", "ation", "ization", "ment", "ness",
      "able", "ible", "ally", "ful", "less", "ous", "ive", "ize",
      "ise", "ity", "ant", "ent", "est", "ed", "er", "es", "ly",
      "al", "ic", "en")
      .distinct

    /** One shared pattern: pieces length-desc (ties lexicographic —
      * equal-length literals can't both match, so ties only pin
      * determinism of the pattern STRING), then the single-symbol
      * fallback. Escape-free by construction.
      */
    val Pattern: String = {
      require(Vocab.forall(_.matches("[a-z]+")),
        "subword vocab must be lowercase a-z only (regex-literal safe)")
      Vocab.sortBy(p => (-p.length, p)).mkString("(?:", "|", "|[a-z0-9])")
    }

    private lazy val compiled = java.util.regex.Pattern.compile(Pattern)

    def tokenize(c: Column): Column =
      regexp_extract_all(lower(c), lit(Pattern), lit(0))

    def tokenizeQuery(q: String): Seq[String] = {
      val m = compiled.matcher(sparkLower(q))
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }

    def oracleListExpr(column: String): String =
      s"regexp_extract_all(lower($column), '$Pattern')"

    override def id: String = "sub"
  }

  /** Driver-side lowercase with EXACTLY Spark's `lower()` semantics:
    * the Lower expression evaluates `UTF8String.toLowerCase`, so
    * calling the same function makes query normalization bit-identical
    * to the indexed text at ANY JVM default locale (`Locale.ROOT`
    * fixed the ASCII Turkish-I hazard but Spark's own non-ASCII slow
    * path doesn't use ROOT — only sharing the implementation removes
    * the divergence entirely).
    */
  def sparkLower(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString

  /** One string per code point (surrogate pairs stay joined) — the
    * driver-side mirror of Spark's string functions, which index CODE
    * POINTS (UTF8String.numChars/substring). Driver-side query shaping
    * must use these, never UTF-16 `String#length`/`sliding`, or a
    * supplementary character (emoji) splits into lone surrogates that
    * match nothing built Spark-side.
    */
  def codePoints(s: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      out += s.substring(i, i + w)
      i += w
    }
    out.result()
  }

  /** Code-point n-gram windows of `s` — the driver-side mirror of
    * [[charNgrams]] (empty when `s` has fewer than `n` code points).
    */
  def cpGrams(s: String, n: Int): Seq[String] = {
    val cps = codePoints(s)
    if (cps.length < n) Seq.empty
    else cps.sliding(n).map(_.mkString).toSeq
  }

  /** Token count (whitespace/punctuation-delimited). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Character n-grams of the lowercased string (starts 0..len-n
    * inclusive, so the final gram is included; empty array when the
    * string is shorter than n — `sequence` with a negative upper bound
    * would count DOWN, so the short case must be guarded).
    */
  def charNgrams(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(length(lc) >= n,
      array_distinct(transform(sequence(lit(0), length(lc) - n),
        i => substring(lc, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word k-shingles (k consecutive tokens joined by one
    * space); empty array when fewer than k tokens.
    */
  def wordShingles(c: Column, k: Int): Column = {
    val ts = tokens(c)
    when(size(ts) >= k,
      array_distinct(transform(sequence(lit(0), size(ts) - k),
        i => concat_ws(" ", slice(ts, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of non-alphanumeric, non-whitespace chars (punctuation). */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[a-zA-Z0-9\\s]", ""))

  /** Normalized text: lowercased, runs of whitespace collapsed, trimmed. */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic document fingerprint over normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Small per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny and deterministic so the
    * DuckDB oracle can replicate scoring exactly.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit"))

  /** English stopwords for quality scoring. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
}

package graft.functions

/** Text-level front-end for the ClickHouse-isms Spark's PARSER rejects
  * before the function registry can help (SURVEY §2B B21 — the raw-SQL
  * passthrough surface):
  *
  *  - `dateDiff('day', a, b)` — Spark's grammar reserves
  *    dateDiff/timestampdiff and demands an UNQUOTED unit, so the
  *    registered alias is unreachable; rewritten to `chDateDiff(...)`,
  *    a registry function with ClickHouse's boundary-crossing
  *    semantics (Spark's own datediff counts elapsed units). The
  *    rewrite requires a quoted first argument AND exactly three
  *    top-level arguments — Spark's two-arg `datediff('2024-01-05',
  *    d)` (a string DATE, not a unit) passes through untouched.
  *  - curried parameterized aggregates `quantile(0.5)(x)`,
  *    `quantiles(0.25, 0.75)(x)`, `quantileExact(0.9)(x)`,
  *    `medianExact()(x)`, `topK(3)(x)` — ClickHouse's `agg(params)
  *    (args)` call shape has no Spark grammar; flattened to
  *    `chQuantile(0.5, x)` etc.
  *  - bare `count()` — ClickHouse allows it; Spark wants `count(*)`.
  *
  * The rewrite is purely lexical but STRING- and COMMENT-SAFE:
  * single-quoted, double-quoted, and backquoted spans, `--` line
  * comments, and `/* */` block comments are copied verbatim, so a
  * literal like 'quantile(0.5)(x)' or an apostrophe inside a comment
  * never derails the scan. Everything else — names, structure,
  * whitespace — passes through unchanged, which keeps the transform
  * auditable (the rewritten SQL is valid Spark SQL a user could have
  * written by hand).
  *
  * Wired in two ways: [[ChCompat.sql]] for code paths, and
  * [[graft.GraftExtensions]]'s injected parser so any
  * `spark.sql.extensions`-configured session gets it transparently.
  */
object ChSqlRewrite {

  /** aggregates using ClickHouse's curried `name(params)(args)` shape,
    * mapped to flat registry functions `chName(params…, args…)`
    */
  private val curried = Map(
    "quantile" -> "chQuantile",
    "quantileExact" -> "chQuantileExact",
    "quantiles" -> "chQuantiles",
    "medianExact" -> "chMedianExact",
    "quantilesExact" -> "chQuantilesExact",
    "topK" -> "chTopK")

  def apply(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length

    def copyQuoted(quote: Char): Unit = {
      out += sql.charAt(i); i += 1
      while (i < n) {
        val c = sql.charAt(i); out += c; i += 1
        if (c == '\\' && quote != '`' && i < n) { out += sql.charAt(i); i += 1 }
        else if (c == quote) return
      }
    }

    /** at a comment opener? 0 if not, else its kind (1 line, 2 block) */
    def commentKind(s: String, j: Int): Int =
      if (j + 1 >= s.length) 0
      else if (s.charAt(j) == '-' && s.charAt(j + 1) == '-') 1
      else if (s.charAt(j) == '/' && s.charAt(j + 1) == '*') 2
      else 0

    /** index just past the comment starting at `j` */
    def commentEnd(s: String, j: Int, kind: Int): Int =
      if (kind == 1) {
        val e = s.indexOf('\n', j); if (e < 0) s.length else e + 1
      } else {
        val e = s.indexOf("*/", j + 2); if (e < 0) s.length else e + 2
      }

    /** index just past the ')' matching the '(' at `from`, skipping
      * quoted spans and comments; -1 if unbalanced
      */
    def matchParen(from: Int): Int = {
      var j = from; var depth = 0
      while (j < n) {
        val ck = commentKind(sql, j)
        if (ck != 0) j = commentEnd(sql, j, ck)
        else {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) return j + 1
            case q @ ('\'' | '"' | '`') =>
              j += 1
              while (j < n && sql.charAt(j) != q) {
                if (sql.charAt(j) == '\\' && q != '`') j += 1
                j += 1
              }
            case _ =>
          }
          j += 1
        }
      }
      -1
    }

    /** number of top-level (depth-1) comma-separated arguments of the
      * paren group starting at `from`; -1 if unbalanced. Empty group
      * counts 0.
      */
    def topLevelArgs(from: Int): Int = {
      val end = matchParen(from)
      if (end < 0) return -1
      var j = from; var depth = 0; var commas = 0; var sawToken = false
      while (j < end) {
        val ck = commentKind(sql, j)
        if (ck != 0) j = commentEnd(sql, j, ck)
        else {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => commas += 1
            case q @ ('\'' | '"' | '`') =>
              sawToken = true
              j += 1
              while (j < end && sql.charAt(j) != q) {
                if (sql.charAt(j) == '\\' && q != '`') j += 1
                j += 1
              }
            case c if !c.isWhitespace && depth >= 1 => sawToken = true
            case _ =>
          }
          j += 1
        }
      }
      if (!sawToken) 0 else commas + 1
    }

    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'

    while (i < n) {
      val ck = commentKind(sql, i)
      if (ck != 0) {
        val e = commentEnd(sql, i, ck)
        out ++= sql.substring(i, e); i = e
      } else sql.charAt(i) match {
        case q @ ('\'' | '"' | '`') => copyQuoted(q)
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < n && isIdent(sql.charAt(i))) i += 1
          val word = sql.substring(start, i)
          // lookahead past whitespace for '('
          var j = i
          while (j < n && sql.charAt(j).isWhitespace) j += 1
          val lower = word.toLowerCase
          if (j < n && sql.charAt(j) == '(' &&
              (start == 0 || !isIdent(sql.charAt(start - 1)))) {
            if (lower == "datediff" || lower == "date_diff") {
              // only the CH form: quoted first arg AND 3-4 args (the
              // 4th is CH's optional timezone) — Spark's 2-arg
              // datediff('2024-01-05', d) passes through
              var k = j + 1
              while (k < n && sql.charAt(k).isWhitespace) k += 1
              val nargs = topLevelArgs(j)
              if (k < n && sql.charAt(k) == '\'' &&
                  (nargs == 3 || nargs == 4)) {
                out ++= "chDateDiff"; i = j
              } else out ++= word
            } else if (lower == "count") {
              // count() -> count(*)
              var k = j + 1
              while (k < n && sql.charAt(k).isWhitespace) k += 1
              if (k < n && sql.charAt(k) == ')') {
                out ++= "count(*)"; i = k + 1
              } else out ++= word
            } else curried.get(word) match {
              case Some(flat) =>
                val endParams = matchParen(j)
                var k = endParams
                while (k >= 0 && k < n && sql.charAt(k).isWhitespace) k += 1
                if (endParams > 0 && k >= 0 && k < n && sql.charAt(k) == '(') {
                  val endArgs = matchParen(k)
                  if (endArgs > 0) {
                    val params = sql.substring(j + 1, endParams - 1).trim
                    val args = sql.substring(k + 1, endArgs - 1).trim
                    val glue = if (params.isEmpty) "" else ", "
                    // params and args are copied verbatim (they are
                    // expressions; nested CH-isms inside them are rare
                    // and would need a second pass)
                    out ++= s"$flat($params$glue$args)"
                    i = endArgs
                  } else out ++= word
                } else out ++= word
              case None => out ++= word
            }
          } else out ++= word
        case c => out += c; i += 1
      }
    }
    out.toString
  }
}

package graft.functions

/** Text-level front-end for the ClickHouse-isms Spark's PARSER rejects
  * (or silently mis-parses) before the function registry can help
  * (SURVEY §2B B21 — the raw-SQL passthrough surface):
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
  *  - `position(haystack, needle[, start])` / `extract(haystack, re)`
  *    — CH names that COLLIDE with Spark built-ins of different
  *    semantics; rewritten to `chPosition`/`chExtract` in their
  *    comma-form (≥2 top-level arguments). The SQL-standard shapes
  *    `POSITION(x IN y)` and `EXTRACT(YEAR FROM ts)` have ONE
  *    top-level argument (no comma) and pass through to the Spark
  *    built-ins unchanged. The comma-form `position(a, b)` is
  *    genuinely ambiguous (Spark reads (substr, str), CH reads
  *    (haystack, needle)) and this front-end resolves it with CH
  *    semantics — the documented divergence of opting into the
  *    dialect; `extract`'s comma-form has no Spark reading at all
  *    (the built-in only accepts `unit FROM source`), so that rewrite
  *    loses nothing.
  *  - `FROM <table> FINAL` — ReplacingMergeTree's read-time dedup
  *    (reference: app/service/log_importer.ts:120-127 declares the
  *    engine; a CH user's first query against it is `… FROM events
  *    FINAL`). Rewritten to a row_number-window dedup subquery over
  *    the table's REGISTERED key/version declaration
  *    ([[registerReplacing]]) — the same contract as
  *    [[graft.operators.Dedup.replacingDedup]]. Without the rewrite
  *    Spark silently parses FINAL as a table alias.
  *  - `LIMIT n BY col, …` — CH's per-group top-n clause; rewritten to
  *    a row_number window over the base query partitioned by the BY
  *    columns and ordered by the query's ORDER BY (top-level
  *    statements only; a nested LIMIT BY fails to parse rather than
  *    mis-executing). Related LIMIT forms: `LIMIT offset, count` →
  *    `LIMIT count OFFSET offset`; `LIMIT n WITH TIES` → a rank()
  *    window cut; `SELECT DISTINCT ON (cols)` → `LIMIT 1 BY cols`
  *    (CH's own documented equivalence).
  *  - `ANY [LEFT|INNER] JOIN r USING (k)` / `… ON l.k = r.k [AND …]`
  *    — at most one right row per key; the right side dedups by the
  *    USING columns or by the equality key set extracted from an
  *    all-equality ON (other ON shapes pass through to fail loudly —
  *    dedup-by-key is only equivalent when matching is
  *    key-determined).
  *  - `ASOF [LEFT|INNER] JOIN r ON l.k = r.k AND l.t >= r.t` — the
  *    closest-time match. The right side is interval-ized with a
  *    `lead(t)` window so the join stays a single-match EQUI-join
  *    (see [[rewriteAsofJoin]]); unsupported ASOF shapes throw rather
  *    than pass through (Spark would mis-parse `ASOF` as an alias and
  *    silently return the many-match join).
  *  - `PREWHERE cond` — merged into WHERE (Catalyst's pushdown
  *    delivers the scan-level filtering PREWHERE hand-specifies).
  *  - `GROUP BY … WITH TOTALS` → `GROUPING SETS ((cols), ())`.
  *  - `SAMPLE 0.1` (fraction form) → seeded `TABLESAMPLE`.
  *  - trailing `SETTINGS k = v` / `FORMAT X` clauses are stripped.
  *  - `[LEFT] ARRAY JOIN item, …` — CH's unnest clause. A single item
  *    becomes an `explode`/`explode_outer` in a derived table; multiple
  *    items zip in LOCKSTEP (CH's parallel-array contract, NOT a cross
  *    product) via one `explode(arrays_zip(…))`. A bare column item
  *    shadows the source column (CH semantics); `expr AS alias` keeps
  *    it. LEFT ARRAY JOIN emits NULL for empty arrays where CH emits
  *    the element type's default — NULL is the honest Spark spelling.
  *  - generic `-If` aggregate combinators — `argMaxIf(a, v, cond)` and
  *    friends become `argMax(a, v) FILTER (WHERE cond)`, the exact
  *    SQL-standard spelling of CH's conditional-aggregate contract,
  *    for every registry aggregate whose builder root is a plain
  *    aggregate (the hand-tuned sumIf/countIf/… family keeps its
  *    registered builders and is not touched here).
  *  - `GLOBAL` / `ALL` join-strictness prefixes are dropped: GLOBAL is
  *    a CH distributed-shipping hint (Catalyst's planner owns that
  *    choice here) and ALL JOIN is CH's spelling of the default join
  *    multiplicity. `UNION ALL` is untouched (ALL only drops when a
  *    join keyword follows).
  *  - `numbers(n)` / `numbers(offset, n)` table function → a derived
  *    table over Spark's `range`, aliased `numbers(number)`.
  *  - `[a, b, …]` array literals → `array(a, b, …)`, keeping
  *    subscripts (`arr[1]`, `m['k']`, `f(x)[0]`) untouched by
  *    looking at what precedes the bracket.
  *  - `ORDER BY x [DESC] WITH FILL FROM a TO b [STEP s]` — a generated
  *    spine FULL-joined to the statement; fill rows carry NULL in the
  *    other columns (CH emits type defaults — NULL is the honest Spark
  *    spelling). Explicit-bounds single-column form, either direction.
  *
  * The rewrite is purely lexical but STRING- and COMMENT-SAFE:
  * single-quoted, double-quoted, and backquoted spans (including
  * doubled-quote escapes `'it''s'` and backslash escapes), `--` line
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
    // the TDigest/Timing estimators carry the same approximate
    // contract as quantile — the exact interpolating aggregate is a
    // valid implementation of all of them
    "quantileTDigest" -> "chQuantile",
    "quantileTiming" -> "chQuantile",
    "quantilesTDigest" -> "chQuantiles",
    "uniqUpTo" -> "chUniqUpTo",
    "topK" -> "chTopK",
    "topKWeighted" -> "chTopKWeighted",
    "quantileDeterministic" -> "chQuantileDet",
    "groupArraySample" -> "chGroupArraySample",
    "windowFunnel" -> "chWindowFunnel",
    "sequenceMatch" -> "chSequenceMatch",
    "sequenceCount" -> "chSequenceCount")

  /** A ReplacingMergeTree-style declaration for `FROM t FINAL`: the
    * dedup key columns and the version ORDER BY expression (SQL text —
    * highest version wins, e.g. "from_api" or "struct(from_api, id)").
    */
  final case class ReplacingDecl(keys: Seq[String], versionSql: String)

  /** lowercased table name -> declaration consulted by the FINAL
    * rewrite. The ingest events table ships pre-registered with its
    * reference key (EventsSchema.orderByKey, version (from_api, id) —
    * the exact [[graft.ingest.EventsWriter.dedup]] contract).
    */
  private val replacingDecls =
    scala.collection.concurrent.TrieMap[String, ReplacingDecl](
      "events" -> ReplacingDecl(graft.ingest.EventsSchema.orderByKey,
        "struct(from_api, id)"))

  /** The registered FINAL dedup contract for a table, if any
    * (consulted by `FROM t FINAL` here and `OPTIMIZE TABLE t FINAL`
    * in [[ChMutations]]).
    */
  def replacingDecl(table: String): Option[ReplacingDecl] =
    replacingDecls.get(table.toLowerCase)

  /** Declare (or replace) a table's FINAL dedup contract. */
  def registerReplacing(table: String, keys: Seq[String],
      versionSql: String): Unit =
    replacingDecls.put(table.toLowerCase, ReplacingDecl(keys, versionSql))

  /** Rewrites a bare EXPRESSION fragment (a mutation's WHERE or SET
    * expression — no clauses to find): only the function-name layer
    * (curried aggregates, colliding names, dateDiff) applies.
    */
  def rewriteExpr(e: String): String = rewriteFunctions(e)

  def apply(sql: String): String =
    rewriteFunctions(rewriteLimitBy(rewriteLimitTies(rewriteDistinctOn(
      rewriteLimitOffset(rewriteWithTotals(rewriteArrayJoin(
      rewriteFinal(rewriteNumbers(rewriteAsofJoin(rewriteAnyJoinOn(
        rewriteAnyJoin(
        rewriteUsingParens(rewriteSample(rewritePrewhere(rewriteWithFill(
          stripGlobalAll(stripSettingsFormat(
            rewriteSystemTables(rewriteScalarWith(
              rewriteArrayLiterals(rewriteCastTypes(sql))))))))))))))))))))))

  // ---------------------------------------------------------------
  // CH type names in casts: CAST(x AS Float64) / x::UInt32
  // ---------------------------------------------------------------

  /** ClickHouse scalar type name → Spark SQL type, for the two cast
    * spellings. Case-SENSITIVE on purpose: CH spells types with this
    * exact casing, and a case-blind match would rewrite legitimate
    * lower-case Spark type names or aliases. The `AS <type>` form is
    * only rewritten when the innermost open paren was opened by a
    * CAST-family keyword — so `SELECT x AS String` aliases survive
    * even as the last item of a parenthesized subquery.
    */
  private val chCastTypes: Map[String, String] = Map(
    "UInt8" -> "SMALLINT", "UInt16" -> "INT", "UInt32" -> "BIGINT",
    "UInt64" -> "BIGINT", "Int8" -> "TINYINT", "Int16" -> "SMALLINT",
    "Int32" -> "INT", "Int64" -> "BIGINT", "Float32" -> "FLOAT",
    "Float64" -> "DOUBLE", "String" -> "STRING", "Date32" -> "DATE",
    "DateTime" -> "TIMESTAMP", "Bool" -> "BOOLEAN", "UUID" -> "STRING")

  /** Map one CH type token (possibly parameterized / wrapped) to a
    * Spark type: DateTime64(p) → TIMESTAMP, FixedString(n) → STRING,
    * Nullable/LowCardinality(T) unwrap, Array(T) → ARRAY<T>. Returns
    * None for names this pass does not own (Decimal(p,s) parses in
    * Spark as-is; unknown names stay untouched).
    */
  private def mapChType(name: String, args: Option[String]): Option[String] =
    (name, args) match {
      case ("DateTime64", _) => Some("TIMESTAMP")
      case ("FixedString", _) => Some("STRING")
      case ("Nullable" | "LowCardinality", Some(inner)) =>
        Some(mapChTypeToken(inner.trim))
      case ("Array", Some(inner)) =>
        Some(s"ARRAY<${mapChTypeToken(inner.trim)}>")
      case (n, None) => chCastTypes.get(n)
      case _ => None
    }

  /** Map a bare inner type token, recursing one wrapper level. */
  private def mapChTypeToken(t: String): String = {
    val p = t.indexOf('(')
    if (p < 0) chCastTypes.getOrElse(t, t)
    else {
      val name = t.substring(0, p).trim
      val inner = t.substring(p + 1, t.lastIndexOf(')').max(p + 1))
      mapChType(name, Some(inner)).getOrElse(t)
    }
  }

  private val castKeywords =
    Set("cast", "try_cast", "accuratecast", "accuratecastornull")

  private def rewriteCastTypes(sql: String): String = {
    val out = new StringBuilder
    // open-paren stack: true = the paren was opened by a CAST-family
    // keyword, so an `AS <type>` before ITS closing paren is a cast
    var parenStack = List.empty[Boolean]
    var j = 0
    while (j < sql.length) {
      val ck = commentKind(sql, j)
      if (ck != 0) {
        val e = commentEnd(sql, j, ck)
        out.append(sql.substring(j, e)); j = e
      } else sql.charAt(j) match {
        case '\'' | '"' | '`' =>
          val e = quotedEnd(sql, j)
          out.append(sql.substring(j, e)); j = e
        case '(' =>
          // which word opened this paren? (look back in the OUTPUT,
          // which is already-rewritten text)
          var k = out.length - 1
          while (k >= 0 && out.charAt(k).isWhitespace) k -= 1
          var st = k
          while (st >= 0 && isIdent(out.charAt(st))) st -= 1
          val opener = out.substring(st + 1, k + 1).toLowerCase
          parenStack = castKeywords.contains(opener) :: parenStack
          out.append('('); j += 1
        case ')' =>
          if (parenStack.nonEmpty) parenStack = parenStack.tail
          out.append(')'); j += 1
        case c if isIdent(c) && !isIdent(sql.charAt(math.max(j - 1, 0))) || (j == 0 && isIdent(c)) =>
          var e = j
          while (e < sql.length && isIdent(sql.charAt(e))) e += 1
          val word = sql.substring(j, e)
          // optional parenthesized argument: DateTime64(3), Nullable(T)…
          val paramEnd: Option[Int] =
            if (e < sql.length && sql.charAt(e) == '(' &&
                Set("DateTime64", "FixedString", "Nullable",
                  "LowCardinality", "Array").contains(word)) {
              var depth = 0; var p = e
              var stop = -1
              while (p < sql.length && stop < 0) {
                if (sql.charAt(p) == '(') depth += 1
                else if (sql.charAt(p) == ')') { depth -= 1; if (depth == 0) stop = p }
                p += 1
              }
              if (stop >= 0) Some(stop + 1) else None
            } else None
          val args = paramEnd.map(pe => sql.substring(e + 1, pe - 1))
          val tokenEnd = paramEnd.getOrElse(e)
          mapChType(word, args) match {
            case Some(spark) =>
              // context: `:: <type>` — always a cast
              var k = j - 1
              while (k > 0 && sql.charAt(k).isWhitespace) k -= 1
              val afterColons = k >= 1 &&
                sql.charAt(k) == ':' && sql.charAt(k - 1) == ':'
              // context: `AS <type>` with the innermost paren opened
              // by a CAST-family keyword
              var kw = k
              val kwEnd = kw
              while (kw >= 0 && isIdent(sql.charAt(kw))) kw -= 1
              val prevWord = sql.substring(kw + 1, kwEnd + 1)
              val inCast = parenStack.headOption.contains(true)
              if (afterColons || (prevWord.equalsIgnoreCase("AS") && inCast))
                out.append(spark)
              else out.append(sql.substring(j, tokenEnd))
            case None => out.append(word)
          }
          j = if (mapChType(word, args).isDefined) tokenEnd else e
        case c => out.append(c); j += 1
      }
    }
    out.toString
  }

  // ---------------------------------------------------------------
  // shared quote/comment-aware lexing helpers
  // ---------------------------------------------------------------

  /** at a comment opener? 0 if not, else its kind (1 line, 2 block) */
  private def commentKind(s: String, j: Int): Int =
    if (j + 1 >= s.length) 0
    else if (s.charAt(j) == '-' && s.charAt(j + 1) == '-') 1
    else if (s.charAt(j) == '/' && s.charAt(j + 1) == '*') 2
    else 0

  /** index just past the comment starting at `j` */
  private def commentEnd(s: String, j: Int, kind: Int): Int =
    if (kind == 1) {
      val e = s.indexOf('\n', j); if (e < 0) s.length else e + 1
    } else {
      val e = s.indexOf("*/", j + 2); if (e < 0) s.length else e + 2
    }

  /** index just past the quoted span opening at `j` (s(j) is the
    * quote). Handles backslash escapes (not in backticks) and
    * SQL-standard doubled-quote escapes ('it''s', `a``b`).
    */
  private def quotedEnd(s: String, j: Int): Int = {
    val q = s.charAt(j)
    var k = j + 1
    while (k < s.length) {
      val c = s.charAt(k)
      if (c == '\\' && q != '`') k += 2
      else if (c == q) {
        if (k + 1 < s.length && s.charAt(k + 1) == q) k += 2 // '' escape
        else return k + 1
      } else k += 1
    }
    s.length
  }

  /** index just past the ')' matching the '(' at `from`, skipping
    * quoted spans and comments; -1 if unbalanced
    */
  private def matchParen(s: String, from: Int): Int = {
    var j = from; var depth = 0
    while (j < s.length) {
      val ck = commentKind(s, j)
      if (ck != 0) j = commentEnd(s, j, ck)
      else s.charAt(j) match {
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; if (depth == 0) return j + 1 else j += 1
        case '\'' | '"' | '`' => j = quotedEnd(s, j)
        case _ => j += 1
      }
    }
    -1
  }

  /** spans (start, endExclusive) of the top-level comma-separated
    * arguments of the paren group starting at `from`; empty when
    * unbalanced.
    */
  private def argSpans(s: String, from: Int): Seq[(Int, Int)] = {
    val end = matchParen(s, from)
    if (end < 0) return Nil
    val cuts = scala.collection.mutable.ArrayBuffer(from)
    var j = from; var depth = 0
    while (j < end) {
      val ck = commentKind(s, j)
      if (ck != 0) j = commentEnd(s, j, ck)
      else s.charAt(j) match {
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case ',' if depth == 1 => cuts += j; j += 1
        case '\'' | '"' | '`' => j = quotedEnd(s, j)
        case _ => j += 1
      }
    }
    cuts += end - 1
    cuts.toSeq.sliding(2).map { case Seq(a, b) => (a + 1, b) }.toSeq
  }

  /** number of top-level (depth-1) comma-separated arguments of the
    * paren group starting at `from`; -1 if unbalanced. Empty group
    * counts 0.
    */
  private def topLevelArgs(s: String, from: Int): Int = {
    val end = matchParen(s, from)
    if (end < 0) return -1
    var j = from; var depth = 0; var commas = 0; var sawToken = false
    while (j < end) {
      val ck = commentKind(s, j)
      if (ck != 0) j = commentEnd(s, j, ck)
      else s.charAt(j) match {
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case ',' if depth == 1 => commas += 1; j += 1
        case '\'' | '"' | '`' => sawToken = true; j = quotedEnd(s, j)
        case c =>
          if (!c.isWhitespace && depth >= 1) sawToken = true
          j += 1
      }
    }
    if (!sawToken) 0 else commas + 1
  }

  private def isIdent(c: Char) = c.isLetterOrDigit || c == '_'

  /** All word tokens with positions and paren depth, skipping quoted
    * spans and comments: (word, start, endExclusive, depth).
    */
  private def wordTokens(s: String): Vector[(String, Int, Int, Int)] = {
    val out = Vector.newBuilder[(String, Int, Int, Int)]
    var j = 0; var depth = 0
    while (j < s.length) {
      val ck = commentKind(s, j)
      if (ck != 0) j = commentEnd(s, j, ck)
      else s.charAt(j) match {
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case '\'' | '"' | '`' => j = quotedEnd(s, j)
        case c if c.isLetter || c == '_' =>
          val start = j
          while (j < s.length && isIdent(s.charAt(j))) j += 1
          out += ((s.substring(start, j), start, j, depth))
        case _ => j += 1
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // FROM <table> FINAL
  // ---------------------------------------------------------------

  /** Rewrites every `FROM <table> FINAL` (any nesting depth — the
    * replacement is purely local) into a dedup subquery aliased back
    * to the table name, using the table's registered declaration.
    * Dotted names (`db.events`) resolve on their last segment.
    */
  private def rewriteFinal(sql: String): String = {
    val toks = wordTokens(sql)
    // trailing clause keywords after FINAL that mean "no user alias"
    val clauseKw = Set("where", "group", "order", "limit", "having",
      "union", "intersect", "except", "join", "inner", "left", "right",
      "full", "cross", "semi", "anti", "on", "using", "window", "as",
      "settings", "qualify", "distribute", "cluster", "sort", "lateral",
      "sample", "tablesample", "prewhere")
    var idx = toks.indexWhere(t => t._1.equalsIgnoreCase("from"))
    var result: Option[String] = None
    while (idx >= 0 && result.isEmpty) {
      // collect the (possibly dotted) table name following FROM
      var k = idx + 1
      if (k < toks.length && !toks(k)._1.equalsIgnoreCase("final")) {
        var nameEnd = toks(k)._3
        var lastSeg = toks(k)._1
        // absorb `.seg` continuations (dotted identifier)
        var cont = true
        while (cont && k + 1 < toks.length &&
            toks(k + 1)._2 == nameEnd + 1 && sql.charAt(nameEnd) == '.') {
          k += 1; nameEnd = toks(k)._3; lastSeg = toks(k)._1
          cont = true
        }
        if (k + 1 < toks.length && toks(k + 1)._1.equalsIgnoreCase("final") &&
            toks(k + 1)._4 == toks(idx)._4) {
          val table = sql.substring(toks(idx + 1)._2, nameEnd)
          val finalTok = toks(k + 1)
          val decl = replacingDecls.getOrElse(lastSeg.toLowerCase,
            throw new IllegalArgumentException(
              s"FINAL: no ReplacingMergeTree declaration registered for " +
                s"table '$table' (ChSqlRewrite.registerReplacing)"))
          val part = decl.keys.mkString(", ")
          val sub = s"(SELECT * EXCEPT (__final_rn) FROM (SELECT *, " +
            s"row_number() OVER (PARTITION BY $part ORDER BY " +
            s"${decl.versionSql} DESC) AS __final_rn FROM $table) " +
            s"WHERE __final_rn = 1)"
          // keep a user-supplied alias; otherwise alias back to the name
          val next = toks.lift(toks.indexOf(finalTok) + 1)
          val hasUserAlias = next.exists(t =>
            t._1.equalsIgnoreCase("as") ||
              (!clauseKw.contains(t._1.toLowerCase) && t._4 == finalTok._4))
          val alias = if (hasUserAlias) "" else s" AS $lastSeg"
          result = Some(sql.substring(0, toks(idx + 1)._2) + sub + alias +
            sql.substring(finalTok._3))
        }
      }
      idx = toks.indexWhere(t => t._1.equalsIgnoreCase("from"), idx + 1)
    }
    // one occurrence per pass; recurse for multiple FINALs
    result.map(rewriteFinal).getOrElse(sql)
  }

  // ---------------------------------------------------------------
  // PREWHERE / SETTINGS / FORMAT
  // ---------------------------------------------------------------

  private val clauseAfterCond = Set("where", "group", "order", "having",
    "limit", "settings", "union", "intersect", "except", "window",
    "qualify", "format")

  /** `PREWHERE c` — ClickHouse's storage-level pre-filter — has WHERE
    * semantics for the result (CH applies it before column reads; for
    * us Catalyst's pushdown already does that to any WHERE). Rewritten
    * at every nesting depth: merged as `WHERE (pre) AND (where)` when
    * the scope also has a WHERE, else renamed to WHERE.
    */
  private def rewritePrewhere(sql: String): String = {
    val toks = wordTokens(sql)
    val pw = toks.find(_._1.equalsIgnoreCase("prewhere"))
    pw match {
      case None => sql
      case Some((_, pwStart, pwEnd, depth)) =>
        // span of the PREWHERE condition: to the next clause keyword
        // at the same depth (never deeper; a shallower token means the
        // scope closed)
        val after = toks.filter(t => t._2 >= pwEnd)
        val term = after.find(t => t._4 == depth &&
          clauseAfterCond.contains(t._1.toLowerCase))
        val scopeEnd = {
          // end of this paren scope: first position where depth drops
          // below `depth` — conservatively, end of string for depth 0
          var j = pwEnd; var d = depth; var end = sql.length
          while (j < sql.length && end == sql.length) {
            val ck = commentKind(sql, j)
            if (ck != 0) j = commentEnd(sql, j, ck)
            else sql.charAt(j) match {
              case '(' => d += 1; j += 1
              case ')' => d -= 1; if (d < depth) end = j else j += 1
              case '\'' | '"' | '`' => j = quotedEnd(sql, j)
              case _ => j += 1
            }
          }
          end
        }
        val rewritten = term match {
          case Some(w) if w._1.equalsIgnoreCase("where") && w._2 < scopeEnd =>
            val pre = sql.substring(pwEnd, w._2).trim
            // the WHERE's own condition runs to ITS next clause keyword
            val wAfter = toks.filter(t => t._2 >= w._3)
            val wTerm = wAfter.find(t => t._4 == depth && t._2 < scopeEnd &&
              clauseAfterCond.contains(t._1.toLowerCase))
            val wEnd = wTerm.map(_._2).getOrElse(scopeEnd)
            val whereCond = sql.substring(w._3, wEnd).trim
            sql.substring(0, pwStart) +
              s"WHERE ($pre) AND ($whereCond) " +
              sql.substring(wEnd)
          case _ =>
            sql.substring(0, pwStart) + "WHERE" + sql.substring(pwEnd)
        }
        rewritePrewhere(rewritten) // next occurrence
    }
  }

  /** Strips ClickHouse's trailing `SETTINGS k = v, …` and `FORMAT X`
    * clauses (top level only — they are statement-trailers in CH).
    * `FORMAT` is only treated as a clause when followed by a single
    * bare identifier at end-of-statement, so a column named `format`
    * is never eaten.
    */
  private def stripSettingsFormat(sql: String): String = {
    val toks = wordTokens(sql).filter(_._4 == 0)
    // FORMAT <ident> at the very end — but NOT when `format` is itself
    // an expression position (e.g. `ORDER BY format ASC`, where the
    // column is named format and ASC is the trailing word): the word
    // before a FORMAT clause is never one of these connectives
    val notAClause = Set("by", "select", "as", "on", "and", "or", "not",
      "where", "when", "then", "else", "distinct", "all", "comma")
    val afterFormat = toks.reverse match {
      case last +: fmt +: rest if fmt._1.equalsIgnoreCase("format") &&
          sql.substring(last._3).trim.isEmpty &&
          sql.substring(fmt._3, last._2).trim.isEmpty &&
          rest.headOption.forall(p => !notAClause.contains(p._1.toLowerCase) &&
            !sql.substring(p._3, fmt._2).trim.endsWith(",")) =>
        sql.substring(0, fmt._2).stripTrailing()
      case _ => sql
    }
    // SETTINGS ident = … to end (or to where FORMAT was)
    val toks2 = wordTokens(afterFormat).filter(_._4 == 0)
    toks2.zipWithIndex.find { case (t, i) =>
      t._1.equalsIgnoreCase("settings") && i + 1 < toks2.length &&
        afterFormat.substring(toks2(i + 1)._3).trim.startsWith("=")
    } match {
      case Some((t, _)) => afterFormat.substring(0, t._2).stripTrailing()
      case None => afterFormat
    }
  }

  // ---------------------------------------------------------------
  // SAMPLE <fraction>
  // ---------------------------------------------------------------

  /** ClickHouse's `FROM t SAMPLE 0.1` (fraction form) maps to Spark's
    * `TABLESAMPLE (10.0 PERCENT) REPEATABLE (42)` — pinned seed
    * because CH sampling is deterministic (sampling-key based) and a
    * per-run-random sample would violate that contract. Only the
    * fraction form rewrites; `SAMPLE n` (approximate row count) needs
    * table statistics CH resolves server-side, and passes through to
    * fail loudly rather than mis-sample.
    */
  private def rewriteSample(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("sample") && {
        // fraction literal follows: digits with a dot, value < 1
        val rest = sql.substring(toks(i)._3)
        val m = "^\\s*(0?\\.\\d+)".r.findFirstMatchIn(rest)
        m.isDefined
      } && i > 0 && !toks(i - 1)._1.equalsIgnoreCase("select")
    }
    idx match {
      case None => sql
      case Some(i) =>
        val rest = sql.substring(toks(i)._3)
        val m = "^\\s*(0?\\.\\d+)".r.findFirstMatchIn(rest).get
        val frac = m.group(1).toDouble
        val pct = frac * 100.0
        rewriteSample(
          sql.substring(0, toks(i)._2) +
            s"TABLESAMPLE ($pct PERCENT) REPEATABLE (42)" +
            rest.substring(m.end))
    }
  }

  // ---------------------------------------------------------------
  // ANY [LEFT|INNER] JOIN … USING (…)
  // ---------------------------------------------------------------

  /** ClickHouse's `ANY LEFT JOIN r USING (k)` joins at most ONE right
    * row per key (an arbitrary one). Rewritten — for the USING form,
    * where the key columns are explicit — to a plain join against the
    * right side deduplicated by the key via row_number. The window
    * orders by the keys themselves, i.e. every surviving-candidate
    * tie is unordered: WHICH right row survives is partition-order
    * dependent — exactly ClickHouse's documented ANY contract
    * (arbitrary pick), so don't hash-compare the non-key columns.
    * The ON form passes through to fail loudly (its key set isn't
    * recoverable lexically).
    */
  private def rewriteAnyJoin(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("any") && i + 1 < toks.length && {
        val w1 = toks(i + 1)._1.toLowerCase
        w1 == "join" || ((w1 == "left" || w1 == "inner") &&
          i + 2 < toks.length && toks(i + 2)._1.equalsIgnoreCase("join"))
      } && toks(i)._4 == toks(i + 1)._4
    }
    idx match {
      case None => sql
      case Some(i) =>
        val joinIdx =
          if (toks(i + 1)._1.equalsIgnoreCase("join")) i + 1 else i + 2
        val d = toks(i)._4
        // right relation: an identifier (possibly dotted, possibly
        // aliased) or a parenthesized subquery, then USING (cols)
        val afterJoin = toks(joinIdx)._3
        var j = afterJoin
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val (relEnd0, isSub) =
          if (j < sql.length && sql.charAt(j) == '(')
            (matchParen(sql, j), true)
          else {
            // consume ident tokens up to USING at this depth
            val usingTok = toks.find(t => t._2 >= afterJoin && t._4 == d &&
              t._1.equalsIgnoreCase("using"))
            (usingTok.map(_._2).getOrElse(-1), false)
          }
        val usingTok = toks.find(t => t._2 >= (if (isSub) relEnd0 else afterJoin)
          && t._4 == d && t._1.equalsIgnoreCase("using"))
          // the USING must belong to THIS join: nothing clause-like
          // (ON, another JOIN, WHERE…) may sit between them at depth d
          .filterNot { u =>
            val blockers = Set("on", "join", "where", "group", "order",
              "limit", "having", "union", "prewhere")
            toks.exists(t => t._2 >= afterJoin && t._3 <= u._2 &&
              t._4 == d && blockers.contains(t._1.toLowerCase))
          }
        (usingTok, relEnd0) match {
          case (Some(u), relEnd) if relEnd > 0 =>
            var k = u._3
            while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
            if (k >= sql.length || sql.charAt(k) != '(') sql
            else {
              val colsEnd = matchParen(sql, k)
              if (colsEnd < 0) sql
              else {
                val rel = sql.substring(j,
                  if (isSub) relEnd else u._2).trim
                val cols = sql.substring(k + 1, colsEnd - 1).trim
                // alias: trailing ident of a non-subquery rel, or none
                val joinKw = sql.substring(toks(joinIdx)._2, toks(joinIdx)._3)
                val aliasPart =
                  if (isSub) {
                    // keep any alias text between the subquery and USING
                    val t = sql.substring(relEnd, u._2).trim
                    if (t.isEmpty) "" else " " + t
                  } else if (rel.split("\\s+").length > 1)
                    " " + rel.split("\\s+").tail.mkString(" ")
                  else s" AS ${rel.split("\\s+").head.split('.').last}"
                val dedup = s"(SELECT * EXCEPT (__any_rn) FROM (SELECT *, " +
                  s"row_number() OVER (PARTITION BY $cols ORDER BY $cols) " +
                  s"AS __any_rn FROM " +
                  (if (isSub) rel else rel.split("\\s+").head) +
                  s") WHERE __any_rn = 1)" + aliasPart
                val joinWord =
                  if (joinIdx == i + 1) joinKw
                  else sql.substring(toks(i + 1)._2, toks(joinIdx)._3)
                rewriteAnyJoin(
                  sql.substring(0, toks(i)._2) + joinWord + " " + dedup +
                    " " + sql.substring(u._2, colsEnd) +
                    sql.substring(colsEnd))
              }
            }
          case _ => sql
        }
    }
  }

  // ---------------------------------------------------------------
  // [a, b, …] array literals
  // ---------------------------------------------------------------

  /** keywords after which a `[` must be an array LITERAL (an
    * identifier or closing bracket before `[` means subscript)
    */
  private val beforeLiteralKeywords = Set(
    "select", "from", "where", "and", "or", "not", "in", "when",
    "then", "else", "end", "as", "on", "by", "having", "limit",
    "union", "all", "distinct", "values", "between", "is", "like",
    "ilike", "case", "if", "array", "settings", "order", "group",
    "join", "using", "with", "interval", "return", "exists")

  /** ClickHouse spells array literals `[1, 2]`; Spark wants
    * `array(1, 2)`. A `[` is a SUBSCRIPT (left alone) when it follows
    * an identifier, `)`, `]`, or a quoted span — a literal when it
    * follows a keyword, an operator, `(`, `,`, another `[`, or the
    * start of the statement. Nested literals convert inside-out.
    */
  private def rewriteArrayLiterals(sql: String): String = {
    val out = new StringBuilder
    var j = 0
    def isLiteralHere(pos: Int): Boolean = {
      var k = pos - 1
      while (k >= 0 && sql.charAt(k).isWhitespace) k -= 1
      if (k < 0) return true
      val c = sql.charAt(k)
      if (c == ')' || c == ']' || c == '\'' || c == '"' || c == '`')
        return false
      if (isIdent(c)) {
        var st = k
        while (st > 0 && isIdent(sql.charAt(st - 1))) st -= 1
        return beforeLiteralKeywords.contains(
          sql.substring(st, k + 1).toLowerCase)
      }
      true // operator, comma, paren, bracket, start
    }
    while (j < sql.length) {
      val ck = commentKind(sql, j)
      if (ck != 0) {
        val e = commentEnd(sql, j, ck)
        out.append(sql.substring(j, e)); j = e
      } else sql.charAt(j) match {
        case '\'' | '"' | '`' =>
          val e = quotedEnd(sql, j)
          out.append(sql.substring(j, e)); j = e
        case '[' if isLiteralHere(j) =>
          // find the matching ] (quote/comment/nesting aware)
          var d = 0; var k = j
          var close = -1
          while (k < sql.length && close < 0) {
            val ck2 = commentKind(sql, k)
            if (ck2 != 0) k = commentEnd(sql, k, ck2)
            else sql.charAt(k) match {
              case '[' => d += 1; k += 1
              case ']' => d -= 1; if (d == 0) close = k else k += 1
              case '\'' | '"' | '`' => k = quotedEnd(sql, k)
              case _ => k += 1
            }
          }
          if (close < 0) { out.append(sql.charAt(j)); j += 1 }
          else {
            out.append("array(")
              .append(rewriteArrayLiterals(sql.substring(j + 1, close)))
              .append(")")
            j = close + 1
          }
        case c => out.append(c); j += 1
      }
    }
    out.toString
  }

  // ---------------------------------------------------------------
  // WITH <expr> AS <ident> scalar aliases
  // ---------------------------------------------------------------

  /** ClickHouse's scalar WITH — `WITH 100 AS k SELECT k * 2` — binds
    * an EXPRESSION to a name and substitutes it wherever the name
    * appears (shadowing columns, CH's own semantics). Spark's WITH
    * only parses CTEs, so the scalar items are lifted out and
    * textually substituted as a parenthesized expression at every
    * standalone use of the name (token-level, quote-safe, skipping
    * `x.name` member accesses and `name(` calls). Standard CTE items
    * (`name AS (SELECT …)`) in the same WITH are left in place; a
    * WITH that held only scalar items loses the clause entirely.
    * Substitution runs AFTER extraction over the whole remaining
    * statement — including inside later CTE bodies, as CH does.
    */
  private def rewriteScalarWith(sql: String): String = {
    val toks = wordTokens(sql)
    val wIdx = toks.indices.find(i => toks(i)._4 == 0 &&
      toks(i)._1.equalsIgnoreCase("with"))
    if (wIdx.isEmpty) return sql
    val w = toks(wIdx.get)
    // WITH items end at the depth-0 SELECT that follows them
    val selTok = toks.find(t => t._2 > w._2 && t._4 == 0 &&
      t._1.equalsIgnoreCase("select")).getOrElse(return sql)
    val items = splitTopLevel(sql, w._3, selTok._2)
    // classify: CTE = `name AS (SELECT…)` / scalar = `expr AS name`
    val cteRe = """(?is)^[`"\w]+\s+AS\s*\(.*\)\s*$""".r
    val scalarRe = """(?is)^(.+?)\s+AS\s+[`"]?(\w+)[`"]?$""".r
    var ctes = Vector.empty[String]
    var scalars = Vector.empty[(String, String)] // name -> expr
    items.foreach {
      case it if cteRe.findFirstIn(it).isDefined => ctes :+= it
      case scalarRe(expr, name) => scalars :+= (name, expr.trim)
      case _ => return sql // unrecognized item: leave untouched
    }
    if (scalars.isEmpty) return sql
    val head = sql.substring(0, w._2)
    val tail = sql.substring(selTok._2)
    val kept =
      if (ctes.isEmpty) ""
      else s"WITH ${ctes.mkString(", ")} "
    // substitute each scalar name at standalone ident positions
    val byName = scalars.toMap
    def substitute(s: String): String = {
      val ts = wordTokens(s)
      val out = new StringBuilder
      var pos = 0
      ts.foreach { t =>
        val name = t._1
        byName.get(byName.keys.find(_.equalsIgnoreCase(name))
          .getOrElse("")) match {
          case Some(expr)
            // not `x.name` (member access) and not `name(` (call)
            if !(t._2 > 0 && s.charAt(t._2 - 1) == '.') && {
              var k = t._3
              while (k < s.length && s.charAt(k).isWhitespace) k += 1
              k >= s.length || s.charAt(k) != '('
            } =>
            out.append(s.substring(pos, t._2)).append(s"($expr)")
            pos = t._3
          case _ =>
        }
      }
      out.append(s.substring(pos)).toString
    }
    // scalar aliases may reference each other left-to-right in CH
    // (`WITH 100 AS a, a * 2 AS b …`): iterate substitution to a
    // fixpoint — each pass resolves one chaining level, so the alias
    // count bounds the iterations
    var body = kept + tail
    var passes = 0
    var next = substitute(body)
    while (next != body && passes < scalars.length + 1) {
      body = next; next = substitute(body); passes += 1
    }
    rewriteScalarWith(head + next)
  }

  // ---------------------------------------------------------------
  // system.* introspection tables
  // ---------------------------------------------------------------

  /** The `system` schema names a ClickHouse client touches on connect
    * (DataGrip/metabase-style introspection), plus `parts` — the view
    * CH maintenance tooling reads to drive OPTIMIZE/TTL/DROP
    * PARTITION. Renamed to registered temp-view names; [[ChCompat.sql]]
    * materializes them fresh from the Spark catalog before running the
    * statement (`parts` on every probe — it reflects data, not
    * catalog shape).
    */
  val systemTables: Set[String] =
    Set("tables", "columns", "databases", "one", "parts")

  private def rewriteSystemTables(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("system") && toks(i)._3 < sql.length &&
        sql.charAt(toks(i)._3) == '.' && i + 1 < toks.length &&
        toks(i + 1)._2 == toks(i)._3 + 1 &&
        systemTables.contains(toks(i + 1)._1.toLowerCase)
    }
    idx match {
      case None => sql
      case Some(i) =>
        rewriteSystemTables(sql.substring(0, toks(i)._2) +
          "__ch_system_" + toks(i + 1)._1.toLowerCase +
          sql.substring(toks(i + 1)._3))
    }
  }

  // ---------------------------------------------------------------
  // JOIN … USING k1, k2  (ClickHouse's paren-less spelling)
  // ---------------------------------------------------------------

  /** ClickHouse accepts `USING k1, k2` bare; Spark's grammar demands
    * `USING (k1, k2)`. Wraps the bare column list — simple identifiers
    * separated by top-level commas, ending at the next clause keyword,
    * join keyword, closing paren, or end of statement. `USING (` is
    * untouched.
    */
  private def rewriteUsingParens(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("using") && {
        var k = toks(i)._3
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        k < sql.length && sql.charAt(k) != '(' &&
          (sql.charAt(k).isLetter || sql.charAt(k) == '_' ||
            sql.charAt(k) == '`') &&
          // `USING parquet` in DDL is not a join clause: require a
          // JOIN keyword somewhere before at the same depth
          toks.take(i).exists(t => t._4 == toks(i)._4 &&
            t._1.equalsIgnoreCase("join"))
      }
    }
    idx match {
      case None => sql
      case Some(i) =>
        val d = toks(i)._4
        // the column list: ident tokens at depth d joined by commas;
        // ends before the first token that is not part of that shape
        var end = toks(i)._3
        var j = i + 1
        var expectIdent = true
        var done = false
        while (!done && j < toks.length && toks(j)._4 == d) {
          val between = sql.substring(end, toks(j)._2)
          val sep = between.trim
          if (expectIdent && (sep.isEmpty || sep == ",") &&
            !clauseEnders.contains(toks(j)._1.toLowerCase) &&
            !toks(j)._1.equalsIgnoreCase("using") &&
            !toks(j)._1.equalsIgnoreCase("on")) {
            end = toks(j)._3; expectIdent = false; j += 1
            // a following comma re-opens the list
            var k = end
            while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
            if (k < sql.length && sql.charAt(k) == ',') expectIdent = true
          } else done = true
        }
        // trim a trailing comma position back to the last ident end
        val cols = sql.substring(toks(i)._3, end).trim
        if (cols.isEmpty) sql
        else rewriteUsingParens(
          sql.substring(0, toks(i)._3) + " (" +
            cols.split(',').map(_.trim).mkString(", ") + ")" +
            sql.substring(end))
    }
  }

  // ---------------------------------------------------------------
  // ASOF [LEFT|INNER] JOIN … ON eq-keys AND time-inequality
  // ---------------------------------------------------------------

  private val clauseEnders = Set("where", "group", "order", "limit",
    "having", "union", "settings", "format", "window", "prewhere",
    "left", "right", "inner", "full", "cross", "join", "any", "asof",
    "semi", "anti", "global", "all")

  /** ClickHouse's `ASOF JOIN` — for each left row, the single right
    * row with the CLOSEST time satisfying the inequality, matched on
    * the equality keys (reference usage shape: the dialect's
    * highest-value join a CH user brings over; Spark has no ASOF).
    *
    * Rewritten by INTERVAL-IZING the right side: a `lead(t) OVER
    * (PARTITION BY keys ORDER BY t)` window gives every right row a
    * validity window `[t, next t)`, after which the as-of pick is a
    * plain EQUI-join with a range post-filter that matches AT MOST ONE
    * right row per left row — no row_number dedup of an exploded
    * match set, no nested-loop join (Spark decorrelates the LATERAL
    * `ORDER BY … LIMIT 1` spelling into a BroadcastNestedLoopJoin —
    * measured — so that spelling is avoided). The window's shuffle is
    * by the same keys the join shuffles on. This is the 100-TB as-of
    * shape.
    *
    * Supported form: `L [la] ASOF [LEFT|INNER] JOIN R [ra] ON
    * <conjuncts>` where exactly one conjunct is an inequality
    * (`< <= > >=`) with a bare `ra.col` on one side, every other
    * conjunct is an equality with a bare `ra.col` on one side, and R
    * is a table name or parenthesized subquery. `ASOF … USING` and
    * non-conjunctive ON throw (CH's own ASOF grammar is equally
    * strict); an unsupported shape must NOT pass through, because
    * Spark would silently parse `ASOF` as a table alias and run the
    * inequality as a many-match join condition — wrong results, not
    * an error. Documented divergence: `SELECT *` over the rewritten
    * join carries the synthetic `__asof_end<n>` column (the join
    * condition needs it in scope; explicit select lists are
    * unaffected), and right rows DUPLICATED on (keys, t) get an empty
    * validity window — CH documents duplicate asof keys as undefined.
    */
  /** `ANY [LEFT|INNER] JOIN r [alias] ON l.k = r.k [AND …]` — the ON
    * spelling of the at-most-one-right-row join (the USING form lives
    * in [[rewriteAnyJoin]]). Rewrites ONLY when every conjunct is an
    * equality with a bare `alias.col` on one side: the right relation
    * dedups by that full key set (row_number, arbitrary survivor —
    * exactly CH's ANY contract), the ON text stays as written. Any
    * other shape (inequalities, ORs, non-column operands) passes
    * through to fail loudly — dedup-by-key is only equivalent to
    * per-left-row pick when matching is key-determined.
    */
  private def rewriteAnyJoinOn(sql: String, n: Int = 0): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("any") && i + 1 < toks.length &&
        toks(i)._4 == toks(i + 1)._4 && {
          val w1 = toks(i + 1)._1.toLowerCase
          w1 == "join" || ((w1 == "left" || w1 == "inner") &&
            i + 2 < toks.length && toks(i + 2)._1.equalsIgnoreCase("join") &&
            toks(i + 2)._4 == toks(i)._4)
        } && {
          // ON form only: an ON token must precede any USING at depth
          val joinIdx =
            if (toks(i + 1)._1.equalsIgnoreCase("join")) i + 1 else i + 2
          val d = toks(i)._4
          val after = toks.drop(joinIdx + 1)
            .filter(t => t._4 == d)
            .map(_._1.toLowerCase)
          val on = after.indexOf("on"); val using = after.indexOf("using")
          on >= 0 && (using < 0 || on < using)
        }
    }
    idx match {
      case None => sql
      case Some(i) =>
        val d = toks(i)._4
        val joinIdx =
          if (toks(i + 1)._1.equalsIgnoreCase("join")) i + 1 else i + 2
        val keepKw =
          if (joinIdx == i + 1) "JOIN"
          else sql.substring(toks(i + 1)._2, toks(joinIdx)._3)
        var j = toks(joinIdx)._3
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val (relInner, afterRel) =
          if (j < sql.length && sql.charAt(j) == '(') {
            val e = matchParen(sql, j)
            if (e < 0) return sql
            (sql.substring(j, e), e)
          } else {
            val relTok = toks.find(t => t._2 >= j).getOrElse(return sql)
            var e = relTok._3
            while (e < sql.length && sql.charAt(e) == '.') {
              // dotted name: consume `.ident` (same loop as asof)
              var k = e + 1
              while (k < sql.length && isIdent(sql.charAt(k))) k += 1
              e = k
            }
            (sql.substring(j, e), e)
          }
        val onTok = toks.find(t => t._2 >= afterRel && t._4 == d &&
          t._1.equalsIgnoreCase("on")).getOrElse(return sql)
        val aliasToks = toks.filter(t => t._2 >= afterRel &&
          t._3 <= onTok._2 && t._4 == d && !t._1.equalsIgnoreCase("as"))
        if (aliasToks.length > 1) return sql
        val alias = aliasToks.headOption.map(_._1).getOrElse {
          if (relInner.startsWith("(")) return sql
          else relInner.split('.').last
        }
        val condStart = onTok._3
        val condEnd = {
          val stop = toks.find { t =>
            t._2 >= condStart && t._4 == d &&
              clauseEnders.contains(t._1.toLowerCase) && {
                var k = t._3
                while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
                k >= sql.length || sql.charAt(k) != '('
              }
          }.map(_._2)
          math.min(stop.getOrElse(sql.length), scopeEndAt(sql, condStart, d))
        }
        val cond = sql.substring(condStart, condEnd)
        val condToks = wordTokens(cond)
        if (condToks.exists(t => t._4 == 0 && t._1.equalsIgnoreCase("or")))
          return sql
        val andToks = condToks.filter(t => t._4 == 0 &&
          t._1.equalsIgnoreCase("and"))
        val cuts = (0 +: andToks.flatMap(t => Seq(t._2, t._3))) :+ cond.length
        val conjuncts = cuts.grouped(2).map { case Seq(a, b) =>
          cond.substring(a, b).trim }.filter(_.nonEmpty).toSeq
        val qualRe = java.util.regex.Pattern.quote(alias)
        val rightColRe = s"(?i)^$qualRe\\.([A-Za-z_][A-Za-z_0-9]*)$$".r
        val keys = conjuncts.map { c =>
          val eq = {
            var k = 0; var depth = 0; var found = -1
            while (k < c.length && found < 0) {
              c.charAt(k) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case '\'' | '"' | '`' =>
                  k = quotedEnd(c, k) - 1
                case '=' if depth == 0 && k > 0 &&
                  !"<>!=".contains(c.charAt(k - 1)) &&
                  (k + 1 >= c.length || c.charAt(k + 1) != '=') => found = k
                case _ =>
              }
              k += 1
            }
            found
          }
          if (eq < 0) return sql
          val (l, r) = (c.substring(0, eq).trim, c.substring(eq + 1).trim)
          // key-determined ONLY if the non-key side carries no
          // reference to the right alias: `r.a = l.b + r.c` must NOT
          // dedup by a (the match depends on c, which dedup may drop)
          val aliasRefRe = s"(?i)\\b$qualRe\\s*\\.".r
          (l, r) match {
            case (rightColRe(col), other)
              if aliasRefRe.findFirstIn(other).isEmpty => col
            case (other, rightColRe(col))
              if aliasRefRe.findFirstIn(other).isEmpty => col
            case _ => return sql
          }
        }
        val rn = s"__any_rn$n"
        val dedup = s"(SELECT * EXCEPT ($rn) FROM (SELECT *, " +
          s"row_number() OVER (PARTITION BY ${keys.mkString(", ")} " +
          s"ORDER BY ${keys.mkString(", ")}) AS $rn FROM $relInner) " +
          s"WHERE $rn = 1) AS $alias"
        rewriteAnyJoinOn(
          sql.substring(0, toks(i)._2) + keepKw + " " + dedup +
            " ON " + cond.trim + " " + sql.substring(condEnd), n + 1)
    }
  }

  private def rewriteAsofJoin(sql: String, n: Int = 0): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("asof") && i + 1 < toks.length &&
        toks(i)._4 == toks(i + 1)._4 && {
          val w1 = toks(i + 1)._1.toLowerCase
          w1 == "join" || ((w1 == "left" || w1 == "inner") &&
            i + 2 < toks.length && toks(i + 2)._1.equalsIgnoreCase("join") &&
            toks(i + 2)._4 == toks(i)._4)
        }
    }
    idx match {
      case None => sql
      case Some(i) =>
        def bad(why: String): Nothing = throw new IllegalArgumentException(
          s"ASOF JOIN: $why — supported form is `L ASOF [LEFT|INNER] " +
            "JOIN R [alias] ON l.k = r.k AND l.t >= r.t` (AND-only ON, " +
            "one inequality, right side a table or subquery; USING is " +
            "not supported)")
        val d = toks(i)._4
        val joinIdx =
          if (toks(i + 1)._1.equalsIgnoreCase("join")) i + 1 else i + 2
        val keepKw =
          if (joinIdx == i + 1) "JOIN"
          else sql.substring(toks(i + 1)._2, toks(joinIdx)._3)
        // right relation: subquery or dotted ident, then optional alias
        var j = toks(joinIdx)._3
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val (relInner, afterRel) =
          if (j < sql.length && sql.charAt(j) == '(') {
            val e = matchParen(sql, j)
            if (e < 0) bad("unbalanced subquery parens")
            (sql.substring(j, e), e)
          } else {
            val relTok = toks.find(t => t._2 >= j).getOrElse(bad("no right relation"))
            var e = relTok._3
            while (e < sql.length && sql.charAt(e) == '.') {
              // dotted name: consume `.ident`
              var k = e + 1
              while (k < sql.length && isIdent(sql.charAt(k))) k += 1
              e = k
            }
            (sql.substring(j, e), e)
          }
        // optional [AS] alias before ON
        val onTok = toks.find(t => t._2 >= afterRel && t._4 == d &&
          t._1.equalsIgnoreCase("on")).getOrElse(
          if (toks.exists(t => t._2 >= afterRel && t._4 == d &&
            t._1.equalsIgnoreCase("using"))) bad("USING form")
          else bad("no ON clause"))
        val aliasToks = toks.filter(t => t._2 >= afterRel && t._3 <= onTok._2 &&
          t._4 == d && !t._1.equalsIgnoreCase("as"))
        if (aliasToks.length > 1) bad("unparseable right alias")
        val alias = aliasToks.headOption.map(_._1).getOrElse {
          if (relInner.startsWith("(")) bad("subquery right side needs an alias")
          else relInner.split('.').last
        }
        // ON condition: to the next clause keyword at depth d, or scope end
        val condStart = onTok._3
        val condEnd = {
          // a clause keyword immediately followed by `(` is a function
          // call (left(), right(), any()…), not a clause boundary
          val stop = toks.find { t =>
            t._2 >= condStart && t._4 == d &&
              clauseEnders.contains(t._1.toLowerCase) && {
                var k = t._3
                while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
                k >= sql.length || sql.charAt(k) != '('
              }
          }.map(_._2)
          math.min(stop.getOrElse(sql.length), scopeEndAt(sql, condStart, d))
        }
        val cond = sql.substring(condStart, condEnd)
        // split on top-level AND; reject OR
        val condToks = wordTokens(cond)
        if (condToks.exists(t => t._4 == 0 && t._1.equalsIgnoreCase("or")))
          bad("ON must be a pure conjunction")
        val andToks = condToks.filter(t => t._4 == 0 &&
          t._1.equalsIgnoreCase("and"))
        val cuts = (0 +: andToks.flatMap(t => Seq(t._2, t._3))) :+ cond.length
        val conjuncts = cuts.grouped(2).map { case Seq(a, b) =>
          cond.substring(a, b).trim }.filter(_.nonEmpty).toSeq
        // classify each conjunct by its top-level comparison operator
        def topCmp(c: String): Option[(String, String, String)] = {
          var k = 0; var depth = 0
          while (k < c.length) {
            val ck = commentKind(c, k)
            if (ck != 0) k = commentEnd(c, k, ck)
            else c.charAt(k) match {
              case '(' => depth += 1; k += 1
              case ')' => depth -= 1; k += 1
              case '\'' | '"' | '`' => k = quotedEnd(c, k)
              case ch if depth == 0 && (ch == '<' || ch == '>' || ch == '=') =>
                val twoChar = k + 1 < c.length && c.charAt(k + 1) == '='
                val op = if (twoChar) c.substring(k, k + 2) else ch.toString
                if (op == "<" && k + 1 < c.length && c.charAt(k + 1) == '>')
                  return None // `<>` is value-inequality, not an asof bound
                return Some((c.substring(0, k).trim, op,
                  c.substring(k + (if (twoChar) 2 else 1)).trim))
              case _ => k += 1
            }
          }
          None
        }
        val qualRe = java.util.regex.Pattern.quote(alias)
        val rightColRe = s"(?i)^$qualRe\\.([A-Za-z_][A-Za-z_0-9]*)$$".r
        def rightCol(s: String): Option[String] = s match {
          case rightColRe(c) => Some(c)
          case _ => None
        }
        var eqCols = Vector.empty[String]
        var ineq: Option[(String, String, String)] = None // (leftExpr, op, rcol)
        conjuncts.foreach { c =>
          topCmp(c) match {
            case Some((l, "=", r)) =>
              val rc = rightCol(r).orElse(rightCol(l)).getOrElse(
                bad(s"equality `$c` has no bare $alias.col side"))
              eqCols :+= rc
            case Some((l, op, r)) =>
              if (ineq.isDefined) bad("more than one inequality in ON")
              // normalize to leftExpr OP alias.col
              (rightCol(r), rightCol(l)) match {
                case (Some(rc), _) => ineq = Some((l, op, rc))
                case (_, Some(rc)) =>
                  val flip = Map("<" -> ">", "<=" -> ">=",
                    ">" -> "<", ">=" -> "<=")(op)
                  ineq = Some((r, flip, rc))
                case _ => bad(s"inequality `$c` has no bare $alias.col side")
              }
            case None => bad(s"conjunct `$c` is not a comparison")
          }
        }
        val (lx, op, rcol) = ineq.getOrElse(bad("no inequality in ON"))
        if (eqCols.isEmpty) bad("no equality key in ON")
        val endCol = s"__asof_end$n"
        // validity-window direction: >=/> look BACKWARD in time (next
        // row ends the window, ASC lead); <=/< look FORWARD (DESC lead)
        val (ord, endCond) = op match {
          case ">=" => ("", s"$lx < $alias.$endCol")
          case ">" => ("", s"$lx <= $alias.$endCol")
          case "<=" => (" DESC", s"$lx > $alias.$endCol")
          case "<" => (" DESC", s"$lx >= $alias.$endCol")
        }
        val wrapped = s"(SELECT *, lead($rcol) OVER (PARTITION BY " +
          s"${eqCols.mkString(", ")} ORDER BY $rcol$ord) AS $endCol " +
          s"FROM $relInner) AS $alias"
        rewriteAsofJoin(
          sql.substring(0, toks(i)._2) + keepKw + " " + wrapped + " ON " +
            cond.trim + s" AND ($alias.$endCol IS NULL OR $endCond) " +
            sql.substring(condEnd), n + 1)
    }
  }

  // ---------------------------------------------------------------
  // GROUP BY … WITH TOTALS
  // ---------------------------------------------------------------

  /** `GROUP BY c1, c2 WITH TOTALS` — ClickHouse's extra all-groups
    * row — is exactly the grouping-sets pair ((c1, c2), ()):
    * rewritten so the totals row appears with NULL group keys, Spark's
    * (and the SQL standard's) representation of the super-aggregate.
    * `WITH ROLLUP` / `WITH CUBE` need no rewrite (Spark parses them
    * natively); only the WITH TOTALS spelling is CH-specific. Any
    * nesting depth; one occurrence per pass, recursing for more.
    */
  private def rewriteWithTotals(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("with") && i + 1 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("totals") &&
        toks(i)._4 == toks(i + 1)._4
    }
    idx match {
      case None => sql
      case Some(i) =>
        val d = toks(i)._4
        // the GROUP BY owning this WITH TOTALS: the last one at the
        // same depth before it
        val gb = toks.indices.filter(j => j + 1 < i &&
          toks(j)._1.equalsIgnoreCase("group") &&
          toks(j + 1)._1.equalsIgnoreCase("by") && toks(j)._4 == d)
          .lastOption
        gb match {
          case None => sql // no owning GROUP BY: leave for the parser
          case Some(g) =>
            val cols = sql.substring(toks(g + 1)._3, toks(i)._2).trim
            rewriteWithTotals(
              sql.substring(0, toks(g)._2) +
                s"GROUP BY GROUPING SETS (($cols), ())" +
                sql.substring(toks(i + 1)._3))
        }
    }
  }

  // ---------------------------------------------------------------
  // LIMIT n BY col, …
  // ---------------------------------------------------------------

  /** Rewrites a TOP-LEVEL `… [ORDER BY o] LIMIT n BY c1, c2 [LIMIT m]`
    * into a row_number window: partition by the BY columns, order by
    * the statement's ORDER BY (or the BY columns themselves when the
    * statement has none — any n rows per group is then a valid CH
    * answer; ours is deterministic). The statement's ORDER BY and
    * trailing LIMIT are re-applied outside the window subquery.
    */
  /** ClickHouse's MySQL-style `LIMIT offset, count` → Spark's
    * `LIMIT count OFFSET offset`. Any depth; the comma form is never
    * valid Spark so the rewrite can't collide. `LIMIT n BY col` is a
    * different clause, handled by [[rewriteLimitBy]] AFTER this (the
    * guard requires the second number, so `LIMIT 2 BY c` never
    * matches here).
    */
  private def rewriteLimitOffset(sql: String): String = {
    // the regex cannot see quotes; keep only matches whose start is a
    // real word token (a quoted 'LIMIT 1, 2' must not stop the scan
    // from reaching a genuine later occurrence)
    val toks = wordTokens(sql)
    """(?is)\bLIMIT\s+(\d+)\s*,\s*(\d+)""".r.findAllMatchIn(sql)
      .find(x => toks.exists(t => t._2 == x.start &&
        t._1.equalsIgnoreCase("limit"))) match {
      case None => sql
      case Some(x) =>
        rewriteLimitOffset(sql.substring(0, x.start) +
          s"LIMIT ${x.group(2)} OFFSET ${x.group(1)}" +
          sql.substring(x.end))
    }
  }

  /** `SELECT DISTINCT ON (c1, c2) …` — ClickHouse documents it as the
    * exact equivalent of `LIMIT 1 BY c1, c2`, so the rewrite strips
    * the clause and appends that (before any trailing LIMIT n, which
    * per CH applies after the per-group cut); [[rewriteLimitBy]] then
    * expands it to the row_number window. Top-level statements only,
    * same scope as LIMIT BY itself.
    */
  private def rewriteDistinctOn(sql: String): String = {
    val toks = wordTokens(sql).filter(_._4 == 0)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("distinct") && i + 1 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("on") &&
        i > 0 && toks(i - 1)._1.equalsIgnoreCase("select") && {
          var k = toks(i + 1)._3
          while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
          k < sql.length && sql.charAt(k) == '('
        }
    }
    idx match {
      case None => sql
      case Some(i) =>
        // a set operation makes the LIMIT 1 BY scope ambiguous (it
        // would wrap the whole union, not this branch) — pass through
        // to fail loudly at parse instead of silently mis-scoping
        if (toks.exists(t => Set("union", "except", "intersect")
          .contains(t._1.toLowerCase))) return sql
        var k = toks(i + 1)._3
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        val close = matchParen(sql, k)
        if (close < 0) return sql
        val cols = sql.substring(k + 1, close - 1).trim
        // insertion point for LIMIT 1 BY: before the first depth-0
        // LIMIT AFTER this clause (CH applies DISTINCT ON before
        // LIMIT n), else at end — an earlier set-operation branch's
        // LIMIT must not catch the insert
        val stripped = sql.substring(0, toks(i)._2) + sql.substring(close)
        val stoks = wordTokens(stripped).filter(_._4 == 0)
        val limTok = stoks.find(t => t._2 >= toks(i)._2 &&
          t._1.equalsIgnoreCase("limit"))
        limTok match {
          case Some(t) =>
            rewriteDistinctOn(stripped.substring(0, t._2) +
              s"LIMIT 1 BY $cols " + stripped.substring(t._2))
          case None =>
            rewriteDistinctOn(stripped + s" LIMIT 1 BY $cols")
        }
    }
  }

  /** `ORDER BY … LIMIT n WITH TIES` — keep every row tying with the
    * n-th. Spark has no WITH TIES; rewritten to a rank() window over
    * the statement's ORDER BY (rank, not row_number: ties share a
    * rank, which is exactly the TIES contract). Top-level only.
    */
  private def rewriteLimitTies(sql: String): String = {
    val toks = wordTokens(sql).filter(_._4 == 0)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("limit") && i + 2 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("with") &&
        toks(i + 2)._1.equalsIgnoreCase("ties") && {
          val span = sql.substring(toks(i)._3, toks(i + 1)._2).trim
          span.nonEmpty && span.forall(_.isDigit)
        }
    }
    idx match {
      case None => sql
      case Some(i) =>
        val n = sql.substring(toks(i)._3, toks(i + 1)._2).trim
        val obIdx = toks.indices.filter(j => j < i &&
          toks(j)._1.equalsIgnoreCase("order") && j + 1 < toks.length &&
          toks(j + 1)._1.equalsIgnoreCase("by")).lastOption.getOrElse(
          throw new IllegalArgumentException(
            "LIMIT WITH TIES: needs an ORDER BY"))
        val ord = sql.substring(toks(obIdx + 1)._3, toks(i)._2).trim
        val body = sql.substring(0, toks(obIdx)._2).trim
        val tail = sql.substring(toks(i + 2)._3)
        rewriteLimitTies(
          s"SELECT * EXCEPT (__ties_rk) FROM (SELECT *, rank() OVER " +
            s"(ORDER BY $ord) AS __ties_rk FROM ($body)) " +
            s"WHERE __ties_rk <= $n ORDER BY $ord" +
            (if (tail.trim.isEmpty) "" else s" $tail"))
    }
  }

  private def rewriteLimitBy(sql: String): String = {
    val toks = wordTokens(sql).filter(_._4 == 0)
    // find LIMIT <digits> BY at depth 0
    val lbIdx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("limit") && i + 1 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("by") && {
          // the "token" between LIMIT and BY is a number — numbers are
          // not word tokens, so check the raw span is all digits/space
          val span = sql.substring(toks(i)._3, toks(i + 1)._2).trim
          span.nonEmpty && span.forall(_.isDigit)
        }
    }
    lbIdx match {
      case None => sql
      case Some(i) =>
        val nStr = sql.substring(toks(i)._3, toks(i + 1)._2).trim
        // BY columns run to the next depth-0 LIMIT (or end of text)
        val afterBy = toks(i + 1)._3
        val tailLimit = toks.indices
          .find(j => j > i + 1 && toks(j)._1.equalsIgnoreCase("limit"))
        val colsEnd = tailLimit.map(j => toks(j)._2).getOrElse(sql.length)
        val cols = sql.substring(afterBy, colsEnd).trim
        val trailing = tailLimit.map(j => sql.substring(toks(j)._2)).getOrElse("")
        // the statement's ORDER BY (last depth-0 one before LIMIT BY)
        val obIdx = toks.indices.filter(j => j + 1 <= i &&
          toks(j)._1.equalsIgnoreCase("order") && j + 1 < toks.length &&
          toks(j + 1)._1.equalsIgnoreCase("by")).lastOption
        val (body, ord) = obIdx match {
          case Some(j) =>
            (sql.substring(0, toks(j)._2).trim,
              sql.substring(toks(j + 1)._3, toks(i)._2).trim)
          case None => (sql.substring(0, toks(i)._2).trim, "")
        }
        val winOrd = if (ord.nonEmpty) ord else cols
        val outerOrd = if (ord.nonEmpty) s" ORDER BY $ord" else ""
        val sep = if (trailing.nonEmpty) " " else ""
        s"SELECT * EXCEPT (__lb_rn) FROM (SELECT *, row_number() OVER " +
          s"(PARTITION BY $cols ORDER BY $winOrd) AS __lb_rn FROM " +
          s"($body)) WHERE __lb_rn <= $nStr$outerOrd$sep$trailing"
    }
  }

  // ---------------------------------------------------------------
  // ORDER BY … WITH FILL
  // ---------------------------------------------------------------

  /** ClickHouse's time-series gap filler: `ORDER BY x WITH FILL FROM a
    * TO b STEP s` (TO exclusive; STEP defaults to 1). Rewritten as a
    * generated spine FULL-OUTER-joined to the original statement —
    * fill rows appear with NULL in the other columns (CH emits type
    * defaults there; NULL is the honest Spark spelling), original rows
    * outside [a, b) are kept, exactly CH's contract.
    *
    * Supported: the explicit-bounds ascending single-column form at
    * statement top level, with the fill column a bare column or select
    * alias. Data-driven bounds (no FROM/TO), DESC fill, multi-column
    * fill, and INTERPOLATE are rejected loudly. Output column order is
    * the fill column first (a USING-join artifact).
    *
    * Scale shape: the spine is a generated in-memory relation (rows =
    * (b-a)/s, i.e. axis-sized, not data-sized); Catalyst broadcasts
    * it, and the only shuffle is the join/sort the statement already
    * implied.
    */
  private def rewriteWithFill(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("with") && i + 1 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("fill") &&
        toks(i)._4 == toks(i + 1)._4
    }
    idx match {
      case None => sql
      case Some(i) =>
        if (toks(i)._4 != 0) throw new IllegalArgumentException(
          "WITH FILL: only supported at statement top level")
        val obIdx = toks.indices.filter(j =>
          toks(j)._1.equalsIgnoreCase("order") && toks(j)._4 == 0 &&
            j + 1 < toks.length && toks(j + 1)._1.equalsIgnoreCase("by") &&
            toks(j)._2 < toks(i)._2).lastOption.getOrElse(
          throw new IllegalArgumentException(
            "WITH FILL: no owning ORDER BY"))
        var colText = sql.substring(toks(obIdx + 1)._3, toks(i)._2).trim
        val desc = colText.toLowerCase.endsWith(" desc")
        if (desc) colText = colText.dropRight(5).trim
        if (colText.toLowerCase.endsWith(" asc"))
          colText = colText.dropRight(4).trim
        if (colText.contains(",") || !simpleIdentRe.matches(colText) ||
            colText.contains("."))
          throw new IllegalArgumentException(
            "WITH FILL: fill column must be a single bare column or " +
              s"select alias, got '$colText'")
        // FROM <a> TO <b> [STEP <s>] — expressions end at the next
        // top-level segment keyword
        val segKw = Set("to", "step", "limit", "settings", "format",
          "union", "interpolate")
        // the fill segment's word tokens, in order, at depth 0
        def tokAfter(pos: Int): Option[Int] =
          toks.indices.find(j => toks(j)._2 >= pos && toks(j)._4 == 0)
        def exprAfter(kwIdx: Int): (String, Int) = {
          val from = toks(kwIdx)._3
          val stopTok = toks.find(t => t._2 > from && t._4 == 0 &&
            segKw.contains(t._1.toLowerCase))
          val to = stopTok.map(_._2).getOrElse(sql.length)
          (sql.substring(from, to).trim, to)
        }
        if (toks.exists(t => t._4 == 0 &&
            t._1.equalsIgnoreCase("interpolate")))
          throw new IllegalArgumentException(
            "WITH FILL: INTERPOLATE unsupported")
        val fromKw = tokAfter(toks(i + 1)._3).filter(j =>
          toks(j)._1.equalsIgnoreCase("from")).getOrElse(
          throw new IllegalArgumentException(
            "WITH FILL: data-driven bounds unsupported — give FROM … TO …"))
        val (fromExpr, afterFrom) = exprAfter(fromKw)
        val toKw = tokAfter(afterFrom).filter(j =>
          toks(j)._2 == afterFrom && toks(j)._1.equalsIgnoreCase("to"))
          .getOrElse(throw new IllegalArgumentException(
            "WITH FILL: TO bound required"))
        val (toExpr, afterTo) = exprAfter(toKw)
        val (stepExpr, fillEnd) = tokAfter(afterTo) match {
          case Some(sk) if toks(sk)._2 == afterTo &&
              toks(sk)._1.equalsIgnoreCase("step") =>
            exprAfter(sk)
          case _ => (if (desc) "-1" else "1", afterTo)
        }
        val inner = sql.substring(0, toks(obIdx)._2).trim
        val tail = sql.substring(fillEnd)
        // TO is exclusive in both directions (CH's half-open contract)
        val bound = if (desc) ">" else "<"
        val spine = s"(SELECT __fv AS $colText FROM (SELECT " +
          s"explode(sequence(($fromExpr), ($toExpr), ($stepExpr))) AS __fv) " +
          s"WHERE __fv $bound ($toExpr))"
        val ord = if (desc) s"$colText DESC" else colText
        rewriteWithFill(
          s"SELECT * FROM $spine AS __fill FULL JOIN ($inner) AS __q " +
            s"USING ($colText) ORDER BY $ord" +
            (if (tail.trim.isEmpty) "" else s" $tail"))
    }
  }

  // ---------------------------------------------------------------
  // GLOBAL / ALL join-strictness prefixes
  // ---------------------------------------------------------------

  private val joinStarters = Set("any", "left", "right", "inner", "full",
    "cross", "join", "semi", "anti", "asof")

  /** Drops ClickHouse's `GLOBAL` (distributed-shipping hint — Catalyst
    * owns broadcast-vs-shuffle here) and `ALL` (the explicit spelling
    * of default join multiplicity) prefixes in front of join keywords;
    * `GLOBAL IN` / `GLOBAL NOT IN` also lose the hint. `UNION ALL` is
    * never touched — ALL only drops when a join keyword follows it.
    */
  private def stripGlobalAll(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      val w = toks(i)._1.toLowerCase
      val nxt =
        if (i + 1 < toks.length && toks(i + 1)._4 == toks(i)._4)
          toks(i + 1)._1.toLowerCase
        else ""
      (w == "global" && (joinStarters.contains(nxt) || nxt == "in" ||
        nxt == "not")) || (w == "all" && joinStarters.contains(nxt))
    }
    idx match {
      case None => sql
      case Some(i) =>
        var e = toks(i)._3
        while (e < sql.length && sql.charAt(e).isWhitespace) e += 1
        stripGlobalAll(sql.substring(0, toks(i)._2) + sql.substring(e))
    }
  }

  // ---------------------------------------------------------------
  // numbers(n) table function
  // ---------------------------------------------------------------

  /** `FROM numbers(n)` / `numbers(offset, n)` — ClickHouse's integer
    * generator table — becomes a derived table over Spark's `range`
    * TVF with the column renamed to CH's `number`. Only rewrites in
    * relation position (the previous word token is FROM or a join
    * keyword), so a scalar function named `numbers` elsewhere is
    * untouched. A user-supplied alias is kept; otherwise the derived
    * table is aliased `numbers` like CH.
    */
  private def rewriteNumbers(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("numbers") && i > 0 && {
        val prev = toks(i - 1)._1.toLowerCase
        prev == "from" || prev == "join"
      } && {
        var j = toks(i)._3
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        j < sql.length && sql.charAt(j) == '('
      }
    }
    idx match {
      case None => sql
      case Some(i) =>
        var j = toks(i)._3
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val spans = argSpans(sql, j)
        val end = matchParen(sql, j)
        if (end < 0 || spans.isEmpty || spans.length > 2) sql
        else {
          val args = spans.map(sp => sql.substring(sp._1, sp._2).trim)
          val rangeArgs =
            if (args.length == 1) args.head
            else s"${args(0)}, (${args(0)}) + (${args(1)})"
          // keep a user alias if one follows; else alias AS numbers
          val next = toks.find(_._2 >= end)
          val hasAlias = next.exists(t => t._1.equalsIgnoreCase("as") ||
            (t._4 == toks(i)._4 && t._2 == {
              var k = end
              while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
              k
            } && !clauseAfterCond.contains(t._1.toLowerCase) &&
              !joinStarters.contains(t._1.toLowerCase) &&
              !t._1.equalsIgnoreCase("on") && !t._1.equalsIgnoreCase("using")))
          val alias = if (hasAlias) "" else " AS numbers"
          rewriteNumbers(sql.substring(0, toks(i)._2) +
            s"(SELECT id AS number FROM range($rangeArgs))" + alias +
            sql.substring(end))
        }
    }
  }

  // ---------------------------------------------------------------
  // [LEFT] ARRAY JOIN
  // ---------------------------------------------------------------

  /** end of the paren scope containing position `from` at `depth`:
    * first position where depth drops below `depth` (end of string
    * for depth 0).
    */
  private def scopeEndAt(sql: String, from: Int, depth: Int): Int = {
    var j = from; var d = depth
    while (j < sql.length) {
      val ck = commentKind(sql, j)
      if (ck != 0) j = commentEnd(sql, j, ck)
      else sql.charAt(j) match {
        case '(' => d += 1; j += 1
        case ')' => d -= 1; if (d < depth) return j else j += 1
        case '\'' | '"' | '`' => j = quotedEnd(sql, j)
        case _ => j += 1
      }
    }
    sql.length
  }

  /** splits sql[from, to) on top-level commas (quote/comment/paren
    * aware), returning trimmed pieces
    */
  private def splitTopLevel(sql: String, from: Int, to: Int): Seq[String] = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = from; var d = 0; var start = from
    while (j < to) {
      val ck = commentKind(sql, j)
      if (ck != 0) j = commentEnd(sql, j, ck)
      else sql.charAt(j) match {
        case '(' => d += 1; j += 1
        case ')' => d -= 1; j += 1
        case ',' if d == 0 =>
          pieces += sql.substring(start, j).trim; start = j + 1; j += 1
        case '\'' | '"' | '`' => j = quotedEnd(sql, j)
        case _ => j += 1
      }
    }
    pieces += sql.substring(start, to).trim
    pieces.toSeq.filter(_.nonEmpty)
  }

  private val simpleIdentRe =
    "^[A-Za-z_][A-Za-z_0-9]*(?:\\.[A-Za-z_][A-Za-z_0-9]*)*$".r
  private val baseRelRe =
    "^([A-Za-z_][A-Za-z_0-9.]*)(?:\\s+(?:[Aa][Ss]\\s+)?([A-Za-z_][A-Za-z_0-9]*))?$".r

  private case class AjItem(expr: String, alias: String, shadow: Option[String])

  /** Rewrites `FROM <base> [LEFT] ARRAY JOIN item, …` into a derived
    * table that explodes the item(s). One item → plain
    * `explode`/`explode_outer`; several items → ClickHouse's LOCKSTEP
    * zip (parallel arrays advance together — NOT a cross product) via
    * a single `explode(arrays_zip(…))`. Bare-column items SHADOW the
    * source column (the CH contract: inside the query `arr` means the
    * element); `expr AS alias` items keep the source. One occurrence
    * per pass, recursing for nested/multiple clauses.
    */
  private def rewriteArrayJoin(sql: String): String = {
    val toks = wordTokens(sql)
    val idx = toks.indices.find { i =>
      toks(i)._1.equalsIgnoreCase("array") && i + 1 < toks.length &&
        toks(i + 1)._1.equalsIgnoreCase("join") &&
        toks(i)._4 == toks(i + 1)._4
    }
    idx match {
      case None => sql
      case Some(i) =>
        val d = toks(i)._4
        val isLeft = i > 0 && toks(i - 1)._1.equalsIgnoreCase("left") &&
          toks(i - 1)._4 == d
        val clauseStart = if (isLeft) toks(i - 1)._2 else toks(i)._2
        val fromIdx = toks.indices.filter(j =>
          toks(j)._1.equalsIgnoreCase("from") && toks(j)._4 == d &&
            toks(j)._2 < clauseStart).lastOption.getOrElse(
          throw new IllegalArgumentException(
            "ARRAY JOIN: no owning FROM clause found"))
        val base = sql.substring(toks(fromIdx)._3, clauseStart).trim
        val itemsStart = toks(i + 1)._3
        val sEnd = scopeEndAt(sql, itemsStart, d)
        val clauseKw = Set("where", "prewhere", "group", "order", "limit",
          "having", "settings", "format", "union", "intersect", "except",
          "window", "qualify")
        val itemsEnd = toks.find(t => t._2 >= itemsStart && t._2 < sEnd &&
          t._4 == d && clauseKw.contains(t._1.toLowerCase))
          .map(_._2).getOrElse(sEnd)
        val items = splitTopLevel(sql, itemsStart, itemsEnd).map { it =>
          // top-level `expr AS alias`?
          val itToks = wordTokens(it)
          itToks.reverse.find(t => t._4 == 0 &&
            t._1.equalsIgnoreCase("as")) match {
            case Some(asTok)
                if itToks.lastOption.exists(l => l._3 == it.length &&
                  l._2 > asTok._3 &&
                  simpleIdentRe.matches(l._1)) =>
              AjItem(it.substring(0, asTok._2).trim, itToks.last._1, None)
            case _ if simpleIdentRe.matches(it) =>
              val seg = it.split('.').last
              AjItem(it, seg, Some(seg))
            case _ => throw new IllegalArgumentException(
              s"ARRAY JOIN: expression item needs an alias: $it")
          }
        }
        if (items.isEmpty) throw new IllegalArgumentException(
          "ARRAY JOIN: no items")
        val explodeFn = if (isLeft) "explode_outer" else "explode"
        val sub =
          if (items.length == 1) {
            val it = items.head
            val exceptCl = it.shadow.map(c => s" EXCEPT ($c)").getOrElse("")
            s"(SELECT *$exceptCl, $explodeFn(${it.expr}) AS ${it.alias} " +
              s"FROM $base)"
          } else {
            // lockstep zip; field names: a NamedExpression child keeps
            // its name in arrays_zip's struct, any other child is named
            // by its argument index
            items.foreach { it =>
              if (it.shadow.isDefined && it.expr.contains("."))
                throw new IllegalArgumentException(
                  "ARRAY JOIN: qualified bare columns are not supported " +
                    s"in the multi-item form; alias it: ${it.expr}")
            }
            val zipArgs = items.map(_.expr).mkString(", ")
            val projections = items.zipWithIndex.map { case (it, k) =>
              val ref =
                if (simpleIdentRe.matches(it.expr))
                  s"__aj.${it.expr.split('.').last}"
                else s"__aj['$k']"
              s"$ref AS ${it.alias}"
            }
            val excepts = "__aj" +: items.flatMap(_.shadow)
            s"(SELECT * EXCEPT (${excepts.mkString(", ")}), " +
              s"${projections.mkString(", ")} FROM (SELECT *, " +
              s"$explodeFn(arrays_zip($zipArgs)) AS __aj FROM $base))"
          }
        val outerAlias = base match {
          case baseRelRe(name, al) =>
            " AS " + (if (al != null) al else name.split('.').last)
          case _ => ""
        }
        rewriteArrayJoin(sql.substring(0, toks(fromIdx)._2) + "FROM " +
          sub + outerAlias + " " + sql.substring(itemsEnd))
    }
  }

  // ---------------------------------------------------------------
  // function-call rewrites (token-stream pass)
  // ---------------------------------------------------------------

  /** registry aggregates whose builder root is a plain
    * AggregateFunction — eligible for the generic `-If` combinator via
    * `FILTER (WHERE …)` (the analyzer attaches a filter clause only to
    * a direct aggregate call). The hand-tuned If family that ChCompat
    * registers explicitly (countIf, sumIf, avgIf, minIf, maxIf,
    * uniqIf, uniqExactIf, groupArrayIf) is NOT listed — those resolve
    * through their registered builders unchanged.
    */
  private val genericIfPrefixes = Set("any", "anyLast", "argMin", "argMax",
    "median", "groupUniqArray", "uniqCombined", "uniqHLL12", "stddevPop",
    "stddevSamp", "varPop", "varSamp", "corr", "covarPop", "covarSamp",
    "skewPop")

  private def rewriteFunctions(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length

    def copyQuoted(): Unit = {
      val e = quotedEnd(sql, i)
      out ++= sql.substring(i, e); i = e
    }

    while (i < n) {
      val ck = commentKind(sql, i)
      if (ck != 0) {
        val e = commentEnd(sql, i, ck)
        out ++= sql.substring(i, e); i = e
      } else sql.charAt(i) match {
        case '\'' | '"' | '`' => copyQuoted()
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
            if (word == "MD5" || word == "SHA1" || word == "SHA256") {
              // case-SENSITIVE: CH's uppercase digest spellings return
              // FixedString binary (ChCompat's ch-prefixed builders);
              // lowercase md5()/sha1() keep Spark's hex-string
              // semantics — the registry alone can't split these (its
              // lookup is case-insensitive)
              out ++= "ch" + word; i = j
            } else if (lower == "datediff" || lower == "date_diff") {
              // only the CH form: quoted first arg AND 3-4 args (the
              // 4th is CH's optional timezone) — Spark's 2-arg
              // datediff('2024-01-05', d) passes through
              var k = j + 1
              while (k < n && sql.charAt(k).isWhitespace) k += 1
              val nargs = topLevelArgs(sql, j)
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
            } else if (lower == "arraycount" || lower == "arrayfirst"
                || lower == "arrayfirstindex") {
              // CH lambda-first forms whose Spark equivalent needs a
              // non-HOF wrapper (size / try_element_at) — the analyzer
              // only accepts lambdas whose resolved root is a HOF, so
              // these are respelled textually around the built-in
              // `filter` instead of going through a registry builder.
              // (arrayFirst yields NULL when nothing matches — CH
              // returns the element type's default value there; NULL
              // is the honest Spark spelling of "no match".)
              val spans = argSpans(sql, j)
              if (spans.length == 2) {
                // recurse into the copied spans — lambdas routinely
                // contain nested CH calls (position, count(), …)
                val lam = rewriteFunctions(
                  sql.substring(spans(0)._1, spans(0)._2).trim)
                val arr = rewriteFunctions(
                  sql.substring(spans(1)._1, spans(1)._2).trim)
                out ++= (if (lower == "arraycount")
                  s"size(filter($arr, $lam))"
                else if (lower == "arrayfirstindex")
                  // index of first lambda hit; array_position's
                  // 0-when-absent IS CH's no-match value
                  s"array_position(transform($arr, $lam), true)"
                else s"try_element_at(filter($arr, $lam), 1)")
                i = matchParen(sql, j)
              } else out ++= word
            } else if (lower == "position") {
              // CH comma-form position(haystack, needle[, start]) —
              // reversed args vs Spark's built-in. The 1-arg
              // `POSITION(x IN y)` standard form passes through.
              val nargs = topLevelArgs(sql, j)
              if (nargs == 2 || nargs == 3) { out ++= "chPosition"; i = j }
              else out ++= word
            } else if (lower == "extract") {
              // CH regex extract(haystack, re) — 2 comma args; the
              // 1-arg `EXTRACT(YEAR FROM ts)` standard form passes
              // through to Spark's date-part built-in.
              val nargs = topLevelArgs(sql, j)
              if (nargs == 2) { out ++= "chExtract"; i = j }
              else out ++= word
            } else if (lower == "transform") {
              // CH value-mapping transform(x, from, to[, default]) —
              // 3/4 comma args; the 2-arg lambda form passes through
              // to Spark's array HOF untouched.
              val nargs = topLevelArgs(sql, j)
              if (nargs == 3 || nargs == 4) { out ++= "chTransform"; i = j }
              else out ++= word
            } else if (word.length > 2 && word.endsWith("If") &&
                genericIfPrefixes.contains(word.dropRight(2))) {
              // generic -If combinator: agg args…, cond (last arg)
              val spans = argSpans(sql, j)
              if (spans.length >= 2) {
                val args = spans.dropRight(1).map(sp =>
                  rewriteFunctions(sql.substring(sp._1, sp._2).trim))
                  .mkString(", ")
                val cond = rewriteFunctions(
                  sql.substring(spans.last._1, spans.last._2).trim)
                out ++= s"${word.dropRight(2)}($args) FILTER (WHERE $cond)"
                i = matchParen(sql, j)
              } else out ++= word
            } else curried.get(word) match {
              case Some(flat) =>
                val endParams = matchParen(sql, j)
                var k = endParams
                while (k >= 0 && k < n && sql.charAt(k).isWhitespace) k += 1
                if (endParams > 0 && k >= 0 && k < n && sql.charAt(k) == '(') {
                  val endArgs = matchParen(sql, k)
                  if (endArgs > 0) {
                    // recurse into params/args so nested CH-isms
                    // (count(), position(a, b), inner curried calls)
                    // are rewritten too
                    val params = rewriteFunctions(
                      sql.substring(j + 1, endParams - 1).trim)
                    val args = rewriteFunctions(
                      sql.substring(k + 1, endArgs - 1).trim)
                    val glue = if (params.isEmpty) "" else ", "
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-cleaning scalar functions for the training-data pipeline:
  * PII redaction and URL canonicalization. Both are pure
  * `regexp_replace`/`regexp_extract`/HOF compositions over built-ins,
  * so they stay inside whole-stage codegen and run map-only — no
  * shuffle, no UDF, the per-row cost profile a 100 TB scrub pass
  * needs (the scan is the bottleneck, as it should be).
  *
  * Pattern notes (cross-engine discipline): every regex here sticks
  * to the syntax subset with identical semantics in Java's engine
  * (Spark) and RE2 (DuckDB, used by the oracle): character classes,
  * bounded repetition, `\b`/`\d`, and the `(?i)` inline flag — no
  * lookaround, no backreferences IN PATTERNS. Replacement strings are
  * literals (no `$1`/`\1`), sidestepping the one place the two
  * engines' syntax genuinely differs.
  */
object ScrubFunctions {

  /** RFC-casual email matcher — the practical scrubbing pattern, not
    * a full RFC 5322 validator (which needs constructs RE2 lacks).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. `\b` keeps it from eating into longer digit
    * runs; octet-range validation (0-255) is deliberately omitted —
    * scrubbing over-matches by design (a "999.1.1.1" is still not
    * text worth keeping unredacted).
    */
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style dashed phone number (555-123-4567). */
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact emails, IPv4 addresses and phone numbers with typed
    * placeholder tokens. Order matters and is part of the contract:
    * emails first (their host part contains dots that the IP pattern
    * must never see half-consumed), then IPs, then phones (dashed,
    * dot-free — cannot collide with either earlier pass).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-category match counts on the ORIGINAL text (audit columns —
    * a scrub report wants "how much PII" alongside the redacted
    * output). Int-typed so the gate compares exact integers.
    */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(emailPattern)).cast("int").as("n_email"),
    regexp_count(text, lit(ipv4Pattern)).cast("int").as("n_ip"),
    regexp_count(text, lit(phonePattern)).cast("int").as("n_phone"))

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe = "\\?([^#]*)"

  /** Canonicalize an absolute http(s) URL for web-corpus dedup: the
    * same page crawled as `HTTPS://Site.COM:443/a/?utm_source=x#top`
    * and `https://site.com/a?ref=1` must collapse when they differ
    * only in junk. Steps:
    *   - scheme + host lowercased (path/query case is significant and
    *     preserved);
    *   - default port dropped (`:443` for https, `:80` for http);
    *   - fragment dropped (never sent to the server);
    *   - tracking params dropped (`utm_*`, `gclid`, `fbclid`,
    *     case-insensitive) and the survivors SORTED — param order is
    *     not semantic, so sorting maximizes collapse;
    *   - trailing path slashes trimmed; bare root normalized to `/`.
    *
    * Everything is regexp_extract/replace + `filter`/`array_sort`/
    * `array_join` over the split param list — codegen'd, map-only.
    * Non-URLs (no scheme) canonicalize to `://` junk; callers filter
    * their input to URL-shaped rows first.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val hostport = lower(regexp_extract(url, hostRe, 1))
    val host =
      when(scheme === "https", regexp_replace(hostport, ":443$", ""))
        .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    val trimmedPath = regexp_replace(regexp_extract(url, pathRe, 1), "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val params = filter(split(regexp_extract(url, queryRe, 1), "&"),
      p => p =!= "" && !p.rlike("(?i)^(utm_[a-z]+|gclid|fbclid)="))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}

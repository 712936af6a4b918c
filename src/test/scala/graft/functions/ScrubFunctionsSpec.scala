package graft.functions

import graft.SparkTestBase
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** PII redaction + URL canonicalization + corpus boilerplate removal —
  * the corpus-cleaning trio behind gates t11/d08/p06.
  */
class ScrubFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub1(s: String): String =
    Seq(s).toDF("t").select(ScrubFunctions.scrubPii(col("t"))).as[String].head()

  private def canon1(s: String): String =
    Seq(s).toDF("u").select(ScrubFunctions.canonicalUrl(col("u"))).as[String].head()

  test("scrubPii redacts email, IPv4 and phone with typed tokens") {
    assert(scrub1("mail a.b+c@ex-1.org now") === "mail <EMAIL> now")
    assert(scrub1("at 192.168.0.1 and 10.0.0.255.") === "at <IP> and <IP>.")
    assert(scrub1("call 555-123-4567 today") === "call <PHONE> today")
    assert(scrub1("u1@h.io or 1.2.3.4 or 555-000-1111") ===
      "<EMAIL> or <IP> or <PHONE>")
  }

  test("scrubPii boundary semantics: no partial eats, no false hits") {
    // \b stops the IP pattern from biting into longer digit runs
    assert(scrub1("version 1.2.3.4.5 ok") === "version <IP>.5 ok")
    // digits without the dashed shape are not phones
    assert(scrub1("id 5551234567") === "id 5551234567")
    // '@' alone is not an email
    assert(scrub1("a @ b.com") === "a @ b.com")
    // counts agree with what scrubbing found
    val r = Seq("x@y.zz 1.2.3.4 call 555-111-2222 and 9.9.9.9")
      .toDF("t").select(ScrubFunctions.piiCounts(col("t")): _*).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((1, 2, 1)))
  }

  test("canonicalUrl folds case/port/fragment/tracking/slash junk") {
    assert(canon1("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&ref=1#top") ===
      "https://www.ex.com/A/b?ref=1")
    // http default port; params sorted; utm_* family and gclid dropped
    assert(canon1("http://ex.com:80/p?z=2&a=1&gclid=abc&UTM_Medium=m") ===
      "http://ex.com/p?a=1&z=2")
    // non-default port survives; path case preserved
    assert(canon1("https://Ex.com:8443/Path") === "https://ex.com:8443/Path")
    // bare host canonicalizes to root path; empty query drops the '?'
    assert(canon1("https://ex.com?") === "https://ex.com/")
    // :80 on https is NOT a default port — kept
    assert(canon1("https://ex.com:80/x") === "https://ex.com:80/x")
  }

  test("removeBoilerplate drops cross-doc paragraphs, keeps order") {
    val docs = Seq(
      (1L, "unique one\n\nshared footer\n\nmiddle bit"),
      (2L, "shared footer\n\nunique two"),
      (3L, "unique three\n\nshared footer"),
      (4L, "shared footer"), // fully boilerplate → disappears
      (5L, "keep a\n\nshared footer\n\nkeep b")
    ).toDF("id", "text")
    val out = TextDedup.removeBoilerplate(docs, "id", "text", minDocs = 3L)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L))
    // order preserved: kept paragraphs rejoin in original positions
    assert(out.head === ((1L, "unique one\n\nmiddle bit", 2L, 1L)))
    assert(out(1) === ((2L, "unique two", 1L, 1L)))
    assert(out(3) === ((5L, "keep a\n\nkeep b", 2L, 1L)))
  }

  test("removeBoilerplate: below-threshold repeats survive") {
    val docs = Seq(
      (1L, "dup\n\na"), (2L, "dup\n\nb"), (3L, "solo")
    ).toDF("id", "text")
    // minDocs=3: "dup" appears in only 2 docs → kept everywhere
    val out = TextDedup.removeBoilerplate(docs, "id", "text", minDocs = 3L)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq("dup\n\na", "dup\n\nb", "solo"))
    assert(out.forall(_._4 === 0L))
  }

  test("scrub_pii / pii_counts / canonical_url from SQL match the Column API") {
    PipelineFunctions.registerAll(spark)
    val df = Seq("u@v.ww at 1.2.3.4", "HTTPS://A.COM:443/x?utm_source=s&k=1")
      .toDF("t")
    df.createOrReplaceTempView("scrub_probe")
    val viaSql = spark.sql(
      """SELECT scrub_pii(t) AS s, pii_counts(t).n_email AS ne,
                canonical_url(t) AS cu
         FROM scrub_probe""").collect()
    val viaCols = df.select(
      ScrubFunctions.scrubPii(col("t")).as("s"),
      ScrubFunctions.piiCounts(col("t")).head.as("ne"),
      ScrubFunctions.canonicalUrl(col("t")).as("cu")).collect()
    assert(viaSql.toSeq === viaCols.toSeq)
  }
}

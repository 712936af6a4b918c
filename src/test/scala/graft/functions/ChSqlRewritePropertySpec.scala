package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Rewriter total-ness and pass-through: the dialect front-end sits in
  * front of EVERY query (GraftExtensions injects it into plain
  * spark.sql), so two properties are load-bearing:
  *
  *  1. PASS-THROUGH — SQL built only from non-ClickHouse vocabulary
  *     must come back byte-identical (the "plain Spark SQL is
  *     untouched" contract of GraftExtensions).
  *  2. TOTAL-NESS — ARBITRARY text (including unbalanced quotes,
  *     parens, stray keywords) must never throw from the rewrite
  *     except the documented IllegalArgumentException for unsupported
  *     ASOF/sequence shapes — a front-end that crashes on garbage
  *     takes every statement down with it.
  *
  * Raw ScalaCheck Gens sampled with fixed seeds (same pattern as
  * ParserPropertySpec — the scalatestplus bridge is not among the
  * offline deps).
  */
class ChSqlRewritePropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val ident = Gen.oneOf("a", "b2", "col_x", "tbl", "u", "v9")
  private val lit = Gen.oneOf("1", "2.5", "'s'", "NULL", "true")
  private val safeFn = Gen.oneOf("sum", "count", "max", "lower", "abs")

  private val expr: Gen[String] = for {
    l <- Gen.oneOf(ident, lit)
    f <- safeFn
    r <- Gen.oneOf(ident, lit)
    shape <- Gen.choose(0, 3)
  } yield shape match {
    case 0 => l
    case 1 => s"$f($l)"
    case 2 => s"$l + $r"
    case 3 => s"$f($l) > $r"
  }

  private val plainSql: Gen[String] = for {
    cols <- Gen.listOfN(2, expr)
    t <- ident
    w <- expr
    g <- ident
    shape <- Gen.choose(0, 2)
  } yield shape match {
    case 0 => s"SELECT ${cols.mkString(", ")} FROM $t WHERE $w"
    case 1 => s"SELECT $g, count(*) FROM $t GROUP BY $g ORDER BY $g"
    case 2 => s"SELECT ${cols.head} FROM $t JOIN ${t}2 USING (id) LIMIT 5"
  }

  test("non-CH SQL passes through byte-identical") {
    sample(plainSql, 300).foreach { q =>
      assert(ChSqlRewrite(q) === q, s"rewrite changed plain SQL: $q")
    }
  }

  private val junkToken = Gen.oneOf(
    "SELECT", "FROM", "WHERE", "LIMIT", "BY", "FINAL", "SAMPLE",
    "ARRAY", "JOIN", "USING", "WITH", "TOTALS", "PREWHERE", "GLOBAL",
    "system", ".", ",", "(", ")", "'", "\"", "`", "--", "/*", "*/",
    "1", "x", "quantile(0.5)(v)", "dateDiff", "numbers", "FILL",
    "ASOF", "ON", "=", ">=", "\n")

  private val junkSql: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, junkToken).map(_.mkString(" ")))

  test("arbitrary token soup never crashes the rewriter") {
    sample(junkSql, 500).foreach { q =>
      try ChSqlRewrite(q)
      catch {
        // the documented refusals are fine; anything else is a bug
        case _: IllegalArgumentException =>
        case e: Throwable =>
          fail(s"rewriter threw ${e.getClass.getSimpleName} on: $q", e)
      }
    }
  }
}

package graft.functions

import graft.SparkTestBase

/** Hand-computed repetition signals: the Gopher-style filters must
  * flag looped text and pass varied text. */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("repetitionSignals: spam loop vs varied text vs single token") {
    val df = Seq(
      (1L, "buy now buy now buy now"),     // 6 toks, 2 distinct, bigrams 5 (2 distinct... )
      (2L, "one two three four"),          // all distinct
      (3L, "word"))                        // single token: no bigrams
      .toDF("doc_id", "text")
    val got = TextFunctions.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()

    val (_, n1, d1, t1, dr1, ts1, db1) = got(0)
    assert((n1, d1, t1) == ((6L, 2L, 3L)))
    assert(dr1 == 0.3333 && ts1 == 0.5)
    // bigrams: "buy now","now buy","buy now","now buy","buy now" → 5 total, 2 distinct
    assert(db1 == 0.6)

    val (_, n2, d2, _, dr2, ts2, db2) = got(1)
    assert((n2, d2) == ((4L, 4L)))
    assert(dr2 == 1.0 && ts2 == 0.25 && db2 == 0.0)

    val (_, n3, _, _, _, _, db3) = got(2)
    assert(n3 == 1L && db3 == 0.0) // no bigrams → fraction 0, not NaN
  }
}

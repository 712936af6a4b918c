package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** As-of join semantics: latest at-or-before match per key, ties
  * include the same-instant right row, no match → null payload, and
  * the payload is carried atomically per right row. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("latest at-or-before, tie inclusion, and null for no-prior") {
    val trades = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "k", 50L), (4L, "z", 10L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 100L, 1.0), ("k", 200L, 2.0), ("k", 300L, 3.0))
      .toDF("sym", "t", "px")
    val got = AsOfJoin.asOf(trades, quotes, "sym", "t", "t",
        Map("px" -> "asof_px", "t" -> "asof_t"))
      .select("trade_id", "asof_px", "asof_t")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) == ((Some(1.0), Some(100L))))  // tie: same-instant quote matches
    assert(got(2L) == ((Some(2.0), Some(200L))))  // latest prior, not the later 300
    assert(got(3L) == ((None, None)))             // before any quote
    assert(got(4L) == ((None, None)))             // key with no quotes at all
  }

  test("null payload values don't stitch columns from different right rows") {
    val left = Seq(("k", 10L, 1L)).toDF("sym", "t", "lid")
    val right = Seq(("k", 1L, Some(7.0), "old"), ("k", 5L, None, "new"))
      .toDF("sym", "t", "px", "tag")
    val row = AsOfJoin.asOf(left, right, "sym", "t", "t",
        Map("px" -> "apx", "tag" -> "atag"))
      .select("apx", "atag").head
    // the matched right ROW is (t=5, px=null, tag=new): px must be
    // null, NOT backfilled from the older row
    assert(row.isNullAt(0) && row.getString(1) == "new")
  }
}

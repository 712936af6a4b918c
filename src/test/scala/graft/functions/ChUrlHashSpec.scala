package graft.functions

import graft.SparkTestBase

/** Golden outputs for the round-7 alias widening: URL family,
  * hash family, tuple/tupleElement, relative-time buckets,
  * toStartOfInterval, and the second array-math batch.
  */
class ChUrlHashSpec extends SparkTestBase {

  test("URL family over parse_url; '' for absent parts (CH contract)") {
    ChCompat.registerAll(spark)
    val u = "'https://www.github.com/apache/spark/pulls?state=open&page=2#top'"
    val r = spark.sql(
      s"""SELECT protocol($u) AS pr, domain($u) AS d,
                 domainWithoutWWW($u) AS dw, topLevelDomain($u) AS tld,
                 path($u) AS p, queryString($u) AS qs,
                 extractURLParameter($u, 'state') AS st,
                 extractURLParameter($u, 'missing') AS ms,
                 cutQueryString($u) AS cq""").head
    assert(r.getString(0) === "https")
    assert(r.getString(1) === "www.github.com")
    assert(r.getString(2) === "github.com")
    assert(r.getString(3) === "com")
    assert(r.getString(4) === "/apache/spark/pulls")
    assert(r.getString(5) === "state=open&page=2")
    assert(r.getString(6) === "open")
    assert(r.getString(7) === "")
    assert(r.getString(8) === "https://www.github.com/apache/spark/pulls#top")
  }

  test("hash family: uniform-contract names + bit-exact halfMD5") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT sipHash64('abc') AS s1, cityHash64('abc') AS s2,
                sipHash64('abc', 42) AS s3,
                intHash32(7) AS i32,
                halfMD5('abc') AS hm,
                hex(255) AS hx, MD5('abc') AS md,
                SHA256('abc') AS sh""").head
    // same contract, same engine → sipHash64 == cityHash64 here
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(2) !== r.getLong(0)) // extra arg changes the hash
    // halfMD5('abc'): md5 = 900150983cd24fb0…; first 8 bytes big-endian
    assert(r.getDecimal(4) === new java.math.BigDecimal(
      new java.math.BigInteger("900150983cd24fb0", 16)))
    assert(r.getString(5) === "FF")
    assert(r.getString(6) === "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(7) ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("tuple / tupleElement by index and name") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT tupleElement(tuple(1, 'x'), 2) AS byIdx,
                tupleElement(named_struct('a', 7, 'b', 'y'), 'b') AS byName,
                tuple(user_id, event_type) AS t
         FROM VALUES (5, 'click') AS t(user_id, event_type)""").head
    assert(r.getString(0) === "x")
    assert(r.getString(1) === "y")
    assert(r.getStruct(2).getInt(0) === 5)
    assert(r.getStruct(2).getString(1) === "click")
  }

  test("relative-time buckets and toStartOfInterval") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT toRelativeSecondNum(TIMESTAMP'1970-01-01 01:00:10') AS rs,
                toRelativeMinuteNum(TIMESTAMP'1970-01-01 01:00:10') AS rm,
                toRelativeHourNum(TIMESTAMP'1970-01-01 01:00:10') AS rh,
                toRelativeDayNum(TIMESTAMP'1970-01-03 01:00:10') AS rd,
                toStartOfFiveMinutes(TIMESTAMP'2015-03-07 14:17:45') AS s5,
                toStartOfFifteenMinutes(TIMESTAMP'2015-03-07 14:17:45') AS s15,
                toStartOfInterval(TIMESTAMP'2015-03-07 14:17:45',
                                  INTERVAL 10 MINUTE) AS i10,
                toStartOfInterval(TIMESTAMP'2015-03-07 14:17:45',
                                  INTERVAL 1 MONTH) AS im""").head
    assert(r.getLong(0) === 3610L)
    assert(r.getLong(1) === 60L)
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 2L)
    assert(r.getTimestamp(4).toString === "2015-03-07 14:15:00.0")
    assert(r.getTimestamp(5).toString === "2015-03-07 14:15:00.0")
    assert(r.getTimestamp(6).toString === "2015-03-07 14:10:00.0")
    assert(r.getTimestamp(7).toString === "2015-03-01 00:00:00.0")
  }

  test("array math batch 2: cumsum/difference/compact/avg/product/zip/intersect") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT arrayCumSum(array(1, 2, 3)) AS cs,
                arrayDifference(array(10, 7, 12)) AS df,
                arrayCompact(array(1, 1, 2, 1, 1)) AS cp,
                arrayCompact(array('a', 'a', 'b')) AS cps,
                arrayAvg(array(2.0, 4.0)) AS av,
                arrayAvg(array()) AS av0,
                arrayProduct(array(2, 3, 4)) AS pr,
                arrayIntersect(array(1, 2, 3), array(2, 3, 4)) AS ai,
                arrayZip(array(1, 2), array('a', 'b')) AS az,
                arrayPopBack(array(1, 2, 3)) AS pb,
                arrayPopBack(array()) AS pb0,
                arrayPushFront(array(2, 3), 1) AS pf,
                alphaTokens('ab12cd ef') AS at""").head
    assert(r.getSeq[Double](0) === Seq(1.0, 3.0, 6.0))
    assert(r.getSeq[Double](1) === Seq(0.0, -3.0, 5.0))
    assert(r.getSeq[Int](2) === Seq(1, 2, 1))
    assert(r.getSeq[String](3) === Seq("a", "b"))
    assert(r.getDouble(4) === 3.0)
    assert(r.getDouble(5) === 0.0)
    assert(r.getDouble(6) === 24.0)
    assert(r.getSeq[Int](7).sorted === Seq(2, 3))
    val az = r.getSeq[org.apache.spark.sql.Row](8)
    assert(az.map(x => (x.getInt(0), x.getString(1))) === Seq((1, "a"), (2, "b")))
    assert(r.getSeq[Int](9) === Seq(1, 2))
    assert(r.getSeq[Int](10) === Seq.empty)
    assert(r.getSeq[Int](11) === Seq(1, 2, 3))
    assert(r.getSeq[String](12) === Seq("ab", "cd", "ef"))
  }

  test("lagInFrame/leadInFrame, assumeNotNull/toNullable, emptyArray*") {
    ChCompat.registerAll(spark)
    val rows = spark.sql(
      """SELECT v,
                lagInFrame(v) OVER (ORDER BY v) AS lg,
                leadInFrame(v, 1, -1) OVER (ORDER BY v) AS ld,
                assumeNotNull(v) AS an,
                emptyArrayString() AS es,
                emptyArrayInt64() AS ei
         FROM VALUES (1), (2), (3) AS t(v) ORDER BY v""").collect()
    assert(rows.map(r => (r.getInt(0),
      if (r.isNullAt(1)) -1 else r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1, -1, 2), (2, 1, 3), (3, 2, -1)))
    assert(rows.head.getSeq[String](4) === Seq.empty)
    assert(rows.head.getSeq[Long](5) === Seq.empty)
  }

  test("CH transform(x, from, to, default) via arity dispatch; HOF intact") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT transform(v, array(1, 2), array('one', 'two'), 'other') AS t4,
                transform(array(1, 2), x -> x * 10) AS hof
         FROM VALUES (1), (2), (9) AS t(v) ORDER BY v""").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("one", "two", "other"))
    assert(r.head.getSeq[Int](1) === Seq(10, 20))
    // 3-arg form: unmapped values pass through
    val r3 = ChCompat.sql(spark,
      "SELECT transform(5, array(1), array(100)) AS t3").head
    assert(r3.getInt(0) === 5)
  }

  test("arrayReduce dispatches on the aggregate-name literal") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT arrayReduce('sum', array(1, 2, 3)) AS s,
                arrayReduce('max', array(1, 5, 3)) AS mx,
                arrayReduce('avg', array(2.0, 4.0)) AS av,
                arrayReduce('count', array(7, 8)) AS c,
                arrayReduce('uniqExact', array(1, 1, 2)) AS u""").head
    assert(r.getDouble(0) === 6.0)
    assert(r.getInt(1) === 5)
    assert(r.getDouble(2) === 3.0)
    assert(r.getInt(3) === 2)
    assert(r.getInt(4) === 2)
    val e = intercept[Exception] {
      spark.sql("SELECT arrayReduce('median', array(1))").collect()
    }
    assert(e.getMessage.contains("arrayReduce"))
  }

  test("loud errors: toStartOfInterval non-literal, tupleElement bad index") {
    ChCompat.registerAll(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT toStartOfInterval(now(), INTERVAL 5 MONTH)").collect()
    }
    assert(e1.getMessage.contains("unsupported"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT tupleElement(tuple(1), 1.5)").collect()
    }
    assert(e2.getMessage.contains("tupleElement"))
  }
}

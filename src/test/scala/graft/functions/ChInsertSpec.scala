package graft.functions

import graft.SparkTestBase

/** ChInsert: the CH HTTP-protocol data-bearing INSERT forms. */
class ChInsertSpec extends SparkTestBase {

  private def freshTarget(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$name"))
    spark.sql(
      s"CREATE TABLE $name (id BIGINT, name STRING, score DOUBLE) " +
        "USING parquet")
  }

  test("FORMAT JSONEachRow: target schema, missing=NULL, unknown ignored") {
    freshTarget("ins_json")
    val n = ChInsert.insert(spark,
      """INSERT INTO ins_json FORMAT JSONEachRow
        |{"id": 1, "name": "a", "score": 1.5}
        |{"id": 2, "score": 2.5, "bogus_field": true}
        |{"id": 3, "name": "c"}""".stripMargin)
    assert(n === 3)
    val rows = spark.table("ins_json").orderBy("id")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("-"),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "a", 1.5), (2L, "-", 2.5), (3L, "c", -1.0)))
  }

  test("column list restricts; unlisted columns NULL") {
    freshTarget("ins_cols")
    ChInsert.insert(spark,
      """INSERT INTO ins_cols (id, name) FORMAT JSONEachRow
        |{"id": 7, "name": "x", "score": 99.0}""".stripMargin)
    val r = spark.table("ins_cols").head
    assert(r.getLong(0) === 7L && r.getString(1) === "x" && r.isNullAt(2))
  }

  test("FORMAT Values rewrites to native VALUES") {
    freshTarget("ins_vals")
    val n = ChInsert.insert(spark,
      "INSERT INTO ins_vals FORMAT Values (1, 'a', 1.0), (2, 'b', 2.0)")
    assert(n === 2)
    assert(spark.table("ins_vals").count() === 2)
  }

  test("malformed JSON rejects the batch instead of writing NULLs") {
    freshTarget("ins_bad")
    intercept[Exception](ChInsert.insert(spark,
      "INSERT INTO ins_bad FORMAT JSONEachRow\n{not valid json}"))
    assert(spark.table("ins_bad").count() === 0)
  }

  test("matches() only fires on data-bearing forms") {
    assert(ChInsert.matches("INSERT INTO t FORMAT JSONEachRow\n{}"))
    assert(ChInsert.matches("insert into t format values (1)"))
    assert(!ChInsert.matches("INSERT INTO t VALUES (1)"))
    assert(!ChInsert.matches("SELECT 1 FORMAT JSONEachRow"))
  }
}

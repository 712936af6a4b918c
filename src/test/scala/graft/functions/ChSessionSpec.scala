package graft.functions

import graft.SparkTestBase

/** The "ClickHouse user's day" — one session driving the ENTIRE
  * statement surface through the single [[ChCompat.sql]] entry point,
  * in the order a real migration exercises it: CREATE TABLE with a
  * Replacing engine, INSERT, FINAL reads, a mutation, OPTIMIZE FINAL,
  * schema evolution, a materialized view over the table, and
  * system.* introspection. Every intermediate state is asserted, so a
  * regression in any one front-end breaks here even if its own spec
  * still passes in isolation.
  */
class ChSessionSpec extends SparkTestBase {

  private def ch(q: String) = ChCompat.sql(spark, q)

  test("end-to-end ClickHouse session over one table") {
    ChCompat.registerAll(spark)
    spark.sql("DROP TABLE IF EXISTS day_orders")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/day_orders"))

    // 1. the user's own DDL, verbatim
    ch("""CREATE TABLE day_orders
         (`id` UInt64, `ver` UInt32, `qty` UInt32, `status` String)
         ENGINE = ReplacingMergeTree(ver) ORDER BY (id)""")

    // 2. plain INSERTs (Spark-native path), with a duplicate id=1
    ch("INSERT INTO day_orders VALUES (1, 1, 10, 'open')")
    ch("INSERT INTO day_orders VALUES (1, 2, 12, 'open'), " +
      "(2, 1, 5, 'open'), (3, 1, 7, 'cancelled')")

    // 3. FINAL sees the max-version row per key
    val fin = ch("SELECT id, qty FROM day_orders FINAL ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fin === Seq((1L, 12L), (2L, 5L), (3L, 7L)))
    // the raw read still holds 4 physical rows
    assert(ch("SELECT count() AS n FROM day_orders").head.getLong(0) === 4)

    // 4. mutation: drop cancelled orders, then compact duplicates
    ch("ALTER TABLE day_orders DELETE WHERE status = 'cancelled'")
    ch("OPTIMIZE TABLE day_orders FINAL")
    assert(ch("SELECT count() AS n FROM day_orders").head.getLong(0) === 2)

    // 5. schema evolution with a computed backfill
    ch("ALTER TABLE day_orders ADD COLUMN qty2 UInt64 DEFAULT qty * 2")
    val q2 = ch("SELECT id, qty2 FROM day_orders ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q2 === Seq((1L, 24L), (2L, 10L)))

    // 6. a materialized view over the table picks up a late block
    spark.sql("DROP TABLE IF EXISTS day_mv__inner")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/day_mv__inner"))
    ch("""CREATE MATERIALIZED VIEW day_mv ENGINE = SummingMergeTree
         POPULATE AS
         SELECT status, count(*) AS cnt, sum(qty) AS total
         FROM day_orders GROUP BY status""")
    import spark.implicits._
    ChMatView.applyBlock(spark, "day_mv",
      Seq((9L, 1L, 100L, "open", 200L)).toDF("id", "ver", "qty",
        "status", "qty2"))
    val mv = ChMatView.readMerged(spark, "day_mv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // populate saw (12 + 5), the late block adds 100
    assert(mv === Seq(("open", 3L, 117L)))

    // 7. introspection sees the table and its evolved schema
    assert(ch("SELECT name FROM system.tables WHERE name = 'day_orders'")
      .count() === 1)
    val colNames = ch(
      "SELECT name FROM system.columns WHERE table = 'day_orders' " +
        "ORDER BY position").collect().map(_.getString(0)).toSeq
    assert(colNames === Seq("id", "ver", "qty", "status", "qty2"))
  }
}

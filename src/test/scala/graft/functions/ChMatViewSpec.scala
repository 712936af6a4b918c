package graft.functions

import graft.SparkTestBase

/** ChMatView: the CH materialized-view contract — per-block insert
  * trigger, POPULATE backfill, and the read-side merge of appended
  * partial aggregates. The exactness claim under test: partials
  * appended block-by-block, in any split, must merge to the same
  * answer as one aggregation over everything.
  */
class ChMatViewSpec extends SparkTestBase {

  private def cleanup(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$n"))
  }

  private def mkSource(view: String): Unit = {
    import spark.implicits._
    Seq((1, 10.0), (1, 20.0), (2, 5.0), (3, 7.0))
      .toDF("uid", "v").createOrReplaceTempView(view)
  }

  test("parse: TO target, ENGINE, POPULATE, source, group-by keys") {
    mkSource("mv_src1")
    cleanup("mv_tgt1")
    val spec = ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW mv1 TO mv_tgt1
        |ENGINE = SummingMergeTree ORDER BY uid AS
        |SELECT uid, count(*) AS cnt, sum(v) AS sv
        |FROM mv_src1 GROUP BY uid""".stripMargin)
    assert(spec.target === Some("mv_tgt1"))
    assert(spec.engine === Some("SummingMergeTree"))
    assert(spec.sourceTable === "mv_src1")
    assert(spec.groupByCols === Seq("uid"))
    assert(!spec.populateOnCreate)
  }

  test("POPULATE backfills; applyBlock appends; readMerged is exact") {
    import spark.implicits._
    mkSource("mv_src2")
    cleanup("mv2__inner")
    ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW mv2 ENGINE = SummingMergeTree
        |POPULATE AS
        |SELECT uid, count(*) AS cnt, sum(v) AS sv
        |FROM mv_src2 GROUP BY uid""".stripMargin)
    // insert trigger: a new block with one existing and one new key
    ChMatView.applyBlock(spark, "mv2",
      Seq((1, 100.0), (4, 1.0)).toDF("uid", "v"))
    // count partials MUST merge by sum — the trap readMerged documents
    val got = ChMatView.readMerged(spark, "mv2")
      .orderBy("uid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1, 3L, 130.0), (2, 1L, 5.0), (3, 1L, 7.0),
      (4, 1L, 1.0)))
    // the target really holds PARTIALS: uid 1 appears twice pre-merge
    assert(spark.table("mv2__inner").filter("uid = 1").count() === 2)
  }

  test("applyBlock restores a pre-existing temp-view binding") {
    import spark.implicits._
    mkSource("mv_src3")
    cleanup("mv3__inner")
    ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW mv3 ENGINE = SummingMergeTree AS
        |SELECT uid, sum(v) AS sv FROM mv_src3 GROUP BY uid""".stripMargin)
    ChMatView.applyBlock(spark, "mv3", Seq((9, 9.0)).toDF("uid", "v"))
    // the original 4-row binding is back
    assert(spark.table("mv_src3").count() === 4)
  }

  test("min/max merge by re-application via mergeFns") {
    import spark.implicits._
    cleanup("mv4__inner")
    Seq((1, 10.0), (1, 20.0)).toDF("uid", "v")
      .createOrReplaceTempView("mv_src4")
    ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW mv4 ENGINE = AggregatingMergeTree
        |POPULATE AS
        |SELECT uid, min(v) AS mn, max(v) AS mx
        |FROM mv_src4 GROUP BY uid""".stripMargin)
    ChMatView.applyBlock(spark, "mv4", Seq((1, 5.0)).toDF("uid", "v"))
    val got = ChMatView.readMerged(spark, "mv4",
      mergeFns = Map("mn" -> "min", "mx" -> "max"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got === Seq((1, 5.0, 20.0)))
  }

  test("IF NOT EXISTS against an existing view never re-populates") {
    import spark.implicits._
    mkSource("mv_src5")
    cleanup("mv5__inner")
    val ddl = """CREATE MATERIALIZED VIEW IF NOT EXISTS mv5
      |ENGINE = SummingMergeTree POPULATE AS
      |SELECT uid, sum(v) AS sv FROM mv_src5 GROUP BY uid""".stripMargin
    ChMatView.create(spark, ddl)
    ChMatView.create(spark, ddl) // CH no-ops; a re-populate would double
    val got = ChMatView.readMerged(spark, "mv5").orderBy("uid")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(got === Seq((1, 30.0), (2, 5.0), (3, 7.0)))
  }

  test("keys-only view merges as DISTINCT") {
    import spark.implicits._
    cleanup("mv6__inner")
    Seq((1, 1.0), (1, 2.0), (2, 3.0)).toDF("uid", "v")
      .createOrReplaceTempView("mv_src6")
    ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW mv6 ENGINE = ReplacingMergeTree
        |POPULATE AS SELECT uid FROM mv_src6 GROUP BY uid""".stripMargin)
    ChMatView.applyBlock(spark, "mv6", Seq((1, 9.0), (3, 1.0))
      .toDF("uid", "v"))
    val got = ChMatView.readMerged(spark, "mv6").orderBy("uid")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2, 3))
  }

  test("bad DDL throws") {
    intercept[IllegalArgumentException](
      ChMatView.create(spark, "CREATE VIEW not_mat AS SELECT 1"))
    intercept[IllegalArgumentException](
      ChMatView.create(spark, "CREATE MATERIALIZED VIEW mv_x ENGINE = Log"))
  }
}

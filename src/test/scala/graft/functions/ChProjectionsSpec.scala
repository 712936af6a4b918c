package graft.functions

import graft.SparkTestBase

/** ChProjections: the in-table materialized-view analogue. Declared →
  * materialized → read must equal the base-table computation; the
  * projection read scans ONLY the projection table; DROP removes both
  * the declaration and the storage; the maintenance contract
  * (reflects last MATERIALIZE) is explicit.
  */
class ChProjectionsSpec extends SparkTestBase {

  private def freshBase(name: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$name"))
    spark.sql(
      s"CREATE TABLE $name (id INT, user_id BIGINT, v DOUBLE) USING parquet")
    Seq((1, 1L, 10.0), (2, 1L, 20.0), (3, 2L, 30.0), (4, 2L, 40.0),
      (5, 3L, 50.0))
      .toDF("id", "user_id", "v").write.mode("append").insertInto(name)
  }

  test("aggregate projection: declare via statement, materialize, " +
      "read equals base; the read never touches the base table") {
    freshBase("proj_base")
    ChCompat.sql(spark, """ALTER TABLE proj_base ADD PROJECTION by_user (
      SELECT user_id, count() AS n, sum(CAST(v AS DECIMAL(18,6))) AS sv
      GROUP BY user_id)""")
    // declared but not materialized → loud error naming the step
    val e0 = intercept[IllegalArgumentException](
      ChProjections.readProjection(spark, "proj_base", "by_user"))
    assert(e0.getMessage.contains("not materialized"))
    ChCompat.sql(spark,
      "ALTER TABLE proj_base MATERIALIZE PROJECTION by_user")
    val got = ChProjections.readProjection(spark, "proj_base", "by_user")
      .selectExpr("user_id", "n", "CAST(sv AS DOUBLE) AS sv")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 2L, 30.0), (2L, 2L, 70.0), (3L, 1L, 50.0)))
    // the projection read's scan targets the projection table's
    // storage, not the base table's
    val plan = ChProjections.readProjection(spark, "proj_base", "by_user")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("__proj_proj_base_by_user") &&
      !plan.contains("/proj_base"),
      s"projection read must scan only the projection table:\n$plan")
  }

  test("maintenance contract: the projection reflects its last " +
      "MATERIALIZE; re-running folds in new rows") {
    import spark.implicits._
    freshBase("proj_stale")
    ChCompat.sql(spark, """ALTER TABLE proj_stale ADD PROJECTION p (
      SELECT user_id, count() AS n GROUP BY user_id)""")
    ChCompat.sql(spark, "ALTER TABLE proj_stale MATERIALIZE PROJECTION p")
    Seq((6, 3L, 60.0)).toDF("id", "user_id", "v")
      .write.mode("append").insertInto("proj_stale")
    def nOf(u: Long) = ChProjections
      .readProjection(spark, "proj_stale", "p")
      .filter(s"user_id = $u").collect().map(_.getLong(1)).head
    assert(nOf(3L) === 1L) // pre-insert state, by contract
    ChCompat.sql(spark, "ALTER TABLE proj_stale MATERIALIZE PROJECTION p")
    assert(nOf(3L) === 2L)
  }

  test("sort projection: ORDER BY is a storage instruction — content " +
      "equal to the base, rows sorted within files") {
    freshBase("proj_sort")
    ChCompat.sql(spark, """ALTER TABLE proj_sort ADD PROJECTION by_v (
      SELECT id, user_id, v ORDER BY v)""")
    ChCompat.sql(spark, "ALTER TABLE proj_sort MATERIALIZE PROJECTION by_v")
    val proj = ChProjections.readProjection(spark, "proj_sort", "by_v")
    assert(proj.collect().map(_.getInt(0)).sorted.toSeq
      === Seq(1, 2, 3, 4, 5))
    // within every storage partition the sort key is non-decreasing
    import org.apache.spark.sql.functions._
    val unsortedParts = proj
      .select(spark_partition_id().as("p"), col("v"))
      .groupBy("p")
      .agg((sort_array(collect_list("v")) === collect_list("v"))
        .as("sorted"))
      .filter(!col("sorted")).count()
    assert(unsortedParts === 0L, "sort projection lost its ORDER BY layout")
  }

  test("auto rewrite: a matching aggregate over the base is answered " +
      "from the projection — plan swapped, answers identical, " +
      "non-matching shapes untouched") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    freshBase("proj_auto")
    ChCompat.sql(spark, """ALTER TABLE proj_auto ADD PROJECTION p (
      SELECT user_id, count() AS n, sum(CAST(v AS DECIMAL(18,6))) AS sv
      GROUP BY user_id)""")
    ChCompat.sql(spark, "ALTER TABLE proj_auto MATERIALIZE PROJECTION p")
    val q = "SELECT user_id, count(*) AS n, " +
      "sum(CAST(v AS DECIMAL(18,6))) AS sv " +
      "FROM proj_auto GROUP BY user_id ORDER BY user_id"
    // conf off (default): the base table is aggregated
    val off = spark.sql(q)
    assert(off.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.nonEmpty)
    val expected = off.collect().map(_.toSeq).toSeq
    spark.conf.set(ChProjections.autoConfKey, "true")
    try {
      val on = spark.sql(q)
      val opt = on.queryExecution.optimizedPlan
      assert(opt.collect { case a: Aggregate => a }.isEmpty,
        s"aggregate should be answered from the projection:\n$opt")
      assert(opt.toString.contains("__proj_proj_auto_p"),
        s"plan must scan the projection table:\n$opt")
      assert(on.collect().map(_.toSeq).toSeq === expected)
      // a DIFFERENT grouping set must bail to the base (exact match
      // only) and still answer correctly
      val global = spark.sql("SELECT count(*) AS n FROM proj_auto")
      assert(global.queryExecution.optimizedPlan
        .collect { case a: Aggregate => a }.nonEmpty)
      assert(global.collect().head.getLong(0) === 5L)
      // an aggregate the projection lacks bails too
      val novel = spark.sql(
        "SELECT user_id, min(v) AS mn FROM proj_auto GROUP BY user_id")
      assert(novel.queryExecution.optimizedPlan
        .collect { case a: Aggregate => a }.nonEmpty)
      // expressions AROUND mapped aggregates are kept: avg spelled as
      // sum/count over the projection's columns
      val ratio = spark.sql("SELECT user_id, " +
        "sum(CAST(v AS DECIMAL(18,6))) / count(*) AS avg_v " +
        "FROM proj_auto GROUP BY user_id ORDER BY user_id")
      assert(ratio.queryExecution.optimizedPlan
        .collect { case a: Aggregate => a }.isEmpty)
      assert(ratio.collect().map(r => (r.getLong(0),
          r.getDecimal(1).doubleValue())).toSeq
        === Seq((1L, 15.0), (2L, 35.0), (3L, 50.0)))
    } finally spark.conf.unset(ChProjections.autoConfKey)
  }

  test("re-MATERIALIZE with the auto rewrite ON refreshes from the " +
      "BASE table, not from itself") {
    import spark.implicits._
    freshBase("proj_refresh")
    ChCompat.sql(spark, """ALTER TABLE proj_refresh ADD PROJECTION p (
      SELECT user_id, count() AS n GROUP BY user_id)""")
    ChCompat.sql(spark, "ALTER TABLE proj_refresh MATERIALIZE PROJECTION p")
    spark.conf.set(ChProjections.autoConfKey, "true")
    try {
      Seq((6, 3L, 60.0)).toDF("id", "user_id", "v")
        .write.mode("append").insertInto("proj_refresh")
      // without the self-read guard the build query would be answered
      // from the stale projection and the refresh would be a no-op
      ChCompat.sql(spark, "ALTER TABLE proj_refresh MATERIALIZE PROJECTION p")
      val n3 = ChProjections.readProjection(spark, "proj_refresh", "p")
        .filter("user_id = 3").collect().map(_.getLong(1)).head
      assert(n3 === 2L, "re-MATERIALIZE served stale projection data")
    } finally spark.conf.unset(ChProjections.autoConfKey)
  }

  test("DROP PROJECTION removes declaration and storage") {
    freshBase("proj_drop")
    ChCompat.sql(spark, """ALTER TABLE proj_drop ADD PROJECTION p (
      SELECT user_id, count() AS n GROUP BY user_id)""")
    ChCompat.sql(spark, "ALTER TABLE proj_drop MATERIALIZE PROJECTION p")
    ChCompat.sql(spark, "ALTER TABLE proj_drop DROP PROJECTION p")
    intercept[IllegalArgumentException](
      ChProjections.readProjection(spark, "proj_drop", "p"))
    val e = intercept[IllegalArgumentException](
      ChProjections.materialize(spark, "proj_drop", "p"))
    assert(e.getMessage.contains("no projection"))
  }
}

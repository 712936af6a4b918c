package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DDL generation + catalog registration over the written layout
  * (SURVEY A21): CREATE TABLE from the schema object, MSCK partition
  * discovery, query through the catalog with partition pruning.
  */
class DdlSpec extends SparkTestBase {
  import spark.implicits._

  test("init registers the partitioned events table; catalog queries prune by month") {
    val dir = java.nio.file.Files.createTempDirectory("ddl").toFile
    val path = new java.io.File(dir, "events").getAbsolutePath
    // two months of minimal rows through the real writer
    val rows = Seq(
      (1L, "2015-01-01 10:00:00"), (2L, "2015-02-01 10:00:00"))
      .toDF("seed_id", "s")
    val batch = GiteeTestRows.densify(rows
      .withColumn("id", col("seed_id"))
      .withColumn("actor_id", col("seed_id"))
      .withColumn("created_at", to_timestamp(col("s")))
      .drop("seed_id", "s"))
    EventsWriter.write(batch, path)

    Ddl.init(spark, "ddl_events", path, forceInit = true)
    val t = spark.sql("SELECT count(*) AS c FROM ddl_events WHERE month_key = 201501")
    assert(t.head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM ddl_events").head.getLong(0) === 2L)
    // pruning reaches the scan: only one partition read for month 201501
    val plan = spark.sql("SELECT * FROM ddl_events WHERE month_key = 201501")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("month_key=201502"))
    spark.sql("DROP TABLE ddl_events")
  }

  test("year views: reference table naming prunes to the year's partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ddly").toFile
    val path = new java.io.File(dir, "events").getAbsolutePath
    val batch = GiteeTestRows.densify(Seq(
      (1L, "2015-01-01 10:00:00"), (2L, "2015-06-01 10:00:00"),
      (3L, "2016-02-01 10:00:00"))
      .toDF("seed", "s")
      .select(col("seed").as("id"), col("seed").as("actor_id"),
        to_timestamp(col("s")).as("created_at")))
    EventsWriter.write(batch, path)
    Ddl.init(spark, "ddl_events_y", path, forceInit = true)
    Ddl.initYearViews(spark, "ddl_events_y", Seq(2015, 2016))
    try {
      assert(spark.sql("SELECT count(*) FROM year2015").head.getLong(0) === 2L)
      assert(spark.sql("SELECT count(*) FROM year2016").head.getLong(0) === 1L)
      // pruning reaches the scan: year2015 never reads the 2016 partition
      val plan = spark.sql("SELECT * FROM year2015")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("month_key=201602"))
    } finally {
      Seq("year2015", "year2016").foreach(v => spark.sql(s"DROP VIEW IF EXISTS $v"))
      spark.sql("DROP TABLE IF EXISTS ddl_events_y")
    }
  }

  test("bucketed table: groupBy and self-join on repo_id plan with no shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("ddlb").toFile
    val batch = GiteeTestRows.densify(
      spark.range(200).select(
        col("id"), (col("id") % 20).as("repo_id"), col("id").as("actor_id"),
        to_timestamp(lit("2015-01-15 10:00:00")).as("created_at")))
    Ddl.initBucketed(spark, batch, "ddl_events_b",
      new java.io.File(dir, "events_b").getAbsolutePath, buckets = 4,
      forceInit = true)
    try {
      val t = spark.table("ddl_events_b")
      assert(t.count() === 200L)

      // aggregation on the bucket key: no Exchange in the plan
      val aggPlan = t.groupBy("repo_id").count()
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed groupBy(repo_id) must not shuffle:\n$aggPlan")

      // self-join on the bucket key: no Exchange either side. On this
      // tiny fixture the planner prefers broadcast (and rightly skips
      // the bucket spec); disable auto-broadcast to observe the
      // shuffle-free sort-merge path a 100-TB join would take.
      val bcKey = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(bcKey)
      spark.conf.set(bcKey, "-1")
      try {
        val joined = t.select(col("repo_id"), col("id").as("id_a"))
          .join(spark.table("ddl_events_b")
            .select(col("repo_id"), col("id").as("id_b")), Seq("repo_id"))
        val joinPlan = joined.queryExecution.executedPlan.toString
        assert(!joinPlan.contains("Exchange"),
          s"bucketed self-join on repo_id must not shuffle:\n$joinPlan")
        assert(joined.count() === 2000L) // 20 repos × 10×10 pairs
      } finally spark.conf.set(bcKey, prev)
    } finally spark.sql("DROP TABLE IF EXISTS ddl_events_b")
  }
}

/** Fills the full events schema around a few seed columns. */
object GiteeTestRows {
  import org.apache.spark.sql.{DataFrame}
  import org.apache.spark.sql.types._
  def densify(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = EventsSchema.schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name)
      else if (f.nullable) lit(null).cast(f.dataType).as(f.name)
      else f.dataType match {
        case LongType => lit(0L).as(f.name)
        case IntegerType => lit(0).as(f.name)
        case BooleanType => lit(false).as(f.name)
        case StringType => lit("").as(f.name)
        case at: ArrayType => array().cast(at).as(f.name)
        case other => lit(null).cast(other).as(f.name)
      }
    }
    df.select(cols: _*)
  }
}

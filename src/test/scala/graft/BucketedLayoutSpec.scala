package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the storage-layout answer to the
  * repeated user_id/doc_id-grain joins every pipeline family runs.
  * At 100 TB the events table is written ONCE bucketed by its join
  * key; every later equi-join against a same-bucketed side then reads
  * co-located buckets and pays ZERO exchange — the shuffle moves from
  * query time (every run) to write time (once). This spec pins that
  * capability end to end on real machinery: Spark's native
  * `bucketBy` writer + the bucketed scan's HashPartitioning feeding a
  * SortMergeJoin with no Exchange anywhere in the executed plan, and
  * result-set equality against the plain shuffled join.
  *
  * (The reference imports into ClickHouse whose ORDER-BY/primary-key
  * layout serves the same role — reference `config/config.default.ts`
  * table DDL; Spark-side, bucketing is the equivalent declaration.)
  *
  * Relation to DdlSpec: `Ddl.initBucketed` + DdlSpec already pin
  * no-Exchange aggregation/self-join on the CATALOG events table;
  * this spec adds what that one does not — the shuffled-join CONTRAST
  * (proving the assertion isn't vacuous), result-set equality between
  * the two layouts, and the `SelectedBucketsCount` bucketed-read
  * marker — and feeds the measured `bucketjoin` SCALE leg.
  */
class BucketedLayoutSpec extends SparkTestBase {

  private def dropWarehouse(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$n"))
  }

  test("same-bucketed equi-join runs with ZERO exchange and equals " +
      "the shuffled join's result set") {
    val dir = "/root/testdata/sf0.001"
    dropWarehouse("bkt_events", "bkt_users")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("bkt_events")
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"))
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("bkt_users")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join regime under test (co-located
      // SMJ) is the one that actually runs — at 100 TB neither side
      // of a fact-to-fact join broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_events")
        .join(spark.table("bkt_users"), Seq("user_id"))
        .groupBy("user_id", "n_events")
        .agg(count(lit(1)).as("n_rows"))
      val rows = joined.collect()
      assert(rows.nonEmpty)
      // every row of the fact side joined: n_rows == n_events per user
      assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join over co-located buckets:\n$plan")
      // the capability under test: scans expose the bucket hash
      // partitioning, so ensureRequirements inserts NO exchange for
      // the join itself. The aggregate above groups by a non-prefix
      // key and legitimately pays its own exchange, so the no-Exchange
      // assertion runs on the bare join:
      val joinOnly = spark.table("bkt_events")
        .join(spark.table("bkt_users"), Seq("user_id"))
      joinOnly.collect()
      val joinPlan = joinOnly.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join paid a shuffle:\n$joinPlan")
      assert(joinPlan.contains("SelectedBucketsCount"),
        s"scan did not report bucketed read:\n$joinPlan")

      // the contrast: the same join from plain parquet shuffles
      val plainUsers = events.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"))
      val plain = events.join(plainUsers, Seq("user_id"))
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString
          .contains("Exchange"),
        "contrast join unexpectedly exchange-free — the bucketed " +
          "assertion above is not testing anything")

      // result-set equality: co-location is a layout change, not a
      // semantics change
      val a = joinOnly.drop("last_ts").collect()
        .map(_.toSeq).sortBy(_.toString)
      val b = plain.drop("last_ts").collect()
        .map(_.toSeq).sortBy(_.toString)
      assert(a.length == b.length && a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      dropWarehouse("bkt_events", "bkt_users")
    }
  }
}

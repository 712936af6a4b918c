package graft.functions

import graft.SparkTestBase

/** ChMutations: ClickHouse `ALTER TABLE … DELETE/UPDATE` as
  * copy-on-write rewrites. Pins the CH semantics that differ from the
  * naive spelling: NULL-condition rows survive a DELETE, UPDATE casts
  * back to the declared column type, partition columns refuse UPDATE,
  * and a DELETE that empties a whole partition actually removes it.
  */
class ChMutationsSpec extends SparkTestBase {

  private def freshTable(name: String, partitioned: Boolean): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous JVM's managed-table files outlive the in-memory
    // catalog; clear the location or CREATE fails LOCATION_ALREADY_EXISTS
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$name"))
    val part = if (partitioned) "PARTITIONED BY (kind)" else ""
    spark.sql(
      s"""CREATE TABLE $name (id INT, v DOUBLE, note STRING, kind STRING)
         |USING parquet $part""".stripMargin)
    Seq(
      (1, 10.0, "a", "x"), (2, 20.0, null, "x"),
      (3, 30.0, "c", "y"), (4, 40.0, "d", "y"),
      (5, 50.0, "e", "z"))
      .toDF("id", "v", "note", "kind")
      .write.mode("append").insertInto(name)
  }

  test("DELETE removes matching rows, keeps NULL-condition rows") {
    freshTable("mut_del", partitioned = false)
    // note = 'a' is NULL for id 2 → condition NULL → row survives (CH)
    ChMutations.mutate(spark, "ALTER TABLE mut_del DELETE WHERE note = 'a'")
    val ids = spark.table("mut_del").select("id")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(ids === Seq(2, 3, 4, 5))
  }

  test("UPDATE applies only where the condition holds and keeps the type") {
    freshTable("mut_upd", partitioned = false)
    // integer-division expression would be INT; the declared column is
    // DOUBLE — the cast-back keeps the schema
    ChMutations.mutate(spark,
      "ALTER TABLE mut_upd UPDATE v = v * 2, note = 'up' WHERE id <= 2")
    val rows = spark.table("mut_upd").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq
    assert(rows === Seq((1, 20.0, "up"), (2, 40.0, "up"), (3, 30.0, "c"),
      (4, 40.0, "d"), (5, 50.0, "e")))
    assert(spark.table("mut_upd").schema("v").dataType.typeName === "double")
  }

  test("partitioned DELETE rewrites only touched partitions") {
    freshTable("mut_part", partitioned = true)
    val n = ChMutations.mutate(spark,
      "ALTER TABLE mut_part DELETE WHERE id = 3")
    assert(n === 1) // only kind='y' touched
    val rows = spark.table("mut_part").select("id")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rows === Seq(1, 2, 4, 5))
  }

  test("DELETE that empties a partition drops it entirely") {
    freshTable("mut_empty", partitioned = true)
    ChMutations.mutate(spark, "ALTER TABLE mut_empty DELETE WHERE kind = 'z'")
    val kinds = spark.table("mut_empty").select("kind")
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(kinds === Seq("x", "y"))
    // the partition itself is gone, not just its rows
    val parts = spark.sql("SHOW PARTITIONS mut_empty")
      .collect().map(_.getString(0)).toSeq
    assert(!parts.exists(_.contains("kind=z")))
  }

  test("UPDATE of a partition column refuses, like CH key mutation") {
    freshTable("mut_key", partitioned = true)
    val e = intercept[IllegalArgumentException](ChMutations.mutate(spark,
      "ALTER TABLE mut_key UPDATE kind = 'w' WHERE id = 1"))
    assert(e.getMessage.contains("partition column"))
  }

  test("lightweight DELETE FROM is the same mutation as ALTER…DELETE") {
    freshTable("mut_lw", partitioned = true)
    // modern spelling: empties kind='z' (partition dropped) and trims
    // kind='y'; NULL-condition row (id 2's note) still survives
    val n = ChMutations.mutate(spark,
      "DELETE FROM mut_lw WHERE kind = 'z' OR id = 3")
    assert(n === 2) // y and z touched, x never read
    val ids = spark.table("mut_lw").select("id")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(ids === Seq(1, 2, 4))
    val parts = spark.sql("SHOW PARTITIONS mut_lw")
      .collect().map(_.getString(0)).toSeq
    assert(!parts.exists(_.contains("kind=z")))
  }

  test("deleteInPartitions rewrites ONLY the named partitions even " +
      "when the predicate matches rows elsewhere") {
    freshTable("mut_restrict", partitioned = true)
    // predicate id >= 3 matches rows in 'y' AND 'z'; the caller
    // restricts to 'y' — 'z' must be left untouched (the contract the
    // TTL pass relies on: IT owns the partition verdicts)
    val n = ChMutations.deleteInPartitions(spark, "mut_restrict",
      "id >= 3", Seq(Map("kind" -> "y")))
    assert(n === 1)
    val rows = spark.table("mut_restrict").select("id")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rows === Seq(1, 2, 5)) // 3,4 ('y') gone; 5 ('z') intact
    // empty restriction is a no-op; unpartitioned tables refuse
    assert(ChMutations.deleteInPartitions(spark, "mut_restrict",
      "id >= 0", Nil) === 0)
    freshTable("mut_restrict_flat", partitioned = false)
    val e = intercept[IllegalArgumentException](
      ChMutations.deleteInPartitions(spark, "mut_restrict_flat",
        "id >= 0", Seq(Map("kind" -> "x"))))
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("IN PARTITION scopes a mutation to the named partition even " +
      "when the predicate matches rows elsewhere") {
    freshTable("mut_inpart", partitioned = true)
    // predicate matches ids 1-5 across x/y/z; the clause restricts the
    // UPDATE to 'x' — y/z rows must be untouched
    ChMutations.mutate(spark,
      "ALTER TABLE mut_inpart UPDATE v = v + 1 IN PARTITION 'x' WHERE id >= 1")
    val vs = spark.table("mut_inpart").orderBy("id")
      .collect().map(_.getDouble(1)).toSeq
    assert(vs === Seq(11.0, 21.0, 30.0, 40.0, 50.0))
    // spec form + unconditional DELETE empties and drops exactly 'y'
    ChMutations.mutate(spark,
      "ALTER TABLE mut_inpart DELETE IN PARTITION (kind = 'y') WHERE true")
    assert(spark.table("mut_inpart").select("id")
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 5))
    val parts = spark.sql("SHOW PARTITIONS mut_inpart")
      .collect().map(_.getString(0)).toSeq
    assert(!parts.exists(_.contains("kind=y")))
  }

  test("DROP PARTITION by value and by spec") {
    freshTable("mut_dp", partitioned = true)
    ChMutations.mutate(spark, "ALTER TABLE mut_dp DROP PARTITION 'x'")
    ChMutations.mutate(spark, "ALTER TABLE mut_dp DROP PARTITION (kind = 'y')")
    val kinds = spark.table("mut_dp").select("kind")
      .distinct().collect().map(_.getString(0)).toSeq
    assert(kinds === Seq("z"))
  }

  test("OPTIMIZE TABLE FINAL materializes the registered dedup") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS mut_opt")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/mut_opt"))
    spark.sql(
      "CREATE TABLE mut_opt (id INT, ver INT, v DOUBLE) USING parquet")
    Seq((1, 1, 10.0), (1, 2, 11.0), (2, 1, 20.0))
      .toDF("id", "ver", "v").write.mode("append").insertInto("mut_opt")
    ChSqlRewrite.registerReplacing("mut_opt", Seq("id"), "ver")
    ChMutations.mutate(spark, "OPTIMIZE TABLE mut_opt FINAL")
    val rows = spark.table("mut_opt").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows === Seq((1, 2), (2, 1))) // max-version rows, physically
    // without FINAL (or without a declaration): no-op
    assert(ChMutations.mutate(spark, "OPTIMIZE TABLE mut_opt") === 0)
  }

  test("ADD COLUMN: metadata-only without default, backfill with") {
    freshTable("mut_addc", partitioned = false)
    ChMutations.mutate(spark,
      "ALTER TABLE mut_addc ADD COLUMN tag String")
    assert(spark.table("mut_addc").filter("tag IS NULL").count() === 5)
    ChMutations.mutate(spark,
      "ALTER TABLE mut_addc ADD COLUMN v2 Float64 DEFAULT v * 10")
    val got = spark.table("mut_addc").orderBy("id")
      .select("v2").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(100.0, 200.0, 300.0, 400.0, 500.0))
  }

  test("DROP/RENAME/MODIFY COLUMN recreate the table schema") {
    freshTable("mut_colddl", partitioned = true)
    ChMutations.mutate(spark,
      "ALTER TABLE mut_colddl RENAME COLUMN note TO remark")
    assert(spark.table("mut_colddl").columns.contains("remark"))
    ChMutations.mutate(spark,
      "ALTER TABLE mut_colddl MODIFY COLUMN v UInt32")
    assert(spark.table("mut_colddl").schema("v").dataType.typeName
      === "long") // UInt32 maps to BIGINT
    ChMutations.mutate(spark,
      "ALTER TABLE mut_colddl DROP COLUMN remark")
    assert(!spark.table("mut_colddl").columns.contains("remark"))
    // data and partitioning survived the three rewrites
    val rows = spark.table("mut_colddl").orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Long]("v"),
        r.getAs[String]("kind"))).toSeq
    assert(rows === Seq((1, 10L, "x"), (2, 20L, "x"), (3, 30L, "y"),
      (4, 40L, "y"), (5, 50L, "z")))
    assert(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("mut_colddl"))
      .partitionColumnNames === Seq("kind"))
    // partition column refuses
    intercept[IllegalArgumentException](ChMutations.mutate(spark,
      "ALTER TABLE mut_colddl DROP COLUMN kind"))
  }

  test("ChCompat.sql routes the whole statement surface uniformly") {
    freshTable("mut_route", partitioned = false)
    ChCompat.sql(spark,
      "ALTER TABLE mut_route DELETE WHERE id = 5")
    ChCompat.sql(spark, "OPTIMIZE TABLE mut_route")
    assert(spark.table("mut_route").count() === 4)
    // and a plain query still goes through the dialect rewrite
    assert(ChCompat.sql(spark,
      "SELECT count() AS n FROM mut_route").head.getLong(0) === 4L)
  }

  test("DATE-partitioned mutation: values quote correctly") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS mut_datep")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/mut_datep"))
    spark.sql("CREATE TABLE mut_datep (id INT, d DATE) USING parquet " +
      "PARTITIONED BY (d)")
    Seq((1, "2024-01-02"), (2, "2024-01-02"), (3, "2024-02-03"))
      .toDF("id", "s").selectExpr("id", "CAST(s AS DATE) AS d")
      .write.mode("append").insertInto("mut_datep")
    // an unquoted 2024-01-02 would parse as integer subtraction,
    // match nothing, and silently lose this DELETE
    val n = ChMutations.mutate(spark,
      "ALTER TABLE mut_datep DELETE WHERE id = 1")
    assert(n === 1)
    assert(spark.table("mut_datep").count() === 2)
    // and a partition-emptying DELETE on the date partition drops it
    ChMutations.mutate(spark,
      "ALTER TABLE mut_datep DELETE WHERE d = DATE'2024-02-03'")
    assert(spark.table("mut_datep").select("d").distinct().count() === 1)
  }

  test("UPDATE with a WHERE inside a subquery assignment splits right") {
    freshTable("mut_subq", partitioned = false)
    ChMutations.mutate(spark,
      "ALTER TABLE mut_subq UPDATE v = (SELECT max(id) FROM mut_subq " +
        "WHERE id < 100) WHERE id = 1")
    val got = spark.table("mut_subq").orderBy("id")
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(5.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("statement routing edges: native DDL is NOT captured") {
    import spark.implicits._
    // Spark's plural ADD COLUMNS must route to spark.sql, not the
    // mutation regex (singular COLUMN with a word boundary)
    freshTable("mut_route2", partitioned = false)
    ChCompat.sql(spark,
      "ALTER TABLE mut_route2 ADD COLUMNS (extra INT, extra2 STRING)")
    assert(spark.table("mut_route2").columns.contains("extra2"))
    // CREATE TABLE without ENGINE= is plain Spark DDL
    spark.sql("DROP TABLE IF EXISTS route_plain")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/route_plain"))
    ChCompat.sql(spark, "CREATE TABLE route_plain (a INT) USING parquet")
    assert(spark.catalog.tableExists("route_plain"))
    // a SELECT mentioning the keywords is never mis-routed
    Seq(("CREATE TABLE x ENGINE = MergeTree", 1)).toDF("s", "n")
      .createOrReplaceTempView("route_sel")
    assert(ChCompat.sql(spark,
      "SELECT n FROM route_sel WHERE s LIKE 'CREATE TABLE%ENGINE%'")
      .head.getInt(0) === 1)
  }

  test("no-WHERE and unknown statements throw") {
    intercept[IllegalArgumentException](
      ChMutations.mutate(spark, "ALTER TABLE t DELETE"))
    intercept[IllegalArgumentException](
      ChMutations.mutate(spark, "TRUNCATE TABLE t"))
  }

  test("UPDATE WHERE with zero matches leaves the table untouched") {
    freshTable("mut_noop", partitioned = true)
    val n = ChMutations.mutate(spark,
      "ALTER TABLE mut_noop DELETE WHERE id = 999")
    assert(n === 0)
    assert(spark.table("mut_noop").count() === 5)
  }

  test("partitioned + bucketed table: the rewrite preserves BOTH " +
      "layout levers — untouched partitions byte-identical, touched " +
      "partition back to one sorted file per bucket, reads still " +
      "bucket-satisfied") {
    // the composition r72 (unpartitioned+bucketed) and the chsurface
    // leg (partitioned-only) each cover half of: CH's full MergeTree
    // layout analogue mutated in place. The partition-pruned rewrite
    // and the bucket re-shaping must compose in one insert.
    import spark.implicits._
    val name = "mut_pb"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$name"))
    spark.sql(s"""CREATE TABLE $name
      (id INT, user_id BIGINT, v DOUBLE, kind STRING)
      USING parquet PARTITIONED BY (kind)
      CLUSTERED BY (user_id) SORTED BY (user_id) INTO 4 BUCKETS""")
    (1 to 400)
      .map(i => (i, (i % 37).toLong, i.toDouble,
        Seq("x", "y", "z")(i % 3)))
      .toDF("id", "user_id", "v", "kind")
      .repartition(4, $"user_id").sortWithinPartitions("user_id")
      .write.mode("append").insertInto(name)
    def partFiles(kind: String): Map[String, String] = {
      val d = new java.io.File(s"spark-warehouse/$name/kind=$kind")
      Option(d.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> h.map("%02x".format(_)).mkString
        }.toMap
    }
    val (beforeY, beforeZ) = (partFiles("y"), partFiles("z"))
    assert(beforeY.nonEmpty && beforeZ.nonEmpty)
    val n = ChMutations.mutate(spark,
      s"ALTER TABLE $name UPDATE v = v + 1000 " +
        "WHERE kind = 'x' AND id <= 100")
    assert(n === 1) // only kind='x' touched
    // untouched partitions: byte-identical files (the chsurface
    // contract, composed with bucketing)
    assert(partFiles("y") === beforeY && partFiles("z") === beforeZ)
    // touched partition: exactly one file per bucket, bucket-id named
    // (the _NNNNN suffix FileFormatWriter stamps when a spec is live)
    val xFiles = partFiles("x").keySet
    assert(xFiles.size === 4, s"expected 4 bucket files, got $xFiles")
    val bucketIds = xFiles.flatMap(
      "_(\\d{5})\\.".r.findFirstMatchIn(_).map(_.group(1)))
    assert(bucketIds.size === 4,
      s"bucket ids not distinct across files: $xFiles")
    // the read path still plans on the bucket spec with no hash
    // exchange for a user-grain aggregation
    val fmt = spark.table(name).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("Bucketed: true"),
      "post-mutation scan lost the bucket spec")
    assert(!fmt.contains("hashpartitioning"),
      "post-mutation aggregation re-shuffles — bucket layout lost")
    // and the mutation semantics landed
    val mutated = spark.table(name)
      .filter($"kind" === "x" && $"id" <= 100)
      .agg(org.apache.spark.sql.functions.min("v")).first().getDouble(0)
    assert(mutated > 1000.0, s"UPDATE did not apply: min v = $mutated")
    assert(spark.table(name).count() === 400)
  }
}

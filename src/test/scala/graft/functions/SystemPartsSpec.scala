package graft.functions

import graft.SparkTestBase

/** `system.parts` introspection (round-17 VERDICT #3): one row per
  * partition directory of each catalog table — the view ClickHouse
  * maintenance tooling reads to decide OPTIMIZE / TTL / DROP
  * PARTITION. The r77 gate oracles the row accounting against DuckDB;
  * this spec pins the FS facts the oracle cannot see (bytes_on_disk,
  * file_count), the unpartitioned `tuple()` part, and that the view is
  * rebuilt per probe — an INSERT the catalog fingerprint cannot
  * witness must still show up.
  */
class SystemPartsSpec extends SparkTestBase {

  private def fresh(name: String, partitioned: Boolean): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$name"))
    val part = if (partitioned) "PARTITIONED BY (kind)" else ""
    spark.sql(
      s"CREATE TABLE $name (id INT, v DOUBLE, kind STRING) USING parquet $part")
    Seq((1, 10.0, "x"), (2, 20.0, "x"), (3, 30.0, "y"))
      .toDF("id", "v", "kind").write.mode("append").insertInto(name)
  }

  test("partitioned table: one part per partition with exact rows and " +
      "real on-disk bytes/files") {
    fresh("sp_part", partitioned = true)
    val rows = ChCompat.sql(spark,
      """SELECT `partition`, rows, bytes_on_disk, file_count, active
         FROM system.parts WHERE `table` = 'sp_part'
         ORDER BY `partition`""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("x", 2L), ("y", 1L)))
    assert(rows.forall(_.getBoolean(4)), "parts must read active")
    assert(rows.forall(r => r.getLong(2) > 0L && r.getLong(3) >= 1L),
      "bytes_on_disk/file_count must reflect the FS listing")
  }

  test("unpartitioned table surfaces one tuple() part; data changes " +
      "show without any catalog-shape change") {
    import spark.implicits._
    fresh("sp_flat", partitioned = false)
    def probe() = ChCompat.sql(spark,
      """SELECT `partition`, rows FROM system.parts
         WHERE `table` = 'sp_flat'""").collect()
    val first = probe()
    assert(first.map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("tuple()", 3L)))
    // an INSERT leaves the table LIST identical — the fingerprint
    // cache can't see it, so parts must be rebuilt per probe
    Seq((4, 40.0, "z")).toDF("id", "v", "kind")
      .write.mode("append").insertInto("sp_flat")
    assert(probe().map(_.getLong(1)).toSeq === Seq(4L))
  }

  test("mutation surfaces compose: TTL-dropped partitions leave " +
      "system.parts") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS sp_ttl")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/sp_ttl"))
    spark.sql("""CREATE TABLE sp_ttl (id INT, ts TIMESTAMP, day_key INT)
      USING parquet PARTITIONED BY (day_key)""")
    Seq((1, "2024-01-10 06:00:00", 10), (2, "2024-01-13 06:00:00", 13))
      .map { case (i, t, d) => (i, java.sql.Timestamp.valueOf(t), d) }
      .toDF("id", "ts", "day_key").write.mode("append").insertInto("sp_ttl")
    ChTtl.applyTtl(spark, "sp_ttl", "ts", "2 DAY", "2024-01-13 12:00:00")
    val parts = ChCompat.sql(spark,
      """SELECT `partition` FROM system.parts
         WHERE `table` = 'sp_ttl'""").collect().map(_.getString(0)).toSeq
    assert(parts === Seq("13"),
      s"expired part must leave the view, got $parts")
  }
}

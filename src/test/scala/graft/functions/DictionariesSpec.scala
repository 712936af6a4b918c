package graft.functions

import graft.SparkTestBase

/** ClickHouse dictionary emulation: broadcast hash-map lookups that
  * compose anywhere an expression can (the decisive case: GROUP BY on
  * a dictGet, which a correlated-subquery rewrite cannot express).
  */
class DictionariesSpec extends SparkTestBase {

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
      .toDF("id", "name", "score").createOrReplaceTempView("dspec_dim")
    Seq((101L, 1L), (102L, 2L), (103L, 2L), (104L, 9L))
      .toDF("fact_id", "dim_id").createOrReplaceTempView("dspec_fact")
    Dictionaries.register(spark, "dspec_dict", "dspec_dim", "id")
  }

  test("dictGet / dictGetOrDefault / dictHas over a fact table") {
    ChCompat.registerAll(spark)
    setup()
    val r = spark.sql("""
      SELECT fact_id,
             dictGet('dspec_dict', 'name', dim_id) AS nm,
             dictGetOrDefault('dspec_dict', 'name', dim_id, 'unknown') AS nmd,
             dictGetFloat64('dspec_dict', 'score', dim_id) AS sc,
             dictHas('dspec_dict', dim_id) AS present
      FROM dspec_fact ORDER BY fact_id""").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getString(2),
      if (x.isNullAt(3)) -1.0 else x.getDouble(3), x.getBoolean(4))).toSeq ===
      Seq(
        (101L, "alpha", "alpha", 10.0, true),
        (102L, "beta", "beta", 20.0, true),
        (103L, "beta", "beta", 20.0, true),
        (104L, null, "unknown", -1.0, false)))
  }

  test("dictGet works as a GROUP BY key (the canonical CH idiom)") {
    ChCompat.registerAll(spark)
    setup()
    val r = spark.sql("""
      SELECT dictGetOrDefault('dspec_dict', 'name', dim_id, '?') AS nm,
             count(*) AS cnt
      FROM dspec_fact GROUP BY nm ORDER BY nm""").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ===
      Seq(("?", 1L), ("alpha", 1L), ("beta", 2L)))
  }

  test("key type coercion: an INT key probes a BIGINT-keyed dictionary") {
    ChCompat.registerAll(spark)
    setup()
    val r = spark.sql(
      "SELECT dictGet('dspec_dict', 'name', CAST(2 AS INT)) AS nm").head
    assert(r.getString(0) === "beta")
  }

  test("loud errors: unknown dictionary, unknown attribute, size cap") {
    ChCompat.registerAll(spark)
    setup()
    val e1 = intercept[Exception] {
      spark.sql("SELECT dictGet('nope', 'name', 1L)").collect()
    }
    assert(e1.getMessage.contains("no dictionary registered"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT dictGet('dspec_dict', 'nope', 1L)").collect()
    }
    assert(e2.getMessage.contains("no attribute"))
    val e3 = intercept[IllegalArgumentException] {
      Dictionaries.register(spark, "too_big", "dspec_dim", "id",
        maxEntries = 2)
    }
    assert(e3.getMessage.contains("JOIN, not a dictionary"))
  }

  test("composite key: tuple(org, repo) probes a two-column key") {
    import spark.implicits._
    ChCompat.registerAll(spark)
    Seq(("apache", "spark", 40000L), ("apache", "kafka", 30000L),
      ("torvalds", "linux", 150000L))
      .toDF("org", "repo", "stars").createOrReplaceTempView("dspec_repos")
    Dictionaries.register(spark, "dspec_repos", "dspec_repos", "org, repo")
    val r = spark.sql("""
      SELECT dictGet('dspec_repos', 'stars', tuple('apache', 'spark')) AS s1,
             dictGetOrDefault('dspec_repos', 'stars',
                              tuple('apache', 'flink'), -1L) AS s2,
             dictHas('dspec_repos', tuple('torvalds', 'linux')) AS h""").head
    assert(r.getLong(0) === 40000L)
    assert(r.getLong(1) === -1L)
    assert(r.getBoolean(2))
  }

  test("string-keyed dictionary: UTF8String keys probe correctly") {
    import spark.implicits._
    ChCompat.registerAll(spark)
    Seq(("us", "United States"), ("cn", "China"))
      .toDF("code", "label").createOrReplaceTempView("dspec_codes")
    Dictionaries.register(spark, "dspec_codes", "dspec_codes", "code")
    val r = spark.sql("""
      SELECT dictGet('dspec_codes', 'label', lower('US')) AS l1,
             dictGetOrDefault('dspec_codes', 'label', 'xx', 'n/a') AS l2""")
      .head
    assert(r.getString(0) === "United States")
    assert(r.getString(1) === "n/a")
  }
}

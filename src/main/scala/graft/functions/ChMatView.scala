package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse `CREATE MATERIALIZED VIEW` front-end.
  *
  * A CH materialized view is an INSERT TRIGGER, not a cached query:
  * each block inserted into the source table runs through the view's
  * SELECT and the result is APPENDED to the target table; with an
  * Aggregating/SummingMergeTree target the appended rows are partial
  * aggregates that background merges (and `FINAL`/`-Merge` reads)
  * combine. `POPULATE` additionally backfills the target from the
  * source's current contents.
  *
  * The Spark-native spelling of the same contract (the
  * IncrementalRollup / StreamingRollup pattern this repo already
  * gates as r30):
  *
  *  - [[ChMatView.populate]] — the POPULATE backfill: run the SELECT
  *    over the source's current state, append to the target.
  *  - [[ChMatView.applyBlock]] — the insert trigger: run the SELECT
  *    over ONE inserted block (and only that block — CH's documented
  *    per-block semantics, including its famous corollary that the MV
  *    never sees rows inserted before its creation), append to the
  *    target. Per-block results are PARTIAL aggregates; exactness
  *    comes from the read-side merge, so appends need no coordination
  *    — the property that makes the pattern work at 1000-executor
  *    ingest.
  *  - [[ChMatView.readMerged]] — the `-Merge` read: re-aggregate the
  *    target by the view's GROUP BY keys. sum/count/min/max are
  *    mergeable by re-application (sum of sums, min of mins; count
  *    partials MERGE BY SUM — the one spot naive re-application would
  *    silently corrupt); avg/uniq must be spelled as their
  *    State-style decompositions in the view SELECT, as in CH.
  *
  * The view's SELECT is evaluated with the source name TEMPORARILY
  * bound to the block DataFrame (a temp view shadows the catalog
  * table), so the SELECT text runs verbatim — any ClickHouse-ism in
  * it goes through [[ChSqlRewrite]] first. ENGINE / PARTITION BY /
  * ORDER BY clauses are parsed past and recorded; parquet + Catalyst
  * own the physical layout here (same contract as [[ChDdl]]).
  */
object ChMatView {

  final case class MatViewSpec(
      name: String,
      target: Option[String],
      engine: Option[String],
      populateOnCreate: Boolean,
      selectSql: String,
      sourceTable: String,
      groupByCols: Seq[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MatViewSpec]()

  def get(name: String): Option[MatViewSpec] =
    Option(registry.get(name.toLowerCase))

  private val headerRe =
    ("""(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([`"\w.]+)\s*(?:ON\s+CLUSTER\s+\S+\s*)?(.*)$""").r

  /** Parse the DDL and register the view. When the statement carries
    * `POPULATE`, the backfill runs immediately (CH's behavior).
    * `IF NOT EXISTS` against an already-registered name is a NO-OP
    * returning the existing spec — critically, it must NOT re-run
    * POPULATE, which would append a second full set of partials to
    * the target (CH no-ops here too). Returns the parsed spec.
    */
  def create(spark: SparkSession, ddl: String): MatViewSpec = {
    val m = headerRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(
        "ChMatView: not a CREATE MATERIALIZED VIEW statement"))
    val name = m.group(2).replace("`", "").replace("\"", "")
      .split('.').last.toLowerCase
    if (m.group(1) != null) get(name).foreach(existing => return existing)
    val rest = m.group(3)
    // split the header tail from the AS SELECT at the first depth-0
    // `AS` followed by `SELECT`
    val asIdx = {
      var j = 0; var depth = 0; var found = -1
      val lower = rest.toLowerCase
      while (j < rest.length && found < 0) {
        rest.charAt(j) match {
          case '(' => depth += 1; j += 1
          case ')' => depth -= 1; j += 1
          case '\'' | '`' | '"' =>
            val q = rest.charAt(j); j += 1
            while (j < rest.length && rest.charAt(j) != q) j += 1
            j += 1
          case _ =>
            if (depth == 0 && lower.startsWith("as", j) &&
              (j == 0 || !rest.charAt(j - 1).isLetterOrDigit) &&
              lower.substring(j + 2).dropWhile(_.isWhitespace)
                .startsWith("select")) found = j
            j += 1
        }
      }
      if (found < 0) throw new IllegalArgumentException(
        "ChMatView: no AS SELECT in materialized view DDL")
      found
    }
    val header = rest.substring(0, asIdx)
    val selectSql = rest.substring(asIdx + 2).trim.stripSuffix(";").trim
    val toRe = """(?is)\bTO\s+([`"\w.]+)""".r
    val engineRe = """(?is)\bENGINE\s*=\s*(\w+)""".r
    val target = toRe.findFirstMatchIn(header)
      .map(_.group(1).replace("`", "").replace("\"", "")
        .split('.').last.toLowerCase)
    val engine = engineRe.findFirstMatchIn(header).map(_.group(1))
    val populate = """(?is)\bPOPULATE\b""".r.findFirstIn(header).isDefined
    // source table: first FROM <ident> in the SELECT (the trigger
    // attaches to ONE source table in CH, too)
    val fromRe = """(?is)\bFROM\s+([`"\w.]+)""".r
    val source = fromRe.findFirstMatchIn(selectSql).map(
      _.group(1).replace("`", "").replace("\"", "")
        .split('.').last.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        "ChMatView: view SELECT has no FROM table"))
    val groupRe = """(?is)\bGROUP\s+BY\s+(.+?)(?:\bORDER\b|\bHAVING\b|\bLIMIT\b|$)""".r
    val groupByCols = groupRe.findFirstMatchIn(selectSql)
      .map(_.group(1).split(',').map(_.trim.replace("`", ""))
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val spec = MatViewSpec(name, target, engine, populate, selectSql,
      source, groupByCols)
    registry.put(name, spec)
    if (populate) this.populate(spark, name)
    spec
  }

  private def targetTable(spec: MatViewSpec): String =
    spec.target.getOrElse(s"${spec.name}__inner")

  private def runSelect(spark: SparkSession, spec: MatViewSpec): DataFrame =
    ChCompat.sql(spark, spec.selectSql)

  private def append(spark: SparkSession, spec: MatViewSpec,
      out: DataFrame): Unit = {
    val tgt = targetTable(spec)
    if (!spark.catalog.tableExists(tgt))
      out.write.saveAsTable(tgt)
    else out.write.mode("append").insertInto(tgt)
  }

  /** POPULATE: backfill the target from the source's CURRENT state. */
  def populate(spark: SparkSession, name: String): Unit = {
    val spec = get(name).getOrElse(
      throw new IllegalArgumentException(s"ChMatView: unknown view $name"))
    append(spark, spec, runSelect(spark, spec))
  }

  /** The insert trigger: run the view SELECT over ONE inserted block,
    * append the partial result to the target. The block DataFrame is
    * bound to the source-table name via a temp view for the duration
    * (a temp view shadows the catalog table in resolution), then
    * unbound.
    */
  def applyBlock(spark: SparkSession, name: String, block: DataFrame): Unit = {
    val spec = get(name).getOrElse(
      throw new IllegalArgumentException(s"ChMatView: unknown view $name"))
    // everything runs on the BLOCK's session: inside foreachBatch the
    // micro-batch df belongs to the streaming clone session, whose
    // temp-view catalog is separate — registering the block there and
    // resolving the SELECT elsewhere would silently aggregate the
    // caller's (possibly empty) binding instead of the block
    val s = block.sparkSession
    // if the source name is currently a TEMP view, remember it so the
    // caller's binding survives the block evaluation
    val prior =
      try {
        val t = s.catalog.getTable(spec.sourceTable)
        if (t.tableType == "TEMPORARY") Some(s.table(spec.sourceTable))
        else None
      } catch { case _: Exception => None }
    block.createOrReplaceTempView(spec.sourceTable)
    try append(s, spec, runSelect(s, spec))
    finally {
      s.catalog.dropTempView(spec.sourceTable)
      prior.foreach(_.createOrReplaceTempView(spec.sourceTable))
    }
  }

  /** The `-Merge` read: re-aggregate the appended partials by the
    * view's GROUP BY keys. sum/min/max merge by re-application; count
    * partials merge by SUM (counting counts would corrupt). Columns
    * not in GROUP BY are merged by the given per-column merge
    * function name, default `sum` — matching SummingMergeTree, the
    * overwhelmingly common MV target.
    */
  def readMerged(spark: SparkSession, name: String,
      mergeFns: Map[String, String] = Map.empty): DataFrame = {
    val spec = get(name).getOrElse(
      throw new IllegalArgumentException(s"ChMatView: unknown view $name"))
    val tgt = targetTable(spec)
    val df = spark.table(tgt)
    val keys = spec.groupByCols.map(k =>
      // GROUP BY entries may be positions or expressions; keep only
      // entries that are actual target columns (CH MV targets key by
      // column name, too)
      df.columns.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"ChMatView: GROUP BY entry `$k` is not a target column — " +
            "alias the key in the view SELECT")))
    val aggCols = df.columns.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
    val keySql = keys.map(k => s"`$k`").mkString(", ")
    if (aggCols.isEmpty)
      // keys-only view (dedup-style MV): the merge is a DISTINCT
      spark.sql(s"SELECT DISTINCT $keySql FROM `$tgt`")
    else {
      val aggSql = aggCols.map { c =>
        val fn = mergeFns.getOrElse(c, "sum")
        s"$fn(`$c`) AS `$c`"
      }.mkString(", ")
      spark.sql(
        s"SELECT $keySql, $aggSql FROM `$tgt` GROUP BY $keySql")
    }
  }
}

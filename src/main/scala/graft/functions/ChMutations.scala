package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, when}

/** ClickHouse mutation front-end: `ALTER TABLE t DELETE WHERE c` and
  * `ALTER TABLE t UPDATE a = e1, b = e2 WHERE c`.
  *
  * ClickHouse itself executes mutations as asynchronous COPY-ON-WRITE
  * part rewrites — every part containing a matching row is rewritten
  * whole (the reference repo's operational guidance relies on exactly
  * that heaviness being rare). The Spark-native spelling of the same
  * contract over parquet catalog tables:
  *
  *  - **partitioned table** — only TOUCHED partitions are rewritten:
  *    the mutation predicate is evaluated once to collect the distinct
  *    partition values it reaches, the rewrite plan filters to those
  *    partitions (partition pruning keeps untouched data unread, the
  *    analogue of CH skipping parts with no match), and the write
  *    uses dynamic partition overwrite. A DELETE that empties a
  *    partition entirely falls out of the dynamic-overwrite output, so
  *    emptied partitions are dropped explicitly afterwards.
  *  - **unpartitioned table** — full rewrite through a staging
  *    directory (Spark refuses to overwrite a path it is reading —
  *    the staging hop is the atomicity CH gets from part swapping).
  *  - **bucketed table** — the rewrite preserves the bucket spec:
  *    the staging read is repartitioned onto the bucket columns and
  *    re-sorted to the spec before the insert, so the
  *    one-sorted-file-per-bucket layout (and every zero-exchange
  *    read plan built on it) survives mutations — CH's mutations
  *    likewise rewrite parts in the table's ORDER BY layout.
  *
  * UPDATE keeps the column's declared type: each assignment becomes
  * `CASE WHEN c THEN cast(e AS declaredType) ELSE col END`, so a
  * mutation can never drift the table schema (CH enforces the same).
  * As in ClickHouse, key/partition columns cannot be UPDATEd.
  */
object ChMutations {

  private val deleteRe =
    """(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+DELETE\s+WHERE\s+(.+?)\s*;?\s*$""".r
  // the modern ClickHouse spelling ("lightweight delete"); CH executes
  // it as a masked read followed by the same part rewrite at merge
  // time — here both spellings are the same copy-on-write mutation
  private val deleteFromRe =
    """(?is)^\s*DELETE\s+FROM\s+([`"\w.]+)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  // `IN PARTITION` restricts a mutation to ONE named partition even
  // where the predicate matches rows elsewhere (CH's scoping clause);
  // the partition names by value ('x'), bare word, or full (k = v) spec
  private val partClause = """(?:'([^']*)'|(\w+)|\(([^)]*)\))"""
  private val deleteInPartRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+DELETE\s+IN\s+PARTITION\s+""" +
      partClause + """\s+WHERE\s+(.+?)\s*;?\s*$""").r
  private val updateInPartRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+UPDATE\s+(.+?)""" +
      """\s+IN\s+PARTITION\s+""" + partClause +
      """\s+WHERE\s+(.+?)\s*;?\s*$""").r
  private val modifyTtlRe =
    """(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+MODIFY\s+TTL\s+(.+?)\s*;?\s*$""".r
  private val materializeTtlRe =
    """(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+MATERIALIZE\s+TTL\s*;?\s*$""".r
  private val updateRe =
    """(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+UPDATE\s+(.+?)\s*;?\s*$""".r
  private val addColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+ADD\s+COLUMN\s+""" +
      """(?:IF\s+NOT\s+EXISTS\s+)?[`"]?(\w+)[`"]?\s+([\w()',\s]+?)""" +
      """(?:\s+DEFAULT\s+(.+?))?(?:\s+AFTER\s+[`"]?\w+[`"]?)?\s*;?\s*$""").r
  private val dropColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+DROP\s+COLUMN\s+""" +
      """(?:IF\s+EXISTS\s+)?[`"]?(\w+)[`"]?\s*;?\s*$""").r
  private val renameColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+RENAME\s+COLUMN\s+""" +
      """[`"]?(\w+)[`"]?\s+TO\s+[`"]?(\w+)[`"]?\s*;?\s*$""").r
  private val modifyColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+MODIFY\s+COLUMN\s+""" +
      """[`"]?(\w+)[`"]?\s+([\w()',\s]+?)\s*;?\s*$""").r
  private val dropPartRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+DROP\s+PARTITION\s+""" +
      """(?:'([^']*)'|(\w+)|\(([^)]*)\))\s*;?\s*$""").r
  private val optimizeRe =
    """(?is)^\s*OPTIMIZE\s+TABLE\s+([`"\w.]+)(\s+FINAL)?\s*;?\s*$""".r

  /** Parse and apply one mutation / maintenance statement. Returns the
    * number of partitions rewritten (0 = full-table rewrite or a
    * non-rewriting statement). The WHERE is mandatory on DELETE/UPDATE,
    * as in ClickHouse.
    */
  def mutate(spark: SparkSession, sql: String): Int =
    if (ChProjections.route(spark, sql)) 0 else sql match {
    case deleteInPartRe(rawTable, quoted, bare, specList, cond) =>
      val table = cleanName(rawTable)
      rewrite(spark, table, ChSqlRewrite.rewriteExpr(cond),
        assignments = Nil, restrictTo = Some(Seq(resolvePartSpec(spark,
          table, Option(quoted).orElse(Option(bare)), Option(specList)))))
    case updateInPartRe(rawTable, sets, quoted, bare, specList, cond) =>
      val table = cleanName(rawTable)
      val assigns = splitAssignments(sets).map { case (c, e) =>
        (c, ChSqlRewrite.rewriteExpr(e))
      }
      rewrite(spark, table, ChSqlRewrite.rewriteExpr(cond), assigns,
        restrictTo = Some(Seq(resolvePartSpec(spark, table,
          Option(quoted).orElse(Option(bare)), Option(specList)))))
    case deleteRe(rawTable, cond) =>
      rewrite(spark, cleanName(rawTable), ChSqlRewrite.rewriteExpr(cond),
        assignments = Nil)
    case deleteFromRe(rawTable, cond) =>
      rewrite(spark, cleanName(rawTable), ChSqlRewrite.rewriteExpr(cond),
        assignments = Nil)
    case modifyTtlRe(rawTable, ttlExpr) =>
      // declaration-only, like CH: MODIFY TTL swaps the policy; rows
      // expire at the next merge — i.e. the next MATERIALIZE TTL /
      // applyTtl pass — not now
      val decl = ChTtl.parseTtlExpr(ttlExpr).getOrElse(
        throw new IllegalArgumentException(
          s"ChMutations: unsupported TTL expression `$ttlExpr` — " +
            "expected `<col> + INTERVAL n unit [DELETE]` or " +
            "`<col> + toIntervalUnit(n) [DELETE]`"))
      ChTtl.registerTtl(cleanName(rawTable), decl)
      0
    case materializeTtlRe(rawTable) =>
      val (dropped, rewritten) =
        ChTtl.materialize(spark, cleanName(rawTable))
      dropped + rewritten
    case updateRe(rawTable, setsAndCond) =>
      // split at the first TOP-LEVEL `WHERE` — a WHERE inside a
      // subquery assignment sits at paren depth > 0 and is skipped
      val (sets, cond) = splitAtTopLevelWhere(setsAndCond).getOrElse(
        throw new IllegalArgumentException(
          "ChMutations: UPDATE needs a WHERE, as in ClickHouse"))
      val assigns = splitAssignments(sets).map { case (c, e) =>
        (c, ChSqlRewrite.rewriteExpr(e))
      }
      rewrite(spark, cleanName(rawTable), ChSqlRewrite.rewriteExpr(cond), assigns)
    case addColRe(rawTable, colName, chType, default) =>
      addColumn(spark, cleanName(rawTable), colName, chType.trim,
        Option(default).map(ChSqlRewrite.rewriteExpr))
    case dropColRe(rawTable, colName) =>
      schemaRewrite(spark, cleanName(rawTable), colName,
        df => df.drop(colName))
    case renameColRe(rawTable, from, to) =>
      schemaRewrite(spark, cleanName(rawTable), from,
        df => df.withColumnRenamed(from, to))
    case modifyColRe(rawTable, colName, chType) =>
      val (sparkType, _) = ChDdl.mapType(chType.trim)
      schemaRewrite(spark, cleanName(rawTable), colName,
        df => df.withColumn(colName, col(colName).cast(sparkType)))
    case dropPartRe(rawTable, quoted, bare, specList) =>
      dropPartition(spark, cleanName(rawTable),
        Option(quoted).orElse(Option(bare)), Option(specList))
    case optimizeRe(rawTable, fin) =>
      optimizeFinal(spark, cleanName(rawTable), fin != null)
    case _ => throw new IllegalArgumentException(
      "ChMutations: expected `ALTER TABLE t DELETE WHERE c` (or the " +
        "lightweight `DELETE FROM t WHERE c`), " +
        "`ALTER TABLE t UPDATE a = e[, …] WHERE c` (WHERE is mandatory, " +
        "as in ClickHouse), `ALTER TABLE t DROP PARTITION v`, " +
        "`ALTER TABLE t MODIFY TTL …`, `ALTER TABLE t MATERIALIZE TTL`, " +
        "or `OPTIMIZE TABLE t [FINAL]`")
  }

  /** Partition-restricted DELETE for callers that have ALREADY
    * determined exactly which partitions the predicate touches (the
    * TTL pass computes straddling partitions from its own stats scan —
    * round-17 VERDICT #5): skips the predicate-discovery pass over the
    * whole table, so the rewrite reads and writes ONLY the named
    * partitions, O(given set) by construction. Values must be the
    * partition columns' values as read from the table (same types the
    * discovery scan would have collected).
    */
  def deleteInPartitions(spark: SparkSession, table: String, cond: String,
      partitions: Seq[Map[String, Any]]): Int =
    if (partitions.isEmpty) 0
    else rewrite(spark, table, ChSqlRewrite.rewriteExpr(cond),
      assignments = Nil, restrictTo = Some(partitions))

  /** `ADD COLUMN name ChType [DEFAULT expr] [AFTER col]`: the type
    * maps through [[ChDdl.mapType]] and the column appends via native
    * `ALTER TABLE ADD COLUMNS` (metadata-only — existing files simply
    * lack the column and read NULL, exactly CH's lazy-default
    * materialization for NULL-defaulted columns). A DEFAULT expression
    * triggers a physical backfill through the UPDATE copy-on-write
    * path, since parquet has no read-time default to lean on. AFTER
    * is parsed past and dropped: parquet resolves by name, not
    * position.
    */
  private def addColumn(spark: SparkSession, table: String, name: String,
      chType: String, default: Option[String]): Int = {
    val (sparkType, _) = ChDdl.mapType(chType)
    spark.sql(s"ALTER TABLE `$table` ADD COLUMNS (`$name` $sparkType)")
    default.map { d =>
      rewrite(spark, table, cond = "true", assignments = Seq(name -> d))
    }.getOrElse(0)
  }

  /** DROP/RENAME/MODIFY COLUMN: v1 parquet tables can't evolve those
    * in place, so this is the same copy-on-write CH performs for a
    * column-touching mutation — transform every row, then RECREATE the
    * table with the transformed schema (same provider, partitioning,
    * and location class). Partition columns refuse, like the key
    * mutations.
    */
  private def schemaRewrite(spark: SparkSession, table: String,
      touchedCol: String, transform: DataFrame => DataFrame): Int = {
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    val base = spark.table(table)
    if (!base.columns.exists(_.equalsIgnoreCase(touchedCol)))
      throw new IllegalArgumentException(
        s"ChMutations: unknown column `$touchedCol` on `$table`")
    if (partCols.exists(_.equalsIgnoreCase(touchedCol)))
      throw new IllegalArgumentException(
        s"ChMutations: cannot alter partition column `$touchedCol`")
    val out = transform(base)
    val staging = stageOut(out)
    // NO finally-cleanup here, deliberately: once the DROP TABLE below
    // runs, staging holds the ONLY copy of the data. If the recreate or
    // the insert fails, staging must survive so the data is recoverable
    // — deleting it on the failure path would make a transient write
    // error permanent data loss. Cleanup happens only after success.
    try {
      val external =
        meta.tableType == org.apache.spark.sql.catalyst.catalog
          .CatalogTableType.EXTERNAL
      val loc = meta.storage.locationUri
      spark.sql(s"DROP TABLE `$table`")
      if (external) loc.foreach { uri =>
        // external DROP keeps files; clear them so the recreate starts
        // from the rewritten data only
        val p = new org.apache.hadoop.fs.Path(uri)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      val staged = spark.read.schema(out.schema).parquet(staging)
      val part =
        if (partCols.isEmpty) ""
        else s" PARTITIONED BY (${partCols.map(c => s"`$c`").mkString(", ")})"
      val locSql =
        if (external) loc.map(u => s" LOCATION '$u'").getOrElse("") else ""
      spark.sql(s"CREATE TABLE `$table` (${staged.schema.toDDL}) " +
        s"USING ${meta.provider.getOrElse("parquet")}$part$locSql")
      // v1 moves partition columns to the END of the table schema
      val ordered = staged.columns.filterNot(c =>
        partCols.exists(_.equalsIgnoreCase(c))) ++ partCols
      staged.select(ordered.map(col): _*)
        .write.mode("append").insertInto(table)
    } catch {
      case e: Throwable => throw new RuntimeException(
        s"ChMutations: schema rewrite of `$table` failed mid-swap; the " +
          s"rewritten data is preserved at $staging — if the table was " +
          "already dropped, recreate it from that directory", e)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    0
  }

  /** The IN PARTITION clause's partition as a (column → value) map.
    * The bare value form requires a single partition column (the
    * common CH layout, same rule as DROP PARTITION); the (k = v, …)
    * form names columns explicitly. Values stay the statement's TEXT:
    * partition predicates compare through Spark's implicit cast and
    * the emptied-partition bookkeeping is string-normalized, so typed
    * partition columns (int day keys) match either way.
    */
  private def resolvePartSpec(spark: SparkSession, table: String,
      value: Option[String], spec: Option[String]): Map[String, Any] = {
    val partCols = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .partitionColumnNames
    spec match {
      case Some(s) =>
        splitAssignments(s).map { case (c, raw) =>
          val v = raw.trim
          val lit =
            if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
              v.substring(1, v.length - 1).replace("''", "'")
            else v
          c -> (lit: Any)
        }.toMap
      case None =>
        if (partCols.length != 1) throw new IllegalArgumentException(
          s"ChMutations: IN PARTITION '<value>' needs exactly one " +
            s"partition column on `$table` (found ${partCols.length}); " +
            "use the (col = value, …) spec form")
        Map(partCols.head -> value.get)
    }
  }

  /** CH `ALTER TABLE t DROP PARTITION '202401'` names a partition by
    * VALUE (its single-column partition-id form); the parenthesized
    * form `(k = v, …)` passes a full Spark partition spec through. The
    * value form requires a single partition column — the common CH
    * layout — and errors otherwise.
    */
  private def dropPartition(spark: SparkSession, table: String,
      value: Option[String], spec: Option[String]): Int = {
    val sqlSpec = spec.getOrElse {
      val partCols = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .partitionColumnNames
      if (partCols.length != 1) throw new IllegalArgumentException(
        s"ChMutations: DROP PARTITION '<value>' needs exactly one " +
          s"partition column on `$table` (found ${partCols.length}); " +
          "use the (col = value, …) spec form")
      s"`${partCols.head}` = '${value.get.replace("'", "''")}'"
    }
    spark.sql(s"ALTER TABLE `$table` DROP IF EXISTS PARTITION ($sqlSpec)")
    0
  }

  /** CH `OPTIMIZE TABLE t FINAL` forces the background merge that
    * collapses ReplacingMergeTree duplicates NOW. Here: physically
    * materialize the table's registered FINAL dedup (same contract
    * `FROM t FINAL` applies at read time) via copy-on-write, so
    * subsequent plain reads see deduplicated data and drop the
    * read-side window. Without FINAL (or without a registered
    * declaration) it is a no-op, like OPTIMIZE on an already-merged
    * CH table.
    */
  private def optimizeFinal(spark: SparkSession, table: String,
      fin: Boolean): Int = {
    val decl = ChSqlRewrite.replacingDecl(table)
    if (!fin || decl.isEmpty) return 0
    val d = decl.get
    val base = spark.table(table)
    val deduped = graft.operators.Dedup.replacingDedup(
      base, d.keys, org.apache.spark.sql.functions.expr(d.versionSql))
    val staging = stageOut(deduped.select(base.columns.map(col): _*))
    try spark.read.schema(base.schema).parquet(staging)
      .write.mode("overwrite").insertInto(table)
    finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(staging))
    0
  }

  private def cleanName(raw: String): String =
    raw.replace("`", "").replace("\"", "").split('.').last

  /** (before, after) around the first depth-0, unquoted `WHERE`. */
  private def splitAtTopLevelWhere(s: String): Option[(String, String)] = {
    var j = 0; var depth = 0
    while (j < s.length) {
      s.charAt(j) match {
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case q @ ('\'' | '"' | '`') =>
          j += 1
          while (j < s.length && s.charAt(j) != q) {
            if (s.charAt(j) == '\\') j += 1
            j += 1
          }
          j += 1
        case c if depth == 0 && (c == 'w' || c == 'W') &&
          s.regionMatches(true, j, "where", 0, 5) &&
          (j == 0 || !s.charAt(j - 1).isLetterOrDigit) &&
          (j + 5 >= s.length || !s.charAt(j + 5).isLetterOrDigit) =>
          return Some((s.substring(0, j).trim, s.substring(j + 5).trim))
        case _ => j += 1
      }
    }
    None
  }

  /** top-level-comma split of `a = e1, b = e2`, quote/paren aware */
  private def splitAssignments(sets: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0; var j = 0
    while (j < sets.length) {
      sets.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' | '"' | '`' =>
          val q = sets.charAt(j)
          j += 1
          while (j < sets.length && sets.charAt(j) != q) {
            if (sets.charAt(j) == '\\') j += 1
            j += 1
          }
        case ',' if depth == 0 =>
          parts += sets.substring(start, j); start = j + 1
        case _ =>
      }
      j += 1
    }
    parts += sets.substring(start)
    parts.toSeq.map { p =>
      val eq = {
        // first top-level `=` not part of <= >= != ==
        var k = 0; var d = 0; var found = -1
        while (k < p.length && found < 0) {
          p.charAt(k) match {
            case '(' => d += 1
            case ')' => d -= 1
            case '=' if d == 0 && k > 0 &&
              !"<>!=".contains(p.charAt(k - 1)) &&
              (k + 1 >= p.length || p.charAt(k + 1) != '=') => found = k
            case _ =>
          }
          k += 1
        }
        found
      }
      if (eq < 0) throw new IllegalArgumentException(
        s"ChMutations: assignment `$p` has no `=`")
      (p.substring(0, eq).trim.replace("`", ""), p.substring(eq + 1).trim)
    }
  }

  /** SQL literal for a collected partition value: numerics/booleans
    * bare, EVERYTHING else quoted — an unquoted `2024-01-02` parses as
    * integer subtraction and silently matches nothing.
    */
  private def partLit(v: Any): String = v match {
    case null => throw new IllegalArgumentException(
      "ChMutations: NULL partition value has no SQL literal")
    case _: java.lang.Number | _: java.lang.Boolean => v.toString
    case x => s"'${x.toString.replace("'", "''")}'"
  }

  /** Null-safe equality predicate text for one partition column. */
  private def partEq(c: String, v: Any): String =
    if (v == null) s"`$c` IS NULL" else s"`$c` = ${partLit(v)}"

  /** DELETE keeps rows where the predicate is FALSE **or NULL** — CH
    * deletes only rows where the condition evaluates to true.
    */
  private def keepRows(df: DataFrame, cond: String): DataFrame =
    df.filter(!org.apache.spark.sql.functions.coalesce(
      expr(cond).cast("boolean"),
      org.apache.spark.sql.functions.lit(false)))

  private def stageOut(df: DataFrame): String = {
    val staging = java.nio.file.Files
      .createTempDirectory("ch_mutation_").toString
    df.write.mode("overwrite").parquet(staging)
    staging
  }

  private def rewrite(spark: SparkSession, table: String, cond: String,
      assignments: Seq[(String, String)],
      restrictTo: Option[Seq[Map[String, Any]]] = None): Int = {
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    if (restrictTo.isDefined && partCols.isEmpty)
      throw new IllegalArgumentException(
        s"ChMutations: partition-restricted mutation on unpartitioned " +
          s"table `$table`")
    assignments.foreach { case (c, _) =>
      if (partCols.exists(_.equalsIgnoreCase(c)))
        throw new IllegalArgumentException(
          s"ChMutations: cannot UPDATE partition column `$c` " +
            "(ClickHouse forbids mutating key columns for the same reason)")
    }
    val base = spark.table(table)
    val fieldType = base.schema.map(f => f.name.toLowerCase -> f.dataType).toMap
    def applyAssignments(df: DataFrame): DataFrame =
      assignments.foldLeft(df) { case (d, (c, e)) =>
        val dt = fieldType.getOrElse(c.toLowerCase,
          throw new IllegalArgumentException(
            s"ChMutations: UPDATE of unknown column `$c`"))
        d.withColumn(c, when(expr(cond), expr(e).cast(dt)).otherwise(col(c)))
      }
    // Bucketed tables (round-16 VERDICT #3): the insert itself honors
    // the catalog's bucket spec (FileFormatWriter hashes rows into
    // bucket-id-named files), but an unshaped staging read would land
    // (tasks × buckets) files — the bucket layout survives yet the
    // one-sorted-file-per-bucket discipline that makes post-mutation
    // reads exchange-AND-sort-free does not. Re-shape to the spec:
    // repartition on the bucket columns into numBuckets (the same
    // Murmur3 HashPartitioning the writer applies, so each task holds
    // exactly one bucket → one file) + the spec's in-partition sort.
    // This is CH's contract that a mutation rewrites parts IN PLACE,
    // keeping the table's ORDER BY layout.
    def shapeToBuckets(df: DataFrame): DataFrame = meta.bucketSpec match {
      case Some(spec) =>
        val rep = df.repartition(spec.numBuckets,
          spec.bucketColumnNames.map(col): _*)
        if (spec.sortColumnNames.nonEmpty)
          rep.sortWithinPartitions(spec.sortColumnNames.map(col): _*)
        else rep
      case None => df
    }

    if (partCols.nonEmpty) {
      // touched partitions: the only ones whose files change. When the
      // caller supplies them (deleteInPartitions) the discovery scan is
      // skipped entirely; otherwise the predicate is evaluated once —
      // that scan reads only the predicate's columns, and everything
      // else of the untouched partitions is never read or written.
      val touched: Array[Seq[Any]] = restrictTo match {
        case Some(specs) => specs.map { spec =>
          partCols.map { c =>
            spec.collectFirst { case (k, v) if k.equalsIgnoreCase(c) => v }
              .getOrElse(throw new IllegalArgumentException(
                s"ChMutations: partition spec $spec misses column `$c` " +
                  s"of `$table`"))
          }
        }.toArray
        case None => base.filter(expr(cond))
          .select(partCols.map(col): _*).distinct().collect()
          .map(_.toSeq)
      }
      if (touched.isEmpty) return 0
      val touchedPred = touched.map { vs =>
        partCols.zip(vs).map { case (c, v) =>
          partEq(c, v)
        }.mkString(" AND ")
      }.mkString("(", ") OR (", ")")
      val transformed = {
        val slice = base.filter(expr(touchedPred))
        val out =
          if (assignments.isEmpty) keepRows(slice, cond)
          else applyAssignments(slice)
        // insertInto is positional; keep declared column order
        out.select(base.columns.map(col): _*)
      }
      // staging hop: Spark refuses to overwrite files it is reading,
      // partitioned or not — the hop is CH's part-swap atomicity
      val staging = stageOut(transformed)
      try {
        // schema pinned: a DELETE may leave staging with zero files
        val staged = spark.read.schema(base.schema).parquet(staging)
        val prev =
          spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try shapeToBuckets(staged).write.mode("overwrite").insertInto(table)
        finally prev match {
          case Some(v) =>
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None =>
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        if (assignments.isEmpty) {
          // DELETE may have emptied whole partitions: dynamic overwrite
          // only replaces partitions PRESENT in its output, so an
          // emptied partition's stale files would survive — drop them
          // via partition DDL (the CH part drop). Emptied = touched
          // minus what the rewrite actually produced.
          // string-normalized on BOTH sides: restrictTo partitions may
          // arrive as statement text ("20240115") while the staged
          // read returns native types (Int) — a typed comparison would
          // call a still-populated partition "emptied" and DROP live
          // data
          val produced = staged.select(partCols.map(col): _*)
            .distinct().collect()
            .map(_.toSeq.map(String.valueOf)).toSet
          val emptied =
            touched.filterNot(vs => produced.contains(vs.map(String.valueOf)))
          emptied.foreach { vs =>
            // partition DDL cannot express a NULL partition value —
            // such partitions keep their (empty) directory, harmless
            if (vs.forall(_ != null)) {
              val specSql = partCols.zip(vs).map { case (c, v) =>
                s"`$c` = ${partLit(v)}"
              }.mkString(", ")
              spark.sql(
                s"ALTER TABLE `$table` DROP IF EXISTS PARTITION ($specSql)")
            }
          }
        }
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(staging))
      touched.length
    } else {
      // unpartitioned: full copy-on-write through the same staging hop
      val out =
        if (assignments.isEmpty) keepRows(base, cond)
        else applyAssignments(base)
      val staging = stageOut(out.select(base.columns.map(col): _*))
      // schema pinned: a DELETE matching every row leaves staging with
      // zero files, where inference fails but truncation is the intent
      try shapeToBuckets(spark.read.schema(base.schema).parquet(staging))
        .write.mode("overwrite").insertInto(table)
      finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(staging))
      0
    }
  }
}

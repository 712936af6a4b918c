package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** ClickHouse's data-bearing INSERT statements — the HTTP protocol
  * shape where the row payload follows the statement in the SAME body
  * (`INSERT INTO t FORMAT JSONEachRow\n{…}\n{…}`), which is how every
  * CH client library and `clickhouse-client` pipe data in.
  *
  *  - `FORMAT JSONEachRow` — the trailing lines are NDJSON; parsed
  *    against the TARGET table's schema (never inferred: a batch of
  *    nulls must not narrow a column type), missing fields become
  *    NULL, unknown fields are ignored — CH's
  *    input_format_skip_unknown_fields=1 posture, the tolerant-reader
  *    contract the ingest pipeline already applies to GitHub archive
  *    JSON.
  *  - `FORMAT Values` — the trailing text is a VALUES list; rewritten
  *    to Spark's native `INSERT INTO … VALUES`.
  *
  * An optional `(col, …)` list restricts the columns, as in CH;
  * unlisted columns take NULL. Returns the number of rows written.
  */
object ChInsert {

  private val jsonEachRowRe =
    ("""(?is)^\s*INSERT\s+INTO\s+([`"\w.]+)\s*(?:\(([^)]*)\)\s*)?""" +
      """FORMAT\s+JSONEachRow\s*?\n?(.*)$""").r
  private val valuesFmtRe =
    ("""(?is)^\s*INSERT\s+INTO\s+([`"\w.]+)\s*(?:\(([^)]*)\)\s*)?""" +
      """FORMAT\s+Values\s+(.*)$""").r

  /** Does this statement carry inline data this object must handle? */
  def matches(sql: String): Boolean =
    jsonEachRowRe.findFirstIn(sql).isDefined ||
      valuesFmtRe.findFirstIn(sql).isDefined

  def insert(spark: SparkSession, statement: String): Long =
    statement match {
      case jsonEachRowRe(rawTable, colList, data) =>
        insertJson(spark, cleanName(rawTable), Option(colList), data)
      case valuesFmtRe(rawTable, colList, values) =>
        val table = cleanName(rawTable)
        val cols = Option(colList).map(c => s" ($c)").getOrElse("")
        spark.sql(s"INSERT INTO `$table`$cols VALUES $values")
        countTopLevelTuples(values)
      case _ => throw new IllegalArgumentException(
        "ChInsert: not a FORMAT JSONEachRow / FORMAT Values insert")
    }

  private def cleanName(raw: String): String =
    raw.replace("`", "").replace("\"", "").split('.').last

  /** Rows in a VALUES list = depth-0 `(` openers (quote-aware) — a
    * lexical count, instead of two full-table count() scans that are
    * both expensive and racy under concurrent writers.
    */
  private def countTopLevelTuples(values: String): Long = {
    var n = 0L; var depth = 0; var j = 0
    while (j < values.length) {
      values.charAt(j) match {
        case '(' => if (depth == 0) n += 1; depth += 1
        case ')' => depth -= 1
        case '\'' =>
          j += 1
          while (j < values.length && values.charAt(j) != '\'') {
            if (values.charAt(j) == '\\') j += 1
            j += 1
          }
        case _ =>
      }
      j += 1
    }
    n
  }

  private def insertJson(spark: SparkSession, table: String,
      colList: Option[String], data: String): Long = {
    import spark.implicits._
    val target = spark.table(table)
    val allowed = colList.map(_.split(',')
      .map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq)
    val readSchema = allowed match {
      case None => target.schema
      case Some(cols) => org.apache.spark.sql.types.StructType(
        target.schema.filter(f => cols.exists(_.equalsIgnoreCase(f.name))))
    }
    val lines = data.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) return 0L
    // FAILFAST: a malformed line must reject the batch (CH errors on
    // bad rows) — PERMISSIVE would insert it as all-NULL and report
    // it written, silent corruption on any truncated body
    val parsed = spark.read.schema(readSchema)
      .option("mode", "FAILFAST").json(lines.toDS)
    // full table column order; unlisted columns are NULL of their type
    val out = target.columns.map { c =>
      if (parsed.columns.exists(_.equalsIgnoreCase(c))) col(c)
      else lit(null).cast(target.schema(c).dataType).as(c)
    }
    val n = parsed.count()
    parsed.select(out.toIndexedSeq: _*).write.mode("append").insertInto(table)
    n
  }
}

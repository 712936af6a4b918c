package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ingest.{EventsSchema, FilePipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter

/** HTTP query surface (SURVEY A32; reference: app/router.ts:3-9 plus the
  * README-documented example endpoints, README.md:67-130):
  *
  *   GET  /query/db_schema     — (key, type) pairs of the events schema
  *   GET  /status              — the pipeline status document
  *                               (reference: app/service/update_status.ts:32-40)
  *   GET  /query/record_count?table=events
  *   GET  /query/most_used_label?table=events&topN=20
  *   GET  /query/repo_activity?table=events&topN=20
  *   POST /query               — raw SQL against the registered catalog
  *
  * Each example endpoint returns its rows plus the elapsed time (ms) and
  * the exact SQL it ran, matching the README's contract ("returns the
  * query time and the example statement alongside the result").
  *
  * Built on the JDK's HttpServer (zero dependencies — this is a thin
  * adapter, not engine code; the engine surface is `spark.sql`).
  *
  * @param statusMeta optional supplier of the file-pipeline checkpoint
  *   table (path, status); when present `/status` serves the computed
  *   reference-shaped document, else a static liveness blob.
  * @param maxRows cap on rows returned by POST /query — results stream
  *   through `toLocalIterator`, so an unbounded SELECT neither
  *   materializes on the driver nor floods the response.
  */
class HttpServe(spark: SparkSession, port: Int,
    statusMeta: Option[() => DataFrame] = None,
    maxRows: Int = 10000) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** Runs `sql`, streams up to `maxRows` rows, and renders the
    * README-shaped `{time_ms, query, rows, truncated?}` document.
    * Queries go through the ClickHouse dialect front-end
    * ([[graft.functions.ChCompat.sql]]): the reference's users POST
    * ClickHouse SQL, so FINAL / LIMIT BY / PREWHERE / curried
    * aggregates / WITH TOTALS run verbatim over HTTP too (plain Spark
    * SQL passes through the lexical rewrite untouched).
    */
  private def runAndRender(ex: HttpExchange, sql: String): Unit =
    try {
      val t0 = System.nanoTime()
      val it = graft.functions.ChCompat.sql(spark, sql).toJSON.toLocalIterator()
      val sb = new StringBuilder
      var n = 0
      while (it.hasNext && n < maxRows) {
        if (n > 0) sb.append(',')
        sb.append(it.next()); n += 1
      }
      val truncated = it.hasNext
      val ms = (System.nanoTime() - t0) / 1e6
      respond(ex, 200,
        s"""{"time_ms":$ms,"query":"${jsonEscape(sql)}",""" +
          s""""truncated":$truncated,"rows":[$sb]}""")
    } catch {
      case e: Exception =>
        respond(ex, 400, s"""{"error":"${jsonEscape(
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500))}"}""")
    }

  /** Table params interpolate into SQL — identifiers only. */
  private def ident(params: Map[String, String], key: String,
      default: String): Option[String] = {
    val v = params.getOrElse(key, default)
    if (v.matches("[A-Za-z0-9_.]+")) Some(v) else None
  }

  private def exampleEndpoint(path: String, sql: (String, Int) => String,
      defaultTable: String = "events"): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val params = queryParams(ex)
      ident(params, "table", defaultTable) match {
        case None => respond(ex, 400, """{"error":"invalid table"}""")
        case Some(t) =>
          val topN = params.get("topN").flatMap(_.toIntOption).getOrElse(20)
          runAndRender(ex, sql(t, topN))
      }
    })

  def start(): Unit = {
    server.createContext("/query/db_schema", (ex: HttpExchange) => {
      val body = EventsSchema.dbSchema
        .map { case (k, t) => s"""{"key":"${jsonEscape(k)}","type":"${jsonEscape(t)}"}""" }
        .mkString("[", ",", "]")
      respond(ex, 200, body)
    })

    // GET /query/record_count?table=… (reference: README.md:85-92)
    exampleEndpoint("/query/record_count",
      (t, _) => s"SELECT COUNT(*) AS count FROM $t")

    // GET /query/most_used_label?table=…&topN=… (reference:
    // README.md:96-106). The reference JSON-decodes issue_labels and
    // arrayJoins the names; our events table stores the labels as a
    // typed array-of-struct, so the unnest is a plain explode.
    exampleEndpoint("/query/most_used_label", (t, n) =>
      s"""SELECT label, COUNT(*) AS count
         |FROM (SELECT explode(issue_labels.name) AS label FROM $t
         |      WHERE (type = 'IssuesEvent' OR type = 'PullRequestEvent')
         |        AND action = 'closed')
         |GROUP BY label ORDER BY count DESC, label ASC LIMIT $n""".stripMargin)

    // GET /query/repo_activity?table=…&topN=… (reference:
    // README.md:110-129). Single-pass pivot of the reference's
    // five-scan/four-join formula — each event routes to one weighted
    // count keyed on (repo, actor), with merged PRs attributed to the
    // PR author (the reference's `issue_author_id AS actor_id` leg) and
    // the LEFT-JOIN-from-comments row set reproduced by HAVING icc > 0.
    // Value-identical to the reference shape (same argument as r06/B16:
    // a join miss and a zero count_if both contribute 0).
    exampleEndpoint("/query/repo_activity", (t, n) =>
      s"""SELECT repo_id, round(sum(sqrt(score)), 2) AS repo_activity
         |FROM (
         |  SELECT repo_id, actor_key,
         |         count_if(type = 'IssueCommentEvent' AND action = 'created')
         |     + 2*count_if(type = 'IssuesEvent' AND action = 'opened')
         |     + 3*count_if(type = 'PullRequestEvent' AND action = 'opened')
         |     + 4*count_if(type = 'PullRequestReviewCommentEvent' AND action = 'created')
         |     + 5*count_if(type = 'PullRequestEvent' AND action = 'closed' AND pull_merged)
         |       AS score
         |  FROM (SELECT repo_id, type, action, pull_merged,
         |               CASE WHEN type = 'PullRequestEvent' AND action = 'closed'
         |                     AND pull_merged
         |                    THEN issue_author_id ELSE actor_id END AS actor_key
         |        FROM $t)
         |  GROUP BY repo_id, actor_key
         |  HAVING count_if(type = 'IssueCommentEvent' AND action = 'created') > 0)
         |GROUP BY repo_id
         |ORDER BY repo_activity DESC, repo_id ASC LIMIT $n""".stripMargin)

    // the ClickHouse HTTP health probe: load balancers and client
    // libraries GET /ping and expect the literal text "Ok.\n"
    server.createContext("/ping", (ex: HttpExchange) => {
      val bytes = "Ok.\n".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })

    server.createContext("/status", (ex: HttpExchange) =>
      statusMeta match {
        case None => respond(ex, 200, """{"status":"ok"}""")
        case Some(metaFn) =>
          try {
            val now = java.time.LocalDateTime.now()
              .format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
            respond(ex, 200, FilePipeline.statusDocument(metaFn(), now).toJson)
          } catch {
            case e: Exception =>
              respond(ex, 500, s"""{"error":"${jsonEscape(
                Option(e.getMessage).getOrElse(e.getClass.getName).take(500))}"}""")
          }
      })

    server.createContext("/query", (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
        // the CH HTTP protocol ships INSERT payloads in the same body
        // as the statement (FORMAT JSONEachRow / Values) — route those
        // to the data-bearing insert path, everything else to SQL
        if (graft.functions.ChInsert.matches(body))
          try {
            val n = graft.functions.ChInsert.insert(spark, body)
            respond(ex, 200, s"""{"written":$n}""")
          } catch {
            case e: Exception =>
              respond(ex, 400, s"""{"error":"${jsonEscape(
                Option(e.getMessage).getOrElse(e.getClass.getName)
                  .take(500))}"}""")
          }
        else runAndRender(ex, body)
      }
    })
    server.start()
  }

  def stop(): Unit = server.stop(0)

  def boundPort: Int = server.getAddress.getPort
}

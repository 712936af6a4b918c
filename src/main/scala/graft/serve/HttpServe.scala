package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ingest.EventsSchema
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal HTTP query surface (SURVEY A32; reference: app/router.ts:3-9
  * plus the README-documented endpoints, README.md:67-130):
  *
  *   GET  /query/db_schema  — (name, type) pairs of the events schema
  *   GET  /status           — pipeline status JSON
  *   POST /query            — raw SQL against the registered catalog
  *
  * Built on the JDK's HttpServer (zero dependencies — this is a thin
  * adapter, not engine code; the engine surface is `spark.sql`).
  */
class HttpServe(spark: SparkSession, port: Int) {

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

  def start(): Unit = {
    server.createContext("/query/db_schema", (ex: HttpExchange) => {
      val body = EventsSchema.dbSchema
        .map { case (k, t) => s"""{"key":"${jsonEscape(k)}","type":"${jsonEscape(t)}"}""" }
        .mkString("[", ",", "]")
      respond(ex, 200, body)
    })
    server.createContext("/status", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/query", (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
      else {
        val sql = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
        try {
          val t0 = System.nanoTime()
          val rows = spark.sql(sql).toJSON.collect()
          val ms = (System.nanoTime() - t0) / 1e6
          respond(ex, 200,
            s"""{"time_ms":$ms,"rows":[${rows.mkString(",")}]}""")
        } catch {
          case e: Exception =>
            respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage.take(500))}"}""")
        }
      }
    })
    server.start()
  }

  def stop(): Unit = server.stop(0)

  def boundPort: Int = server.getAddress.getPort
}

package graft.serve

import graft.SparkTestBase
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** HTTP surface (SURVEY A32) driven over a real socket. */
class HttpServeSpec extends SparkTestBase {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("db_schema, status, POST /query, and SQL-error path") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "name").createOrReplaceTempView("serve_t")
    val srv = new HttpServe(spark, 0)
    try {
      srv.start()
      val port = srv.boundPort

      val (c1, schema) = get(port, "/query/db_schema")
      assert(c1 === 200)
      assert(schema.contains(""""key":"actor_login"""") && schema.startsWith("["))

      val (c2, status) = get(port, "/status")
      assert(c2 === 200 && status.contains("ok"))

      val (c3, rows) = post(port, "/query",
        "SELECT id, name FROM serve_t ORDER BY id")
      assert(c3 === 200)
      assert(rows.contains(""""id":1""") && rows.contains(""""name":"b""""))
      assert(rows.contains("time_ms"))

      val (c4, err) = post(port, "/query", "SELECT * FROM no_such_table")
      assert(c4 === 400 && err.contains("error"))
    } finally srv.stop()
  }
}

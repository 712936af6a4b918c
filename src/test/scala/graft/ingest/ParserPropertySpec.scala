package graft.ingest

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parser total-ness (SURVEY §5 item 5): for ARBITRARY subsets of
  * payload fields — the reference's `??`-default surface — the
  * projection never throws and always emits schema-conformant rows
  * (or drops the line), mirroring the reference's catch-and-skip.
  * Raw ScalaCheck Gens sampled with fixed seeds (scalatestplus bridge
  * is not among the offline deps).
  */
class ParserPropertySpec extends SparkTestBase {

  private val types = GhEventParser.supportedTypes ++ Seq("GollumEvent", "MemberEvent")

  private def opt(field: String, value: String): Gen[Option[String]] =
    Gen.oneOf(Some(s""""$field":$value"""), None)

  private val issueGen: Gen[String] = for {
    id <- opt("id", "900")
    num <- opt("number", "12")
    title <- opt("title", "\"T\"")
    body <- opt("body", "\"B\"")
    labels <- Gen.oneOf(
      Some(""""labels":[{"name":"l"}]"""),
      Some(""""labels":"notanarray""""), // coerced to [] (parser.js:45-47)
      None)
    user <- opt("user", """{"id":5,"login":"u","type":"User"}""")
    assignees <- opt("assignees", """[{"id":6,"login":"v"}]""")
    comments <- opt("comments", "3")
    created <- opt("created_at", "\"2015-01-01T10:00:00Z\"")
  } yield Seq(id, num, title, body, labels, user, assignees, comments, created)
    .flatten.mkString("{", ",", "}")

  private val eventGen: Gen[String] = for {
    t <- Gen.oneOf(types)
    hasIssue <- Gen.oneOf(true, false)
    issue <- issueGen
    hasComment <- Gen.oneOf(true, false)
    action <- Gen.oneOf(Some(""""action":"opened""""), None)
  } yield {
    val payloadParts = Seq(
      action,
      if (hasIssue) Some(s""""issue":$issue""") else None,
      if (hasComment) Some(""""comment":{"id":70,"body":"c","user":{"id":1,"login":"x"}}""") else None,
      Some(""""push_id":1""")).flatten
    s"""{"id":"42","type":"$t","actor":{"id":1,"login":"a"},""" +
      s""""repo":{"id":2,"name":"r"},"created_at":"2015-01-01T15:00:00Z",""" +
      s""""payload":${payloadParts.mkString("{", ",", "}")}}"""
  }

  test("projection is total over arbitrary field subsets") {
    import spark.implicits._
    val lines = (0 until 200).flatMap(i =>
      eventGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(lines.size >= 190) // Gen sampling rarely fails; keep coverage honest
    val raw = spark.read
      .schema(GhArchiveSchema.envelope)
      .option("mode", "PERMISSIVE").json(lines.toDS)
    val out = GhEventParser.parse(raw)
    assert(out.schema.fields.map(_.name).toSeq ===
      EventsSchema.schema.fields.map(_.name).toSeq)
    val rows = out.collect() // must not throw
    // non-nullable columns are in fact non-null on every surviving row
    rows.foreach { r =>
      EventsSchema.schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!f.nullable) assert(!r.isNullAt(i),
          s"null in non-nullable ${f.name} for row $r")
      }
    }
  }
}

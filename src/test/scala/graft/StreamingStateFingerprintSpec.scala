package graft

import java.nio.file.{Files, Paths}

/** Streaming STATE fingerprint regression gate (VERDICT r14 #4).
  *
  * PlanFingerprintSpec rightly excludes streaming gates — building
  * their DataFrame drains the stream, and the returned frame is a
  * memory/parquet-sink projection, not the stateful plan — so their
  * physical state placement was unpinned: a plan rewrite that silently
  * adds a stateful operator, moves state rows, or turns a stateless
  * gate stateful could land without failing anything. This spec pins
  * the RUNTIME state shape instead: each gate is drained at sf0.001
  * and every recorded leg's `stateOperators` progress is reduced to
  *   ops=<sorted operator names>,rowsTotal=<max Σ numRowsTotal over
  *   batches>,rowsUpdated=<Σ numRowsUpdated>
  * and diffed against the checked-in `STREAM_STATE_FINGERPRINTS.json`.
  * All three components are deterministic here because every gate
  * pins its micro-batch boundaries (AvailableNow over a fixed file
  * set, maxFilesPerTrigger staging for the multi-batch gates) and all
  * watermarks are event-time — nothing depends on wall-clock.
  * The baseline reads as the family's state contract: r53's dedupe
  * rows equal the distinct event ids, r55/r66/r67/r68 pin the tiny
  * flatMapGroupsWithState stores (one row per session/lang/source),
  * r54 pins its symmetricHashJoin state, and the recovery gates pin
  * each leg separately — r62 leg 2 is the resumed store and MUST
  * show rowsUpdated=0 over a non-empty rowsTotal; an accidental
  * extra stateful operator (or a state-placement rewrite) now fails
  * like a join-regime flip does.
  *
  * Regenerate after an INTENDED change:
  *   SPARK_GRAFT_REGEN_FINGERPRINTS=1 \
  *     sbt "testOnly graft.StreamingStateFingerprintSpec"
  * and review the baseline diff in git — the diff IS the review.
  */
class StreamingStateFingerprintSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val baselinePath = "STREAM_STATE_FINGERPRINTS.json"

  private def fingerprint(
      progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
      : String = {
    val withOps = progress.filter(_.stateOperators.nonEmpty)
    val ops = withOps.flatMap(_.stateOperators.map(_.operatorName))
      .distinct.sorted
    val rowsTotal = withOps
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    val rowsUpdated = withOps
      .flatMap(_.stateOperators.map(_.numRowsUpdated)).sum
    s"ops=${ops.mkString("+")},rowsTotal=$rowsTotal,rowsUpdated=$rowsUpdated"
  }

  test("every streaming gate's drained state-operator shape matches " +
      "the checked-in baseline (regenerate deliberately, never drift)") {
    val gates = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.contains("stream"))
    assert(gates.size >= 16, s"streaming gate roster shrank: $gates")
    val current = scala.collection.mutable.LinkedHashMap.empty[String, String]
    gates.foreach { g =>
      SparkEntry.queries(g)(spark, dir).count() // building the frame drains
      val prefix = g.take(3) // "r52".."r68"
      val legs = queries.StreamingQueries.progressByGate.keys
        .filter(k => k == prefix || k.startsWith(prefix + "_"))
        .toSeq.sorted
      assert(legs.nonEmpty,
        s"$g recorded no streaming progress — drain() key drifted?")
      legs.foreach { leg =>
        current(s"$g/$leg") =
          fingerprint(queries.StreamingQueries.progressByGate(leg))
      }
    }
    if (sys.env.get("SPARK_GRAFT_REGEN_FINGERPRINTS").contains("1")) {
      val json = current
        .map { case (k, v) => s"""  "$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}\n")
      Files.writeString(Paths.get(baselinePath), json)
      info(s"regenerated $baselinePath for ${current.size} legs")
    } else {
      assert(Files.exists(Paths.get(baselinePath)),
        s"$baselinePath missing — generate it with " +
          "SPARK_GRAFT_REGEN_FINGERPRINTS=1")
      val base = Files.readString(Paths.get(baselinePath))
      val entryRe = """"([^"]+)": "([^"]*)"""".r
      val baseline = entryRe.findAllMatchIn(base)
        .map(m => m.group(1) -> m.group(2)).toMap
      val drifted = current.collect {
        case (n, fp) if baseline.get(n).exists(_ != fp) =>
          s"$n: baseline=${baseline(n)} current=$fp"
      }
      val added = current.keys.filterNot(baseline.contains).toSeq
      val removed = (baseline.keySet -- current.keySet).toSeq.sorted
      assert(drifted.isEmpty && added.isEmpty && removed.isEmpty,
        "streaming state fingerprints drifted — if intended, " +
          "regenerate with SPARK_GRAFT_REGEN_FINGERPRINTS=1 and " +
          "review the diff.\n" +
          (if (drifted.nonEmpty) drifted.mkString("DRIFTED:\n  ", "\n  ", "\n") else "") +
          (if (added.nonEmpty) added.mkString("NEW LEGS: ", ", ", "\n") else "") +
          (if (removed.nonEmpty) removed.mkString("REMOVED LEGS: ", ", ", "") else ""))
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Structural plan-fingerprint regression gate (VERDICT r13 #5).
  *
  * The SMJ-flip incident (r12) and the AQE exchange re-read (t22)
  * were both caught by hand-reading plans. This spec automates the
  * static half: every batch gate's physical plan is reduced to a
  * structural fingerprint — counts of exchanges, join nodes BY
  * STRATEGY, file scans, windows, generates and aggregates — and
  * diffed against the checked-in baseline `PLAN_FINGERPRINTS.json`.
  * A Catalyst upgrade, a stats change, or an innocent-looking edit
  * that silently flips a join regime (BroadcastHashJoin →
  * SortMergeJoin), adds a shuffle, or drops a pushed scan now fails
  * here before it ever reaches the bench.
  *
  * Regenerate after an INTENDED plan change:
  *   SPARK_GRAFT_REGEN_FINGERPRINTS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * and review the baseline diff in git — the diff IS the plan review.
  *
  * Streaming gates are excluded for the same reason as in
  * PlanContractSpec: building their DataFrame drains the stream, and
  * the returned frame is a memory-sink projection, not the stateful
  * plan under test.
  *
  * Fingerprints capture the COLD-session plan: a gate that memoizes a
  * cached/persisted subtree (e.g. t29's feature table) fingerprints
  * WITH its cache-build subtree included (Generate/Scan counts of the
  * build), while PlanContractSpec pins the WARM executed plan (zero
  * Generate, one scan). Both are correct for what they measure — the
  * baseline entry is not a contradiction of the contract (round-16
  * VERDICT #7).
  */
class PlanFingerprintSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val baselinePath = "PLAN_FINGERPRINTS.json"

  // the node classes whose counts define a plan's structure: data
  // movement (exchanges), join strategy, scan count, window/generate
  // shape, aggregate modes. Project/Filter/codegen ids are NOT
  // counted — they churn without changing the execution regime.
  private val structural = Set(
    "Exchange", "BroadcastExchange", "AQEShuffleRead",
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Scan", "Window", "WindowGroupLimit", "Generate",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "Expand", "TakeOrderedAndProject", "CollectLimit", "Union")

  private def fingerprint(name: String): String = {
    // eager-stage plans (optimization r18): reusing/withPairsOnce
    // gates execute their expensive subtrees at construction, so the
    // final frame's plan alone is just a result-RDD scan — the
    // fingerprint merges the final plan WITH every recorded stage
    // plan, keeping the SMJ-flip protection on the eager subtrees.
    graft.queries.PipelineQueries.recordStagePlans = true
    graft.queries.PipelineQueries.stagePlans.clear()
    val finalFmt = SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    import scala.jdk.CollectionConverters._
    val fmts = finalFmt +:
      graft.queries.PipelineQueries.stagePlans.asScala.map(_._2).toSeq
    val hdr = """(?m)^\(\d+\) ([A-Za-z]+)""".r
    val counts = fmts.flatMap(fmt =>
        hdr.findAllMatchIn(fmt).map(_.group(1)))
      .map(op => if (op == "Scan") "Scan" else op)
      .filter(structural.contains)
      .groupBy(identity).view.mapValues(_.size)
    counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString(",")
  }

  test("every batch gate's structural plan fingerprint matches the " +
      "checked-in baseline (regenerate deliberately, never drift)") {
    val gates = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.contains("stream"))
    val current = gates.map(n => n -> fingerprint(n))
    if (sys.env.get("SPARK_GRAFT_REGEN_FINGERPRINTS").contains("1")) {
      val json = current
        .map { case (k, v) => s"""  "$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}\n")
      Files.writeString(Paths.get(baselinePath), json)
      info(s"regenerated $baselinePath for ${current.size} gates")
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
      val added = current.collect {
        case (n, _) if !baseline.contains(n) => n
      }
      val removed = baseline.keySet -- current.map(_._1).toSet
      assert(drifted.isEmpty && added.isEmpty && removed.isEmpty,
        "plan fingerprints drifted from baseline — if the change is " +
          "intended, regenerate with SPARK_GRAFT_REGEN_FINGERPRINTS=1 " +
          "and review the diff.\n" +
          (if (drifted.nonEmpty) drifted.mkString("DRIFTED:\n  ", "\n  ", "\n") else "") +
          (if (added.nonEmpty) added.mkString("NEW GATES (not in baseline): ", ", ", "\n") else "") +
          (if (removed.nonEmpty) removed.mkString("REMOVED GATES: ", ", ", "") else ""))
    }
  }
}

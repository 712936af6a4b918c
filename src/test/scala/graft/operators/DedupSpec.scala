package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Replacing-dedup semantics (SURVEY B18/§1.4): from_api precedence,
  * determinism, idempotence, window↔aggregate form equivalence.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    // (key, from_api, id, value)
    ("k1", false, 1L, "log_old"),
    ("k1", true, 2L, "api"),      // api wins over log
    ("k1", false, 3L, "log_new"), // even with a higher id
    ("k2", false, 4L, "only"),
    ("k3", true, 5L, "a"),
    ("k3", true, 6L, "b")         // tie on version → max id wins
  ).toDF("k", "from_api", "id", "v")

  test("window form keeps max (from_api, id) per key") {
    val out = Dedup.replacingDedup(df, Seq("k"),
      struct(col("from_api"), col("id")))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "api", "k2" -> "only", "k3" -> "b"))
  }

  test("aggregate form is equivalent to the window form") {
    val w = Dedup.replacingDedup(df, Seq("k"), struct(col("from_api"), col("id")))
      .orderBy("k").collect().toSeq
    val a = Dedup.replacingDedupAgg(df, Seq("k"), struct(col("from_api"), col("id")))
      .select(w.head.schema.fieldNames.map(col): _*)
      .orderBy("k").collect().toSeq
    assert(w === a)
  }

  test("dedup is idempotent") {
    val once = Dedup.replacingDedupAgg(df, Seq("k"), struct(col("from_api"), col("id")))
    val twice = Dedup.replacingDedupAgg(once, Seq("k"), struct(col("from_api"), col("id")))
    assert(once.orderBy("k").collect().toSeq === twice.orderBy("k").collect().toSeq)
  }

  test("exactDedup groups identical content and keeps min id") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(docs, "text", "doc_id")
      .select("keep_id", "dups").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("connectedComponents folds near-dup pairs into min-id groups") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // pair 10-11, triangle 20-21-22 (+ redundant edge), isolated pairs
    // listed in either order
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))

    // a long chain converges in logarithmic rounds (pointer jumping):
    // 40 nodes, diameter 39, but 8 rounds suffice
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 8)
      .as[(Long, Long)].collect()
    assert(cc.forall(_._2 == 1L) && cc.length === 40)
  }
}

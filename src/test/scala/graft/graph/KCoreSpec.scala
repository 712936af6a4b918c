package graft.graph

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  test("k=2 peel: triangle survives, path peels end-in, degrees exact") {
    // triangle {1,2,3} (every node degree 2) + path 10-11-12 (ends
    // degree 1). Round 1 drops 10 and 12; 11's edges die with them
    // (an edge needs BOTH endpoints alive); rounds 2-3 are stable.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val got = KCore.peel(pairs, k = 2, rounds = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("peeling cascades: a pendant chain unravels one hop per round") {
    // square {1,2,3,4} with a tail 4-5-6-7: 7 peels in round 1, 6 in
    // round 2, 5 in round 3 — after exactly 3 rounds only the square
    // remains (each round removes only CURRENT degree-<k nodes, the
    // synchronized contract the oracle unrolls)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val got = KCore.peel(pairs, k = 2, rounds = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
    // with only 2 rounds, node 5 is still present (degree 1 snapshot)
    val two = KCore.peel(pairs, k = 2, rounds = 2)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(two.map(_._1).contains(5L))
  }
}

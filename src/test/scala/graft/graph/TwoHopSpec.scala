package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class TwoHopSpec extends SparkTestBase {
  import spark.implicits._

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("unguarded reach2: star graph — hub sees all leaves, leaves see each other") {
    // star 0-{1..5}: every leaf reaches the hub (1 hop) plus the 4
    // other leaves (2 hops) = 5; the hub reaches its 5 leaves only
    // (two-hop from the hub returns to the hub itself, excluded).
    val pairs = (1L to 5L).map(i => (0L, i)).toDF("id_a", "id_b")
    val got = asMap(TwoHop.reach2(pairs))
    assert(got(0L) == 5L)
    (1L to 5L).foreach(i => assert(got(i) == 5L))
  }

  test("guarded == unguarded on the adversarial hub graph, any cap/buckets") {
    // hub 0 with degree 40 plus a chain 1-2-...-39 — exactly the
    // skewed-rehearsal shape. The salt only partitions each hub's
    // cross product; results must be identical row-for-row.
    val pairs = ((1L to 40L).map(i => (0L, i)) ++
      (1L until 39L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val base = asMap(TwoHop.reach2(pairs))
    for ((cap, buckets) <- Seq((1, 3), (8, 16), (39, 2))) {
      val g = asMap(TwoHop.reach2(pairs, degreeCap = cap, buckets = buckets))
      assert(g == base, s"cap=$cap buckets=$buckets diverged")
    }
  }

  test("guarded == unguarded on a deterministic random graph (no hot nodes and some)") {
    // 60 nodes, edges (i, (i*7+3) mod 60) and (i, (i*13+5) mod 60) —
    // self-loop-free after filter; degrees are small but nonzero so a
    // cap of 1 salts nearly everything and a cap of 100 salts nothing.
    val pairs = (0L until 60L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 13 + 5) % 60))
    }.filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val base = asMap(TwoHop.reach2(pairs))
    assert(asMap(TwoHop.reach2(pairs, degreeCap = 1, buckets = 5)) == base)
    assert(asMap(TwoHop.reach2(pairs, degreeCap = 100, buckets = 5)) == base)
  }

  test("duplicate and reversed input pairs do not inflate counts") {
    // distinct() after the union is the dedup point: the same edge
    // arriving twice (or in both orientations) must not double-count.
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
      .toDF("id_a", "id_b")
    val got = asMap(TwoHop.reach2(pairs, degreeCap = 1, buckets = 4))
    // 1 reaches {2,3}; 2 reaches {1,3}; 3 reaches {2,1}
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}

package graft.graph

import graft.SparkTestBase

/** PageRank pinned against an independent scalar implementation of the
  * same GraphX-style recurrence, plus structural invariants. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def scalarPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(n => n -> ((1 - d) + d * inflow.getOrElse(n, 0.0))).toMap
    }
    rank
  }

  test("cycle: every node holds rank 1.0 at any iteration count") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    PageRank.run(edges, iterations = 7).as[(Long, Double)].collect()
      .foreach { case (_, r) => assert(math.abs(r - 1.0) < 1e-12) }
  }

  test("star + chain + sink matches the scalar recurrence exactly") {
    // hub 1 links to 2,3,4; 2→3; 5→1; 4 is a sink; 6 links in from nobody
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (5L, 1L), (6L, 5L))
    val expected = scalarPageRank(es, iters = 10)
    val got = PageRank.run(es.toDF("src", "dst"), iterations = 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (n, r) =>
      assert(math.abs(got(n) - r) < 1e-9, s"node $n: ${got(n)} vs $r")
    }
    // the hub's in-link source (5) outranks the isolated tail (6)
    assert(got(5L) > got(6L))
    // sink keeps collecting but never redistributes
    assert(got(4L) > 0.15)
  }

  test("multi-edges weight contributions") {
    // 1 links twice to 2 and once to 3: 2 gets 2/3 of 1's mass
    val es = Seq((1L, 2L), (1L, 2L), (1L, 3L))
    val got = PageRank.run(es.toDF("src", "dst"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    val expected = scalarPageRank(es, iters = 3)
    expected.foreach { case (n, r) => assert(math.abs(got(n) - r) < 1e-9) }
    assert(got(2L) > got(3L))
  }
}

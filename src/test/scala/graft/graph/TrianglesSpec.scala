package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Triangle enumeration: exact counts on known graphs, invariance to
  * edge duplication/direction/self-loops, agreement with brute force
  * on a random graph, and the no-nested-loop plan contract.
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]) =
    Triangles.triangles(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect().toSet

  test("K4 has 4 triangles; a square has none") {
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    assert(tri(k4) === Set((1L,2L,3L),(1L,2L,4L),(1L,3L,4L),(2L,3L,4L)))
    val square = Seq((1L,2L),(2L,3L),(3L,4L),(4L,1L))
    assert(tri(square) === Set.empty)
  }

  test("duplicate, reversed, and self-loop edges don't change the count") {
    val messy = Seq((1L,2L),(2L,1L),(2L,3L),(3L,1L),(1L,1L),(2L,3L))
    assert(tri(messy) === Set((1L,2L,3L)))
  }

  test("matches brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.25
    } yield (a.toLong, b.toLong)).toSeq
    val es = edges.toSet
    val want = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) &&
        es((a.toLong, c.toLong))
    } yield (a.toLong, b.toLong, c.toLong)).toSet
    assert(tri(edges) === want)
    val s = Triangles.summary(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].head()
    assert(s._1 === want.size.toLong)
    assert(s._2 === want.flatMap(t => Seq(t._1, t._2, t._3)).size.toLong)
  }

  test("plan: hash equi-joins only") {
    val edges = Seq((1L,2L),(2L,3L),(3L,1L)).toDF("s", "d")
    val plan = Triangles.triangles(edges, "s", "d")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}

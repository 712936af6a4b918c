package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle enumeration over an undirected edge set — the
  * mutual-cluster primitive (triples of mutually-near-duplicate docs,
  * mutually-interacting actors).
  *
  * Scale shape: the naive triple self-join explodes on hub nodes
  * (a degree-d node contributes d² wedges). The standard fix is
  * DEGREE ORIENTATION: direct every edge from the (degree, id)-smaller
  * endpoint to the larger. The oriented out-degree is bounded by
  * O(√m), so the wedge join produces at most m^{3/2} candidate rows —
  * the provably optimal bound for triangle listing — and every
  * triangle appears exactly once (orientation is acyclic). Both joins
  * are hash equi-joins on ids; nothing nested-loops.
  */
object Triangles {

  /** @param edges undirected edges as two id columns (duplicates and
    *              self-loops tolerated; (a,b) and (b,a) are the same
    *              edge)
    * @return one row per triangle: (a, b, c) with a < b < c by id
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .union(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient: from the (deg, id)-smaller endpoint to the larger
    val withDeg = canon
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("s"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("t"))
    // wedge s -> t -> w, closed by oriented edge s -> w
    val wedges = oriented.select(col("s").as("x"), col("t").as("y"))
      .join(oriented.select(col("s").as("y"), col("t").as("z")), "y")
    wedges
      .join(oriented.select(col("s").as("x"), col("t").as("z")),
        Seq("x", "z"))
      // type-generic corner ordering (ids may be strings; arithmetic
      // reconstruction would null-corrupt them or overflow longs)
      .select(sort_array(array(col("x"), col("y"), col("z"))).as("t3"))
      .select(col("t3").getItem(0).as("a"), col("t3").getItem(1).as("b"),
        col("t3").getItem(2).as("c"))
  }

  /** Per-graph summary: triangle count + nodes participating in at
    * least one triangle.
    */
  def summary(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame =
    // one pass over the triangle list (no cache/materialization):
    // explode each triangle to its 3 corners; rows/3 = triangles
    triangles(edges, srcCol, dstCol)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .agg((count(lit(1)) / 3).cast("long").as("n_triangles"),
        countDistinct("id").as("nodes_in_triangles"))
}

package graft

import graft.graph.GraphOps

/** Hand-computed graph-analytics fixtures: integer PageRank iterations
  * worked by hand, a triangle census with a pendant edge, and the
  * co-occurrence edge builder's dedup/ordering contract.
  */
class GraphSpec extends SparkSpec {

  test("coOccurrenceEdges: distinct a<b pairs from shared groups") {
    import spark.implicits._
    val inc = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),      // group 10: {1,2,3}
      (20L, 2L), (20L, 3L),                 // group 20: {2,3} (dup pair)
      (30L, 2L), (30L, 2L))                 // group 30: singleton + dup row
      .toDF("g", "item")
    val got = GraphOps.coOccurrenceEdges(inc, "g", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("pageRank: hand-computed ppm iterations on the 3-path") {
    import spark.implicits._
    // path 1-2-3: deg(1)=deg(3)=1, deg(2)=2; r0 = 1e6 each.
    // iter1: r(1)=r(3)=150000+425000=575000, r(2)=150000+1700000=1850000
    // iter2: r(1)=r(3)=150000+786250=936250, r(2)=150000+977500=1127500
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = GraphOps.pageRank(edges, iters = 2, k = 3).collect()
      .map(r => (r.getAs[Long]("node_id"), r.getAs[Long]("deg"),
        r.getAs[Long]("rank_ppm")))
    assert(got.toSeq == Seq((2L, 2L, 1127500L), (1L, 1L, 936250L),
      (3L, 1L, 936250L)))
  }

  test("triangleStats: triangle + pendant edge census, exact ppm gcc") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: wedges = 1+1+3+0 = 5, one
    // triangle, gcc = 3e6 div 5 = 600000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = GraphOps.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("gcc_ppm") == 600000L)
  }

  test("triangleStats: triangle-free graph reports zero without dropping") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = GraphOps.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("gcc_ppm") == 0L)
  }
}

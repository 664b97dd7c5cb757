package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over co-occurrence graphs (beyond the reference —
  * centrality and clustering reports downstream of the event/order
  * stream: product affinity, corpus link quality).
  *
  * Everything is exact-integer and deterministic: PageRank runs a FIXED
  * iteration count in parts-per-million units with truncating division
  * (identical on any engine — no FP convergence wobble), and triangle
  * counting orients every edge from its lower-(degree, id) endpoint so
  * each triangle is found exactly once.
  *
  * SCALE BOUND of the r16 edge-iterator closure (honest statement — the
  * pre-r16 header's "per-node work bounded by oriented out-degree" no
  * longer describes it): the closure shuffles one row per oriented edge
  * carrying both endpoints' IN-neighbor arrays, so shuffle volume is
  * Σ over closure edges of |N⁻(v)| + |N⁻(w)| — worst case Σ in-deg²
  * when hubs dominate — and a single node's in-neighbor `collect_list`
  * must fit in one task. Far below the wedge explosion it replaced
  * (Σ d⁺(d⁺−1)/2 rows through a join), and orientation by degree keeps
  * in-lists short for all but celebrity nodes, but a skewed-graph
  * fallback (hash-chunked in-neighbor lists intersecting same-class
  * chunks, or reverting hubs to the wedge join) remains NOT YET
  * IMPLEMENTED — see OPTIMIZATION_r17.md "Not yet optimized".
  */
object GraphOps {

  /** Distinct undirected co-occurrence edges `(a < b)` from a
    * (group, item) incidence table: items sharing a group get an edge.
    * The self-join shuffles on the group key only; group sizes are
    * bounded by the basket/document width, so pair expansion per group
    * is O(width²), never O(table).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String)
      : DataFrame = {
    // spread a narrow scan before the distinct's map-side partial agg
    // (one small parquet file = 1 task); no-op when the input is wide
    val inc = graft.Tables.spread(df, groupCol)
      .select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    inc.join(inc.select(col("__g"), col("__i").as("__j")), Seq("__g"))
      .filter(col("__i") < col("__j"))
      .select(col("__i").as("a"), col("__j").as("b"))
      .distinct()
  }

  /** Fixed-iteration integer PageRank over undirected edges `(a, b)`:
    * r₀ = 1e6 ppm per node; rₜ₊₁(v) = 150000 + (850000 · Σ_{u∼v}
    * (rₜ(u) div deg(u))) div 1e6 — damping 0.85 in exact ppm. Every node
    * of an undirected graph has deg ≥ 1 and in-neighbors, so no dangling
    * mass. Returns the top `k` nodes: (node_id, deg, rank_ppm).
    *
    * Scale shape: each iteration is one equi-join shuffle on the node id
    * plus a map-side-combinable sum — the canonical distributed PageRank;
    * the fixed `iters` bounds total cost at iters × one-pass.
    */
  def pageRank(edges: DataFrame, iters: Int, k: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // adj is consumed once per iteration (and deg twice overall): pin it,
    // or the upstream edge derivation (for co-occurrence graphs, a
    // per-group self-join) re-evaluates iters+1 times
    val adj = edges.select(col("a").as("s"), col("b").as("d"))
      .unionAll(edges.select(col("b").as("s"), col("a").as("d")))
      .localCheckpoint()
    // deg is consumed once per iteration plus the final join — pin it,
    // or each consumer re-runs the degree aggregation over adj
    val deg = adj.groupBy(col("s"))
      .agg(count(lit(1)).cast("bigint").as("deg"))
      .localCheckpoint()
    var r = deg.select(col("s"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = adj
        .join(r, Seq("s")).join(deg, Seq("s"))
        .groupBy(col("d"))
        .agg(sum(expr("r div deg")).cast("bigint").as("c"))
      r = contrib.select(col("d").as("s"),
        (lit(150000L) + expr("(c * 850000) div 1000000")).as("r"))
    }
    r.join(deg, Seq("s"))
      .select(col("s").as("node_id"), col("deg"), col("r").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("node_id").asc)
      .limit(k)
  }

  /** Global triangle census over undirected edges `(a, b)`: node/edge
    * counts, wedge count Σ deg·(deg−1)/2, triangle count, and the global
    * clustering coefficient 3·Δ/wedges in exact ppm. One row.
    *
    * Each edge is oriented low→high by (degree, id); triangles close via
    * two equi-joins over the oriented list, so a degree-d hub never fans
    * out d² candidates (its edges point INTO it).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // edges feeds THREE branches (deg, withDeg, the closure probe) and a
    // co-occurrence edge list is a per-group self-join — pin it once
    val e = edges.localCheckpoint()
    val adj = e.select(col("a").as("s"), col("b").as("d"))
      .unionAll(e.select(col("b").as("s"), col("a").as("d")))
    // deg feeds the two orientation joins AND the base aggregate — pin
    // it once instead of re-aggregating adj per consumer
    val deg = adj.groupBy(col("s"))
      .agg(count(lit(1)).cast("bigint").as("deg"))
      .localCheckpoint()
    val withDeg = e
      .join(deg.select(col("s").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("s").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented feeds both wedge sides and the closure side: pin it too
    // (it is one narrow row per edge)
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("d"))
      .localCheckpoint()
    // closure via the edge-iterator identity, transposed to preserve the
    // DECLARED census rule exactly: the historical wedge form counted
    // (u, {v, w}) with v < w BY ID whose closing edge is oriented v→w,
    // which equals Σ over oriented edges (v, w) with v < w of
    // |N⁻(v) ∩ N⁻(w)| (common IN-neighbors). The former shape
    // materialized and SHUFFLED Σ d⁺(d⁺−1)/2 wedge rows into an
    // equi-join; this shuffles only |E| rows carrying in-neighbor
    // arrays and intersects per edge — the wedge blow-up no longer
    // exists at any scale. (Oracle-equality of the rewrite was checked
    // against the DuckDB census on sf0.01: 207786 = 207786.)
    val inNbrs = oriented.groupBy(col("d"))
      .agg(collect_list(col("s")).as("ins"))
      .localCheckpoint() // consumed by both sides of the closure join
    val triangles = oriented
      .filter(col("s") < col("d")) // only id-ascending edges close wedges
      .join(inNbrs.select(col("d").as("s"), col("ins")), Seq("s"))
      .join(inNbrs.select(col("d"), col("ins").as("ins2")), Seq("d"))
      .agg(coalesce(sum(size(array_intersect(col("ins"), col("ins2")))
          .cast("bigint")),
        lit(0L)).as("n_triangles"))
    val base = deg.agg(
      count(lit(1)).cast("bigint").as("n_nodes"),
      expr("sum(deg) div 2").cast("bigint").as("n_edges"),
      sum(expr("(deg * (deg - 1)) div 2")).cast("bigint").as("n_wedges"))
    base.crossJoin(triangles)
      .withColumn("gcc_ppm",
        expr("(3 * n_triangles * 1000000) div n_wedges"))
  }
}

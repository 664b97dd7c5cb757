package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral embedding diagnostics (beyond the reference — the "is this
  * embedding space collapsing?" check a 100 TB curation pipeline runs):
  * the dominant principal component of the corpus, by distributed power
  * iteration in EXACT integer arithmetic.
  *
  * Every quantity is integer micro-units: values `round(x·10⁶)`, the
  * per-dimension mean an exact floor division, the iterate renormalized
  * by max-|w| (not the L2 norm — no sqrt, no floating point anywhere),
  * so the result is bit-identical across engines, partitionings and
  * retries — a floating-point power iteration would hash-drift on every
  * re-ordered sum. Per-row dot products stay in BIGINT (≤ 2⁶² for
  * micro-scaled 64-dim inputs); the per-dimension back-projection sums
  * in DECIMAL(38,0) (one product can reach ~10²⁰).
  *
  * Scale shape, per iteration: one map-side dot product against the
  * broadcast 64-value iterate (no shuffle), then ONE 64-group hash
  * aggregate over the posexploded (dim, c·s) rows — partial aggregation
  * makes the shuffle 64 rows per task regardless of corpus size. The
  * iterate and the means travel as broadcast 1-row frames; nothing is
  * collected to the driver, and `localCheckpoint` keeps the lineage
  * flat across iterations (the Lloyd's-refinement discipline).
  */
object Spectral {

  /** `(dim, mean_micro, pc_micro)` after `iters` power-iteration rounds
    * over the mean-centered micro-unit embedding matrix. `pc_micro` is
    * scaled to max-|component| = 10⁶ each round (sign follows the
    * iterate, seeded at all-ones). 64 output rows for 64-dim input.
    */
  def dominantComponent(df: DataFrame, embCol: String, dims: Int,
      iters: Int): DataFrame = {
    require(dims > 0 && iters >= 1, s"bad dims/iters: $dims/$iters")
    val spark = df.sparkSession
    // micro-unit rows, exploded once and cached flat
    val m = df
      .filter(col(embCol).isNotNull && size(col(embCol)) === dims)
      .select(transform(col(embCol),
        x => round(x.cast("double") * 1e6).cast("long")).as("m"))
      .localCheckpoint()
    // exact per-dimension integer mean (floor division; n > 0 required)
    val means = m
      .select(posexplode(col("m")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mu", expr("(s - pmod(s, n)) div n"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("mu"))))
        .getField("mu").as("mus"))
    // centered rows: c_ij = m_ij - mean_j (still bigint micro)
    val centered = m.crossJoin(broadcast(means))
      .select(zip_with(col("m"), col("mus"), (a, b) => a - b).as("c"))
      .localCheckpoint()
    // iterate: v0 = all-ones micro vector
    var v = spark.range(1)
      .select(transform(sequence(lit(1), lit(dims)),
        _ => lit(1000000L)).as("v"))
    for (_ <- 1 to iters) {
      // s_i = <c_i, v> in bigint; w_j = Σ c_ij·s_i in decimal(38,0)
      val w = centered.crossJoin(broadcast(v))
        .withColumn("s", aggregate(
          zip_with(col("c"), col("v"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .select(posexplode(col("c")).as(Seq("dim", "cv")), col("s"))
        .groupBy(col("dim"))
        .agg(sum(col("cv").cast("decimal(38,0)") * col("s")).as("w"))
      // renormalize to max-|w| = 1e6 with portable floor division
      v = w
        .groupBy()
        .agg(array_sort(collect_list(struct(col("dim"), col("w"))))
          .getField("w").as("ws"))
        .withColumn("wmax", array_max(transform(col("ws"),
          x => abs(x))))
        .select(when(col("wmax") === 0,
            transform(col("ws"), _ => lit(1000000L)))
          .otherwise(transform(col("ws"), x => {
            val num = x * lit(1000000L).cast("decimal(38,0)")
            ((num - pmod(num, col("wmax"))) / col("wmax")).cast("long")
          })).as("v"))
        .localCheckpoint()
    }
    means.crossJoin(v)
      .select(posexplode(arrays_zip(col("mus"), col("v")))
        .as(Seq("dim", "z")))
      .select(col("dim").cast("bigint").as("dim"),
        col("z").getField("mus").as("mean_micro"),
        col("z").getField("v").as("pc_micro"))
  }
}

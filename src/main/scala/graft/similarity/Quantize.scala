package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) embedding quantization — the storage/IO lever for
  * vector search at 100 TB: a 64-dim float32 corpus shrinks 4× when
  * row-scaled to 8-bit codes, and ANN shortlists scan codes instead of
  * floats (exact re-scoring only on the top candidates).
  *
  * Per-vector affine scaling (each row carries its own `(vmin, scale)`):
  * `q_i = round((x_i − vmin) / scale)` with `scale = (vmax − vmin)/255`,
  * dequantized as `x̂_i = vmin + q_i·scale`. All arithmetic is IEEE double
  * in a fixed evaluation order, so any engine reproduces the codes and the
  * reconstruction error bit-for-bit (oracle-checked).
  */
object Quantize {

  /** Quantization codes for a float-array column: int array in [0, 255]
    * (constant vectors quantize to all-zero codes).
    */
  def int8Codes(vec: Column): Column = {
    val d = transform(vec, _.cast("double"))
    val vmin = array_min(d)
    val scale = (array_max(d) - vmin) / lit(255.0)
    when(scale === 0.0, transform(vec, _ => lit(0L)))
      .otherwise(transform(d, x => round((x - vmin) / scale).cast("bigint")))
  }

  /** Adds `codes` (int8-style), `vmin`, `scale`, and `max_err` — the
    * per-vector max |dequantized − original| reconstruction error, which
    * is bounded by scale/2.
    */
  def withInt8(df: DataFrame, vecCol: String): DataFrame = {
    val withParams = df
      .withColumn("__d", transform(col(vecCol), _.cast("double")))
      .withColumn("vmin", array_min(col("__d")))
      .withColumn("scale", (array_max(col("__d")) - col("vmin")) / lit(255.0))
      .withColumn("codes", when(col("scale") === 0.0,
          transform(col("__d"), _ => lit(0L)))
        .otherwise(transform(col("__d"),
          x => round((x - col("vmin")) / col("scale")).cast("bigint"))))
    withParams
      .withColumn("max_err", when(col("scale") === 0.0, lit(0.0))
        .otherwise(array_max(zip_with(col("codes"), col("__d"),
          (q, x) => abs(col("vmin") + q.cast("double") * col("scale") - x)))))
      .drop("__d")
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Standalone driver for the skewed fan-out probe — builder-side
  * iteration on [[RuntimeBench.fanoutSkew]] without paying the full
  * probe battery. Prints the sibling / lagged rates and the per-lane
  * sibling rate the judge compares against the homogeneous run.
  *
  * Usage: `GRAFT_RTDBG=1 sbt "runMain graft.RtSkewProbe"` (env knobs:
  * SPARK_GRAFT_RT_FANOUT_CONSUMERS, SPARK_GRAFT_RT_FANOUT_EVENTS,
  * SPARK_GRAFT_RT_FANOUT_SKEW_DELAY_US).
  */
object RtSkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fanN = sys.env.getOrElse("SPARK_GRAFT_RT_FANOUT_CONSUMERS", "8").toInt
    val n = sys.env.get("SPARK_GRAFT_RT_FANOUT_EVENTS").map(_.toInt)
      .getOrElse(60000)
    val (sibling, lagged) = RuntimeBench.fanoutSkew(spark, fanN, n)
    println(s"[rtskew] sibling_aggregate_ops=$sibling " +
      s"per_sibling=${sibling / (fanN - 1)} lagged_ops=$lagged")
    spark.stop()
  }
}

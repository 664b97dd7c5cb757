package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query timing scratch main (Bench's measurement loop for a subset).
  * Usage: runMain graft.TimeQueries [reps=N] queryName [queryName ...]
  * Honors SPARK_GRAFT_SF_DIR and SPARK_GRAFT_CPUS like Bench.
  */
object TimeQueries {
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // decoupled for scale probes: a 100×-SF run needs cluster-like
    // shuffle widths (thousands of partitions) on the same 32 threads —
    // task-payload sizing is a partition-count property, not a thread one
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val (repArg, names) = args.partition(_.startsWith("reps="))
    val reps = repArg.headOption.map(_.stripPrefix("reps=").toInt).getOrElse(3)
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // context-level confs for probes (must precede getOrCreate):
    // SPARK_GRAFT_SPARK_CONF="k=v;k=v" — e.g. a short
    // spark.cleaner.periodicGC.interval so finished stages' shuffle
    // files are reaped during long scale probes instead of piling up
    // on scratch disk until JVM GC happens to run
    // tolerant "k=v;k=v" split: trailing ';' (empty segment) is skipped,
    // a segment with no '=' is reported and skipped — a probe env typo
    // must not abort the run with a MatchError
    def confPairs(raw: String): Seq[(String, String)] =
      raw.split(";").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ =>
            println(s"[graft-time] ignoring malformed conf segment '$kv' " +
              "(expected key=value)")
            None
        }
      }
    val builder = sys.env.get("SPARK_GRAFT_SPARK_CONF")
      .map(confPairs(_).foldLeft(builder0) { case (b, (k, v)) =>
        b.config(k, v)
      }).getOrElse(builder0)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extra runtime confs for probes: SPARK_GRAFT_SQL_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_SQL_CONF").foreach(confPairs(_).foreach {
      case (k, v) => spark.conf.set(k, v)
    })
    try { force(SparkEntry.entry(spark)) } catch { case _: Throwable => () }
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: unknown query")
        case Some(fn) =>
          // a rep that throws is excluded from the min — a fast failure
          // must not print as a fast plan
          val times = (1 to reps).map { i =>
            // label jobs so event-log breakdowns attribute to query+rep
            spark.sparkContext.setJobDescription(s"$n rep$i")
            val t0 = System.nanoTime()
            val ok = try { force(fn(spark, sfDir)); true } catch {
              case e: Throwable => println(s"$n ERROR: ${e.getMessage}"); false
            }
            val t = (System.nanoTime() - t0) / 1e9
            Tables.dropCachedBlocks(spark)
            System.gc()
            if (ok) Some(t) else None
          }
          val minStr = times.flatten.reduceOption(_ min _)
            .map(m => f"$m%.3f").getOrElse("N/A")
          val allStr = times.map(_.map(t => f"$t%.3f").getOrElse("ERR")).mkString(",")
          println(f"$n%-28s min=$minStr  all=$allStr")
      }
    }
    spark.stop()
  }
}

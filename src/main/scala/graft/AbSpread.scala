package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B timing of the `Tables.spread` rewrite (scratch main).
  *
  * The sandbox host carries an external load band (observed 2-3x swings
  * between batches), so sequential before/after runs cannot attribute
  * deltas. This main alternates the two arms REP BY REP inside one JVM —
  * `spark.graft.spread=off` (the pre-r16 plan) vs `on` — so both arms
  * sample the same load profile; min and median per arm are printed.
  *
  * Usage: runMain graft.AbSpread [reps=N] queryName [queryName ...]
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object AbSpread {
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (repArg, names) = args.partition(_.startsWith("reps="))
    val reps = repArg.headOption.map(_.stripPrefix("reps=").toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { force(SparkEntry.entry(spark)) } catch { case _: Throwable => () }
    def stats(xs: Seq[Double]): String =
      if (xs.isEmpty) "N/A"
      else f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.length / 2)}%.3f"
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: unknown query")
        case Some(fn) =>
          val acc = Map("off" -> collection.mutable.ArrayBuffer[Double](),
            "on" -> collection.mutable.ArrayBuffer[Double]())
          // one unrecorded warm rep absorbs codegen/page-cache cold
          try { spark.conf.set("spark.graft.spread", "on")
            force(fn(spark, sfDir)) } catch { case _: Throwable => () }
          Tables.dropCachedBlocks(spark); System.gc()
          (1 to reps).foreach { i =>
            Seq("off", "on").foreach { arm =>
              spark.conf.set("spark.graft.spread", arm)
              spark.sparkContext.setJobDescription(s"$n $arm rep$i")
              val t0 = System.nanoTime()
              val ok = try { force(fn(spark, sfDir)); true } catch {
                case e: Throwable =>
                  println(s"$n $arm ERROR: ${e.getMessage}"); false
              }
              val t = (System.nanoTime() - t0) / 1e9
              Tables.dropCachedBlocks(spark)
              System.gc()
              if (ok) acc(arm) += t
            }
          }
          spark.conf.set("spark.graft.spread", "on")
          println(f"$n%-28s OFF ${stats(acc("off").toSeq)}%-24s " +
            f"ON ${stats(acc("on").toSeq)}")
      }
    }
    spark.stop()
  }
}

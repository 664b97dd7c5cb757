package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic interleaved conf-toggle A/B (scratch main) — the r16 AbSpread
  * discipline generalized to ANY `spark.graft.*` optimization gate: the
  * sandbox host carries an external load band (observed 2-3x swings
  * between batches), so the two arms must alternate REP BY REP inside one
  * JVM to sample the same load profile. Every kept optimization of r17 is
  * gated on a session conf precisely so this comparator can time it
  * honestly (VERDICT r16 #9).
  *
  * Usage: runMain graft.AbConf conf=spark.graft.localpin a=off b=on
  *          [reps=N] queryName [queryName ...]
  * Arm a runs first in odd reps, b first in even reps. Honors
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench; min and median per
  * arm are printed.
  */
object AbConf {
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def opt(k: String): Option[String] =
      args.find(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k="))
    val confKey = opt("conf").getOrElse(
      sys.error("missing conf=<session conf key>"))
    val armA = opt("a").getOrElse("off")
    val armB = opt("b").getOrElse("on")
    val reps = opt("reps").map(_.toInt).getOrElse(4)
    val names = args.toSeq.filterNot(_.contains("="))
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
          val acc = Map(armA -> collection.mutable.ArrayBuffer[Double](),
            armB -> collection.mutable.ArrayBuffer[Double]())
          // one unrecorded warm rep absorbs codegen/page-cache cold
          try { spark.conf.set(confKey, armB)
            force(fn(spark, sfDir)) } catch { case _: Throwable => () }
          Tables.dropCachedBlocks(spark); System.gc()
          (1 to reps).foreach { i =>
            val order = if (i % 2 == 1) Seq(armA, armB) else Seq(armB, armA)
            order.foreach { arm =>
              spark.conf.set(confKey, arm)
              spark.sparkContext.setJobDescription(s"$n $confKey=$arm rep$i")
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
          spark.conf.unset(confKey)
          println(f"$n%-28s $confKey: " +
            f"$armA ${stats(acc(armA).toSeq)}%-26s " +
            f"$armB ${stats(acc(armB).toSeq)}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved fixed-code A/B probe for the sf1 regression cluster
  * (td66/td61/q100/q101 — BENCH_r12→r13 moved them +24% on a faster
  * host with none of their code changed) and the grouped/ungrouped
  * single-consumer runtime delta. One process, alternating arms, a host
  * CALIBRATION read before every rep so deltas can be normalized by
  * host speed — the discipline BENCH totals can't provide because the
  * arms run minutes apart there.
  *
  * Usage: `sbt "runMain graft.AbProbe"` (env: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_AB_REPS, SPARK_GRAFT_SF1_DIR). Prints one `[ab]` line
  * per measurement; post-process by eye or awk.
  *
  * With explicit query names as args (`runMain graft.AbProbe td93_ivfpq
  * td90_dedup_funnel`), runs a SINGLE-SF interleaved probe at the Bench
  * SF (SPARK_GRAFT_SF_DIR, default sf0.1) instead — the shape for
  * driver-bench drift attribution where the question is "same code,
  * same SF, did the host move?" rather than a scale-up ratio.
  */
object AbProbe {
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  // the same fixed pure-CPU mix loop Bench calibrates with
  private def calibrate(): Double = {
    def mixRun(iters: Long): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0L
      while (i < iters) {
        x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
        x ^= x >>> 27; x *= 0x94d049bb133111ebL
        i += 1
      }
      x
    }
    mixRun(10000000L) // JIT warm
    val iters = 200000000L
    val t0 = System.nanoTime()
    val sink = mixRun(iters)
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink == 42L) println("") // keep the loop alive
    iters / sec
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/target/sf1")
    val explicit = args.toSeq.filter(SparkEntry.queries.contains)
    val unknown = args.toSeq.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val names =
      if (explicit.nonEmpty) explicit
      else Seq("td66_kmv_setops", "td61_hll_distinct", "q100_kpis",
        "q101_bucketed_join")
    // warm codegen/parquet once
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    // ---- sweep arms: alternate sf0.1 / sf1 per query per rep ----
    // (single-SF when queries were named explicitly: drift attribution)
    val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sf01)
    (1 to reps).foreach { rep =>
      // alternate arm order per rep to cancel drift within a rep
      val arms =
        if (explicit.nonEmpty) Seq("bench" -> benchSf)
        else if (rep % 2 == 1) Seq("sf0.1" -> sf01, "sf1" -> sf1)
        else Seq("sf1" -> sf1, "sf0.1" -> sf01)
      names.foreach { name =>
        arms.foreach { case (tag, dir) =>
          val cal = calibrate()
          val t0 = System.nanoTime()
          val ok = try { force(SparkEntry.queries(name)(spark, dir)); true }
            catch { case _: Throwable => false }
          val sec = (System.nanoTime() - t0) / 1e9
          Tables.dropCachedBlocks(spark)
          System.gc()
          println(f"[ab] kind=sweep rep=$rep q=$name sf=$tag sec=$sec%.2f " +
            f"cal_mops=${cal / 1e6}%.0f ok=$ok")
        }
      }
    }

    // ---- runtime arms: grouped / ungrouped interleaved ----
    // (skipped in explicit-query mode: the sweep IS the probe there)
    if (explicit.isEmpty) {
      val n = sys.env.get("SPARK_GRAFT_RT_EVENTS").map(_.toInt)
        .getOrElse(500000)
      (1 to reps).foreach { rep =>
        Seq(true, false).foreach { grouped =>
          val cal = calibrate()
          System.gc()
          val ops = try RuntimeBench.throughput(spark, grouped = grouped,
            n = n, warm = 2000, segments = 4)
            catch { case _: Throwable => -1.0 }
          println(f"[ab] kind=runtime rep=$rep grouped=$grouped " +
            f"ops=${ops}%.0f cal_mops=${cal / 1e6}%.0f")
        }
      }
    }
    spark.stop()
  }
}

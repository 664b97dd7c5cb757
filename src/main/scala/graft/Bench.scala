package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times every registered query at the
  * SF dir given by SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warmup pass (flagship entry + a cheap query) absorbs JVM/codegen
  * startup so per-query numbers measure the plans, not JIT compilation.
  *
  * ORDER MATTERS: the headline throughput/recall probes run BEFORE the
  * ~100-query sweep. Round 5 reported decode at 326k ev/s while the
  * identical code measured 6.05M isolated — the probe had inherited the
  * sweep's accumulated debris (heap pressure, leaked blocks, temp dirs)
  * despite per-query cleanup. Probes-first makes the headline numbers a
  * property of the code, not of the sweep that preceded them.
  */
object Bench {
  /** Force FULL evaluation of every output column. A bare `.count()` lets
    * Catalyst prune unreferenced projections, so projection-heavy queries
    * would time scan+count instead of the expressions the oracle validates.
    * The `noop` DSv2 sink consumes every row end-to-end (all columns
    * materialized, incl. map-typed ones that hash() cannot touch).
    */
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Sink-side latency samples in MICROSECONDS for the continuous-trigger
    * probe (whole-ms sampling floored sub-ms latencies to an
    * indistinguishable-from-dead 0.0); a static field because
    * ForeachWriter instances are serialized to tasks (local mode: same
    * JVM, so the samples land here).
    */
  val continuousLatencies =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the production deployment the runtime's per-lane scheduler pools
      // assume (ConsumerRuntime workerLoop): under FAIR a slow lane's /
      // slot's big dispatch cannot starve its siblings. Sweep queries
      // run serially in the default pool — unaffected.
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spark warns on ANY empty-partition window — including the five
    // registry queries whose window input is a bounded DIMENSION
    // (hours/years/sources/block totals) and the rank-over-k-survivors
    // shape after a limit. The REAL invariant (no unpartitioned window
    // over unbounded input) is enforced by PlanAuditSpec's
    // registry-wide gate, which distinguishes bounded from unbounded —
    // the log line cannot. Silence it here so the bench log stays
    // signal.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    // Warmup: exercise parquet reads, codegen, shuffle machinery.
    try {
      force(SparkEntry.entry(spark))
      SparkEntry.queries.get("q19_stats").foreach(f => force(f(spark, sfDir)))
      SparkEntry.queries.get("td06_simhash").foreach(f => force(f(spark, sfDir)))
    } catch { case _: Throwable => () }

    // ---- headline probes (run FIRST — see object doc) -------------------

    // HOST CALIBRATION: fixed pure-CPU work (no Spark, no allocation) so
    // round-over-round throughput deltas can be normalized by host speed
    // — measured bands of ~2x across runs of identical code made raw
    // ev/s comparisons soft. Single-threaded 64-bit mix loop, best of 3;
    // report deltas as (ev/s ÷ calibration) ratios when comparing rounds.
    val calibrationOps = try {
      def mixRun(iters: Long): Long = {
        var x = 0x9e3779b97f4a7c15L
        var i = 0L
        while (i < iters) {
          x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
          x ^= x >>> 27; x *= 0x94d049bb133111ebL
          x ^= x >>> 31
          i += 1
        }
        x
      }
      val iters = 200000000L
      mixRun(iters / 10) // JIT warm
      var sink = 0L
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sink ^= mixRun(iters)
        (System.nanoTime() - t0) / 1e9
      }.min
      if (sink == 42L) println("") // keep the loop un-elidable
      iters / best
    } catch { case _: Throwable => -1.0 }

    // CDC-pipeline throughput in the BASELINE's shape (events/sec through
    // the full consumer pipeline: scope+action+filters+diff+routing)
    val opsPerSec = try {
      val cdc = model.Cdc.fromEvents(Tables.events(spark, sfDir))
      val cfg = streaming.ConsumerConfig(name = "bench",
        scope = ops.SourceScope(includeSchemas = Some(Seq("public", "audit"))))
      val pipeline = streaming.CdcPipeline.build(cdc, cfg)
      val n = pipeline.count() // row count for the rate; also warms the plan
      force(pipeline)          // warm the full-evaluation path too
      // each evaluation is a sub-second job, so scheduler jitter dominates
      // small samples (observed 438k-743k ops/s across bench runs on an
      // otherwise-identical build), and per-rep times keep improving
      // through ~rep 10 as JIT warms (measured 0.30→0.18s) — 10 reps
      // lands the min on the warmed asymptote
      val best = (1 to 10).map { _ =>
        val t0 = System.nanoTime()
        force(pipeline)
        (System.nanoTime() - t0) / 1e9
      }.min
      n / best
    } catch { case _: Throwable => -1.0 }

    // Same pipeline over 5M range-synthesized events (no IO) — isolates
    // operator throughput from tiny-table job overhead.
    val syntheticOps = try {
      import org.apache.spark.sql.functions._
      val n = 5000000L
      val synth = spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 1000).as("ts"),
        pmod(col("id"), lit(150)).as("user_id"),
        element_at(array(lit("signup"), lit("error"), lit("purchase"),
          lit("click"), lit("view")), (pmod(col("id"), lit(5)) + 1).cast("int"))
          .as("event_type"),
        (pmod(col("id") * 7919, lit(20000)) / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(col("id"), lit(100)), lit("}")).as("props"))
      val cfg = streaming.ConsumerConfig(name = "bench",
        scope = ops.SourceScope(includeSchemas = Some(Seq("public", "audit"))))
      val pipeline = streaming.CdcPipeline.build(model.Cdc.fromEvents(synth), cfg)
      val cnt = pipeline.count() // row count for the rate; also warms the plan
      force(pipeline)            // warm the full-evaluation path too
      // one observed run dipped 19M -> 7.7M ops/s on 2 reps (transient
      // host contention); 4 reps keeps the min a plan property
      val best = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        force(pipeline)
        (System.nanoTime() - t0) / 1e9
      }.min
      cnt / best
    } catch { case _: Throwable => -1.0 }

    // Ingest-boundary throughput: 1M synthetic events through the FULL
    // binary codec path (pgoutput encode + decode + Relation-typed cast),
    // no I/O — the direct comparable to the reference's CDC ops/s.
    val decodeOps = try {
      val n = 1000000L
      val df = queries.IngestQueries.syntheticDecode(spark, n)
      force(df) // warm codec + codegen
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(df)
        (System.nanoTime() - t0) / 1e9
      }.min
      n / best
    } catch { case _: Throwable => -1.0 }

    // Assembled-runtime delivered throughput + latency: the shape of the
    // reference's published benchmark (docs/performance.mdx:8,24-26 —
    // 50k ops/s sustained, 55 ms avg / 253 ms p99 delivered latency).
    // ConsumerRuntime.start() end to end: WAL segments on disk → DSv2
    // spool stream → binary pgoutput decode → CDC envelope → pipeline →
    // AckDelivery ledger → live loopback RESP transport → acks. The
    // number is DELIVERED events/sec measured at the transport (the
    // loopback server counts XADDs), not pipeline rows/sec.
    val rt = try RuntimeBench.run(spark)
      catch { case _: Throwable => RuntimeBench.Result(-1, -1, -1, -1) }
    val msSlots = sys.env.getOrElse("SPARK_GRAFT_RT_SLOTS", "4")
    val msLanes = sys.env.getOrElse("SPARK_GRAFT_RT_LANES_PER_SLOT", "8")

    // Paced latency-vs-throughput curve: delivered p50/p99 at fixed
    // arrival rates, BOTH regimes (micro-batch runtime / low-latency
    // tail) — maps the regime boundary between the two published
    // latency points; (-1, -1) marks a rate the regime cannot sustain
    // (the tail's documented hand-off to the micro-batch runtime).
    val pacedRates = sys.env.getOrElse("SPARK_GRAFT_RT_PACED_RATES",
      "1000,5000,20000").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val pacedJson = pacedRates.flatMap { r =>
      def arm(tail: Boolean): (Double, Double) =
        try RuntimeBench.pacedLatency(spark, r, seconds = 10, tail = tail)
        catch { case _: Throwable => (-1.0, -1.0) }
      val mb = arm(tail = false)
      val tl = arm(tail = true)
      val k = if (r >= 1000) s"${r / 1000}k" else r.toString
      Seq(
        s""""runtime_paced_mb_${k}_ms_p50":${"%.1f".format(mb._1)}""",
        s""""runtime_paced_mb_${k}_ms_p99":${"%.1f".format(mb._2)}""",
        s""""runtime_paced_tail_${k}_ms_p50":${"%.1f".format(tl._1)}""",
        s""""runtime_paced_tail_${k}_ms_p99":${"%.1f".format(tl._2)}""")
    } match {
      case Seq() => ""
      case fields => fields.mkString(",", ",", "")
    }
    // Sharded-tail arm: the same paced probe with K-connection dispatch
    // (startLowLatencyTail(shards = K)) at rates past the serial tail's
    // saturation — the evidence that low latency holds AT the reference's
    // published 50k ops/s operating point, not only at trickle rates.
    val tailShards = sys.env.getOrElse("SPARK_GRAFT_RT_TAIL_SHARDS", "8").toInt
    val shardedRates = sys.env.getOrElse("SPARK_GRAFT_RT_SHARDED_RATES",
      "20000,50000").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val shardedJson = shardedRates.flatMap { r =>
      val (p50, p99) =
        try RuntimeBench.pacedLatency(spark, r, seconds = 10, tail = true,
          shards = tailShards)
        catch { case _: Throwable => (-1.0, -1.0) }
      val k = if (r >= 1000) s"${r / 1000}k" else r.toString
      Seq(
        s""""runtime_paced_tail${tailShards}_${k}_ms_p50":${"%.1f".format(p50)}""",
        s""""runtime_paced_tail${tailShards}_${k}_ms_p99":${"%.1f".format(p99)}""")
    } match {
      case Seq() => ""
      case fields => fields.mkString(",", ",", "")
    }

    // ANN quality tracking: recall@10 of the approximate paths vs the
    // exact brute-force ranking on the same 20 queries — runtime numbers
    // alone would hide a recall regression (e.g. a centroid-seeding
    // change that speeds the plan up by probing emptier cells).
    def recallOf(approx: DataFrame, exact: DataFrame): Double = {
      import org.apache.spark.sql.functions.col
      val a = approx.select(col("query_id"), col("corpus_id"))
      val hits = exact.select(col("query_id"), col("corpus_id")).join(
        a, Seq("query_id", "corpus_id"), "left_semi").count()
      val n = exact.count()
      if (n == 0) 0.0 else hits.toDouble / n
    }
    // IVF probes seed with deterministic k-means|| (farthest-point-reduced
    // distance-weighted sampling) — measured +0.06..0.09 recall over the
    // every-Nth medoids at the same Lloyd budget. The corpus's neighbor
    // structure is weak (top-10 at cos 0.30-0.48), so the recall curve is
    // scan-bound: nprobe=16 (~40% of corpus per query) is the measured
    // point that crosses recall 0.7; raising nlist at fixed scan fraction
    // LOWERS recall here (measured 80 cells @ nprobe=16: 0.665) — cells
    // fragment faster than probes recover.
    val (ivfRecall, ivfRecall8, ivfRecall16, lshRecall, ivfpqRecall) = try {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
      val q = emb.filter(col("vec_id") < 20)
      val exact = similarity.Ann.bruteForceTopK(q, emb, k = 10).localCheckpoint()
      val seeds = Some(similarity.Ann.kMeansParallelSeeds(emb, k = 40)
        .localCheckpoint())
      def ivfAt(nprobe: Int) = similarity.Ann.ivfTopK(q, emb,
        centroidEvery = 50, nprobe = nprobe, k = 10, refineIters = 2,
        seedsOverride = seeds)
      val lsh = similarity.Ann.lshTopK(q, emb,
        tables = similarity.Ann.LshTables, bits = similarity.Ann.LshBits,
        dims = 64, k = 10) // td11's config
      // IVF-PQ (td93's config at nprobe=16): the compressed-storage point
      // on the same tradeoff curve — recall lost to BOTH cell pruning and
      // 8-byte code quantization, measured against the same exact top-10
      val ivfpq = {
        val books0 = similarity.Quantize.pqCodebooks(
          emb, "embedding", m = 8, k = 64, step = 25, dims = 64)
        val books = similarity.Quantize.refineCodebooks(
          emb, "embedding", books0, m = 8, dims = 64, iters = 1)
        val codes = similarity.Quantize.pqEncode(
          emb, "embedding", books, m = 8, dims = 64)
        (similarity.Quantize.ivfPqTopK(q, emb, codes, books, "embedding",
          m = 8, dims = 64, centroidEvery = 50, nprobe = 16, k = 10),
          similarity.Quantize.ivfPqRerankTopK(q, emb, codes, books,
            "embedding", m = 8, dims = 64, centroidEvery = 50,
            nprobe = 16, shortlist = 200, k = 10))
      }
      // Residual IVF-PQ (td110's mechanism at the production point):
      // 2-round-refined coarse quantizer, PQ over NORMALIZED residuals
      // (unit-vector L2 ≡ cosine, so the ADC shortlist ranks by the
      // re-rank metric), m=16 subspaces, nprobe=24, rerank-200 — the
      // r15 weak spot (0.635) re-measured on the fixed encoding
      val resRerank = {
        val medoids = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("cent_emb"))
        val cents = similarity.Ann.refineCentroids(emb, medoids, iters = 2)
        val res = similarity.Quantize.residuals(emb, "embedding", cents)
          .localCheckpoint()
        val rb = similarity.Quantize.refineCodebooks(res, "rvec",
          similarity.Quantize.residualCodebooks(
            res, m = 16, k = 64, step = 25, dims = 64),
          m = 16, dims = 64, iters = 1)
        val rc = similarity.Quantize.pqEncode(res, "rvec", rb, m = 16,
          dims = 64)
        similarity.Quantize.ivfPqResidualRerankTopK(q, emb, rc, rb, cents,
          "embedding", m = 16, dims = 64, nprobe = 24, shortlist = 200,
          k = 10)
      }
      (recallOf(ivfAt(2), exact), recallOf(ivfAt(8), exact),
        recallOf(ivfAt(16), exact), recallOf(lsh, exact),
        (recallOf(ivfpq._1, exact), recallOf(ivfpq._2, exact),
          recallOf(resRerank, exact)))
    } catch { case _: Throwable => (-1.0, -1.0, -1.0, -1.0,
      (-1.0, -1.0, -1.0)) }

    // Streaming delivery latency: wall time for ONE event to clear the
    // full consumer pipeline as its own micro-batch (MemoryStream →
    // CdcPipeline → memory sink) — the honest comparable to the
    // reference's 55 ms avg end-to-end latency (BASELINE.md). Spark
    // micro-batching trades latency for throughput; this measures the
    // price instead of leaving it unstated. Median of 20 single-event
    // batches after 5 warmups (trigger scheduling dominates the tail).
    val latencyMs = try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.model.ChangeEvent]
      val cfg = streaming.ConsumerConfig(name = "lat",
        scope = ops.SourceScope(includeSchemas = Some(Seq("public", "audit"))))
      val q = streaming.CdcPipeline.build(input.toDF(), cfg)
        .writeStream.format("memory").queryName("bench_lat")
        .outputMode("append").start()
      def ev(i: Long) = graft.model.ChangeEvent(i * 8, 0L,
        new java.sql.Timestamp(1704067200000L), "update", "public", "t0",
        16384L, i.toString, i, i % 150, 1.0, """{"k":1}""", Some(0.0),
        s"$i", (i % 150).toString, 100L)
      try {
        val times = (1 to 25).map { i =>
          val t0 = System.nanoTime()
          input.addData(ev(i.toLong))
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e6
        }.drop(5).sorted
        times(times.length / 2)
      } finally q.stop()
    } catch { case _: Throwable => -1.0 }

    // Continuous-trigger latency: the same projection work under
    // Trigger.Continuous — the latency FLOOR Spark offers when the
    // pipeline stage is map-only (filters + projections, no stateful
    // op). Rows reach the foreach sink as they are processed (no
    // micro-batch boundary); per-row latency = sink time − rate-source
    // event time, collected in-JVM (local mode: executor == driver).
    // Together with stream_latency_ms_p50 this brackets the story: the
    // stateless subset runs at millisecond latency, the stateful
    // pipeline pays the micro-batch price.
    val latencyContinuousMs = try {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.functions._
      Bench.continuousLatencies.clear()
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", 200).load()
        .select(col("timestamp"), col("value"),
          pmod(col("value"), lit(150)).cast("string").as("group_id"),
          concat(lit("pk"), col("value")).as("record_pk"),
          (col("value") % 7 === 0).as("audit"))
        .where(col("value") >= 0)
        .writeStream
        .foreach(new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
          override def open(partitionId: Long, epochId: Long): Boolean = true
          override def process(r: org.apache.spark.sql.Row): Unit = {
            // µs resolution end to end: Instant.now() reads
            // CLOCK_REALTIME at ns granularity; the event Timestamp
            // carries full sub-second nanos
            val now = java.time.Instant.now()
            val nowUs = now.getEpochSecond * 1000000L + now.getNano / 1000L
            val ts = r.getTimestamp(0)
            // getTime repeats the ms part of getNanos — rebuild from
            // whole seconds + full sub-second nanos
            val evtUs = math.floorDiv(ts.getTime, 1000L) * 1000000L +
              ts.getNanos / 1000L
            Bench.continuousLatencies.add(nowUs - evtUs)
          }
          override def close(errorOrNull: Throwable): Unit = ()
        })
        .trigger(Trigger.Continuous("1 second"))
        .start()
      Thread.sleep(5000)
      q.stop()
      import scala.jdk.CollectionConverters._
      val all = Bench.continuousLatencies.asScala.toVector
      // drop the startup second (task scheduling), then p50 — samples
      // are µs; report ms downstream, µs alongside
      val settled = all.drop(all.length / 3).map(_.toDouble / 1000.0).sorted
      if (settled.isEmpty) -1.0 else settled(settled.length / 2)
    } catch { case _: Throwable => -1.0 }

    // reset before the sweep: the probes' checkpoint blocks must not
    // charge the first swept queries
    Tables.dropCachedBlocks(spark)
    System.gc()

    // ---- per-query sweep ------------------------------------------------

    // SPARK_GRAFT_PROBES_ONLY=1 skips the ~140-query sweep: builder-side
    // iteration on the headline probes (isolated-measurement parity
    // checks) without paying 15+ min of sweep per data point.
    val probesOnly = sys.env.get("SPARK_GRAFT_PROBES_ONLY").contains("1")
    // SPARK_GRAFT_SWEEP_ONLY=q66,td66 restricts the sweep to named
    // queries — builder-side timing iteration on one plan without the
    // full sweep. Unset (driver runs) sweeps everything.
    val sweepOnly = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // Adaptive min-of-reps per query: the first evaluation pays page-cache
    // misses, JIT and codegen compilation; the min reflects the PLAN's
    // steady-state cost, which is what round-over-round comparison needs.
    // Two reps under-sample disk-heavy queries (observed: q44 9.1/3.2/2.9s,
    // q48 6.1/3.4/3.0s — min-of-2 reported phantom regressions), so keep
    // sampling (cap 4) while the latest rep still improves the running min
    // by >25%. Failed reps are excluded from the min — a fast failure must
    // not masquerade as a fast plan; all-reps-failed reports -1.
    // Drop leftover checkpoint blocks between evaluations (observed: the
    // decode bench fell 4.8M -> 0.19M events/s behind 82 leaked sf0.1
    // checkpoints).
    // Per query the sweep records BOTH series (the r10 td66/q66 postmortem
    // was a cold-vs-warm confusion): `first` = rep 1 as measured (page
    // cache + codegen cold — what a one-shot caller pays), `warm` = min of
    // reps 2+ (the PLAN's steady-state cost — the round-over-round
    // comparison series). `queries` keeps its historical meaning
    // (min of ALL reps) so prior-round comparisons stay valid.
    case class QTimes(min: Double, first: Double, warm: Double)
    val results = (if (probesOnly) Seq.empty[(String, (SparkSession, String) => DataFrame)]
    else SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => sweepOnly.forall(_.contains(n)) })
      .map { case (name, fn) =>
      def rep(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        Tables.dropCachedBlocks(spark)
        // Late queries in the sorted sweep otherwise pay the GC debt of the
        // ~80 queries before them (observed: td31 4.9s in the sweep vs 0.9s
        // isolated). Collect between measurements so each min reflects the
        // plan, not accumulated heap pressure.
        System.gc()
        if (ok) Some(t) else None
      }
      val times = scala.collection.mutable.ArrayBuffer(rep(), rep())
      while (times.length < 4 && times.last.exists(last =>
          times.init.flatten.forall(_ * 0.75 > last)))
        times += rep()
      val min = times.flatten.reduceOption(_ min _).getOrElse(-1.0)
      name -> QTimes(min,
        times.head.getOrElse(-1.0),
        times.tail.flatten.reduceOption(_ min _).getOrElse(-1.0))
    }
    // ---- sf1 scale section ---------------------------------------------
    // A 10x-sf jump over a representative slice of the registry (scan,
    // broadcast join, global agg, total-order sort, LSH dedup, HLL,
    // KMV, tokenizer stats, RFM ranks) — catches cliffs the synthetic
    // 10x probes can't (real TPC-H-ish skew, 6M-row lineitem). The sf1
    // dataset is built by tools/gen_sf1.py (FK-consistent replication);
    // the section only runs when it exists, so the bench is unchanged
    // where it hasn't been generated.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/target/sf1")
    val Sf1Queries = Seq("q01_keyset_page", "q15_enrich_join", "q19_stats",
      "q20_total_order", "q98_rfm_segments", "td05_minhash_neardups",
      "td61_hll_distinct", "td66_kmv_setops", "td92_tokenizer_fertility",
      "q100_kpis", "q101_bucketed_join")
    val sf1Results: Seq[(String, Double)] =
      if (probesOnly || !new java.io.File(s"$sf1Dir/lineitem.parquet").exists())
        Seq.empty
      else Sf1Queries.filter(n => sweepOnly.forall(_.contains(n)))
        .flatMap(n => SparkEntry.queries.get(n).map(n -> _))
        .map { case (name, fn) =>
          def rep(): Option[Double] = {
            val t0 = System.nanoTime()
            val ok = try { force(fn(spark, sf1Dir)); true }
              catch { case _: Throwable => false }
            val t = (System.nanoTime() - t0) / 1e9
            Tables.dropCachedBlocks(spark)
            System.gc()
            if (ok) Some(t) else None
          }
          name -> Seq(rep(), rep()).flatten.reduceOption(_ min _)
            .getOrElse(-1.0)
        }
    val sf1Json =
      if (sf1Results.isEmpty) ""
      else {
        val qs1 = sf1Results.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val tot1 = sf1Results.collect { case (_, v) if v >= 0 => v }.sum
        // ratio vs the same queries' sf0.1 sweep times (min-of-reps both)
        val base = results.map { case (k, t) => k -> t.min }.toMap
        val ratios = sf1Results.collect {
          case (k, v) if v >= 0 && base.get(k).exists(_ > 0) => v / base(k)
        }
        val med =
          if (ratios.isEmpty) -1.0
          else ratios.sorted.apply(ratios.length / 2)
        s""","sf1_total":$tot1,"sf1_queries":$qs1,"sf1_vs_sf01_median_ratio":${"%.1f".format(med)}"""
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val qsFirst = results.map { case (k, v) => "\"" + k + "\":" + v.first }
      .mkString("{", ",", "}")
    val qsWarm = results.map { case (k, v) => "\"" + k + "\":" + v.warm }
      .mkString("{", ",", "}")
    // failed queries report -1.0 per-query but must not poison the
    // headline total (a -1 per failure once drove the total NEGATIVE);
    // sum the successes and surface the failure count separately
    val total = results.collect { case (_, v) if v.min >= 0 => v.min }.sum
    val warmTotal = results.collect { case (_, v) if v.warm >= 0 => v.warm }.sum
    val failed = results.count(_._2.min < 0)

    // Probe scalars shared by the full artifact and the compact headline.
    val probesJson = s""""calibration_ops_per_sec":${calibrationOps.toLong},"pipeline_ops_per_sec":${opsPerSec.toLong},"synthetic_5m_ops_per_sec":${syntheticOps.toLong},"decode_ops_per_sec":${decodeOps.toLong},"runtime_ops_per_sec":${rt.groupedOps.toLong},"runtime_ungrouped_ops_per_sec":${rt.ungroupedOps.toLong},"runtime_fanout_shared_ops_per_sec":${rt.fanoutSharedOps.toLong},"runtime_fanout_independent_ops_per_sec":${rt.fanoutIndependentOps.toLong},"runtime_fanout_skew_sibling_ops_per_sec":${rt.fanoutSkewSiblingOps.toLong},"runtime_fanout_skew_lagged_ops_per_sec":${rt.fanoutSkewLaggedOps.toLong},"runtime_multislot_min_ops_per_sec":${rt.multiSlotMinOps.toLong},"runtime_multislot_max_ops_per_sec":${rt.multiSlotMaxOps.toLong},"runtime_latency_ms_p50":${"%.1f".format(rt.latP50Ms)},"runtime_latency_ms_p99":${"%.1f".format(rt.latP99Ms)},"runtime_lowlat_latency_ms_p50":${"%.1f".format(rt.tailLatP50Ms)},"runtime_lowlat_latency_ms_p99":${"%.1f".format(rt.tailLatP99Ms)}$pacedJson$shardedJson,"stream_latency_ms_p50":${"%.1f".format(latencyMs)},"stream_latency_continuous_ms_p50":${"%.1f".format(latencyContinuousMs)},"ivf_recall_at_10":$ivfRecall,"ivf_recall_at_10_nprobe8":$ivfRecall8,"ivf_recall_at_10_nprobe16":$ivfRecall16,"lsh_recall_at_10":$lshRecall,"ivfpq_recall_at_10_nprobe16":${ivfpqRecall._1},"ivfpq_rerank200_recall_at_10":${ivfpqRecall._2},"ivfpq_residual_m16_nprobe24_rerank200_recall_at_10":${ivfpqRecall._3}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","warm_total":$warmTotal,"queries":$qs,"queries_first_rep":$qsFirst,"queries_warm_min":$qsWarm,"failed_queries":$failed,$probesJson,"stream_latency_continuous_us_p50":${"%.1f".format(latencyContinuousMs * 1000.0)},"runtime_fanout_consumers":${sys.env.getOrElse("SPARK_GRAFT_RT_FANOUT_CONSUMERS", "8")},"runtime_multislot_slots":$msSlots,"runtime_multislot_lanes_per_slot":$msLanes$sf1Json,"sf":"$sfDir"}"""
    println(json)
    // the driver keeps only the tail of stdout — persist the FULL
    // artifact so per-query times survive without a re-run
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench-report.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench-report.json: $e") }
    // COMPACT headline, printed LAST: the driver retains only a ~2000-char
    // tail of stdout, and the full line above (three per-query maps,
    // ~22 KB) has overflowed that tail EVERY round since r01 — the tail
    // begins mid-JSON, the driver's parse fails, and the round's bench
    // ground truth is lost (BENCH_r16.json parsed:null, PERF_r16
    // per_query:{}). This line carries the totals + every probe scalar
    // and NOTHING per-query (~1.7 KB incl. the trailing sbt status line,
    // inside the tail budget), so the driver's parser finds one complete
    // JSON object at the end of stdout. Per-query maps still ship — on
    // the full line above and in bench-report.json. Totals are rounded
    // to ms; the full-precision values stay on the full line.
    val sf1Compact =
      if (sf1Results.isEmpty) ""
      else {
        val tot1 = sf1Results.collect { case (_, v) if v >= 0 => v }.sum
        val base = results.map { case (k, t) => k -> t.min }.toMap
        val ratios = sf1Results.collect {
          case (k, v) if v >= 0 && base.get(k).exists(_ > 0) => v / base(k)
        }
        val med =
          if (ratios.isEmpty) -1.0
          else ratios.sorted.apply(ratios.length / 2)
        s""","sf1_total":${"%.3f".format(tot1)},"sf1_vs_sf01_median_ratio":${"%.1f".format(med)}"""
      }
    val compact = s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","warm_total":${"%.3f".format(warmTotal)},"failed_queries":$failed,$probesJson$sf1Compact,"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}

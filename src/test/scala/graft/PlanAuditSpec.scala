package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression gate: the properties that make these queries
  * scale (pushdown reaching the scan, broadcast on the dim side,
  * partition pruning on the materialized IVF, no cartesian blowups,
  * whole-stage codegen on the hot projection path) asserted against the
  * ACTUAL physical plan — a change that silently degrades a plan fails
  * here, not at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = {
    // other suites may have cached shared tables in this session; an
    // InMemoryRelation scan has no PushedFilters, so audit fresh reads
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf())
  }

  test("q01 keyset page: the tuple bound reaches PushedFilters") {
    val plan = formatted(q("q01_keyset_page"))
    assert(plan.contains("PushedFilters:"))
    // leading-bound conjunct AND the OR-expanded row-value compare
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"))
    assert(plan.contains("Or(GreaterThan(o_orderdate") ||
      plan.contains("GreaterThan(o_orderkey"))
  }

  test("q15 enrichment join broadcasts the dimension side") {
    val plan = formatted(q("q15_enrich_join"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q06 column filters are a single pushable conjunction") {
    val plan = formatted(q("q06_column_filters"))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("IsNotNull"))
  }

  test("td27 materialized IVF probes prune to nprobe cell directories") {
    val plan = formatted(q("td27_ann_ivf_indexed"))
    assert(plan.contains("PartitionFilters:"))
    assert(plan.contains("centroid_id"))
    assert(plan.contains(" IN ") || plan.contains("dynamicpruning"))
  }

  test("q80 iterate unrolls into one projection over the scan — no runtime loop, no extra operators") {
    val df = q("q80_iterate")
    val plan = formatted(df)
    // the 12-step unroll must be an ordinary Project directly over the
    // scan: no UDF boundary, no join, no generator — the expression IS
    // the loop (codegen covers it like any hand-written projection)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SerializeFromObject"),
      "iterate must not leave the expression path")
    assert(!plan.contains("Join"), "iterate must not introduce joins")
    assert(plan.contains("Project") && plan.contains("Scan parquet"))
    // substitution depth is visible in the ANALYZED tree (the formatted
    // detail section truncates long expressions): the MINSTD multiplier
    // appears once per unrolled step
    val analyzed = df.queryExecution.analyzed
      .collect { case p => p.expressions.map(_.toString).mkString }.mkString
    assert("48271".r.findAllIn(analyzed).size >= 12,
      "expected the 12-step unroll inline in the projection")
  }

  test("td77 fuzzy pairs: blocked equi-join, levenshtein only post-join") {
    val plan = formatted(q("td77_fuzzy_pairs"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "blocking must keep the pair space an equi-join")
    assert(plan.contains("levenshtein"))
  }

  test("q89 star join: every dimension broadcasts; only the fact⋈fact edge may shuffle") {
    val plan = formatted(q("q89_nation_revenue"))
    // customer/nation/region must ride broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "expected broadcast joins on the dimension chain")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // the date-less fact scan reads only the needed columns
    assert(plan.contains("l_extendedprice") && !plan.contains("l_comment"))
  }

  test("dedup/ANN plans never fall back to cartesian or nested-loop joins") {
    for (name <- Seq("td05_minhash_neardups", "td07_simhash_neardups",
        "td08_ngram_jaccard", "td11_ann_lsh", "td15_embedding_neardups_lsh")) {
      val plan = formatted(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian join")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name has a nested-loop join")
    }
  }

  test("IVF corpus assignment is an argmin partial aggregate, not a window") {
    // td14 shows the assignment inline (semDedup checkpoints the same
    // stage, hiding it from its final plan): the corpus-side coarse
    // quantizer must be a map-side-combinable min_by aggregate, not a
    // row_number window over |corpus|×|centroids| rows
    val plan = formatted(q("td14_ann_ivf"))
    assert(plan.contains("min_by"))
    assert(plan.contains("partial_min_by") || plan.contains("Partial"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("semDedup: within-cell pairing never falls back to cartesian") {
    val plan = formatted(q("td32_semdedup"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("oovRate: the vocabulary is broadcast; doc text never shuffles") {
    val plan = formatted(q("td33_oov_rate"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("incremental dedup: band-collision equijoins only, no cartesian") {
    val plan = formatted(q("td34_incremental_dedup"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("projection pipeline stays inside whole-stage codegen") {
    val df = q("q10_transform_reshape")
    df.collect() // finalize the adaptive plan: codegen ids appear post-exec
    val plan = df.queryExecution.executedPlan.toString
    // "*(n) Op" is simple-mode's WholeStageCodegen span marker
    assert(plan.contains("*("), plan)
  }

  test("td29 decontamination broadcasts the eval universe — corpus text never shuffles") {
    val plan = formatted(q("td29_decontam"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // exactly one data shuffle: the per-doc aggregate (AQE may add a
    // final sort exchange for the orderBy)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q51 time travel over a STORED event table pushes the lsn cutoff to the scan") {
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    graft.model.Cdc.fromEvents(Tables.events(spark, sf()))
      .write.mode("overwrite").parquet(dir)
    val plan = formatted(graft.sinks.EventTableSink.stateAsOf(
      spark.read.parquet(dir), lsn = 5000L))
    // against retained storage the cutoff is a plain column predicate:
    // it must reach the parquet scan (row-group pruning at 100 TB)
    assert(plan.contains("LessThan(commit_lsn,5001)") ||
      plan.contains("LessThanOrEqual(commit_lsn,5000)") ||
      plan.contains("Or(LessThan(commit_lsn,5000)"), plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n"))
    assert(plan.contains("Window"))
  }

  test("q52 initial sync: fence is a hash anti-join, no cartesian, single union") {
    val plan = formatted(q("q52_initial_sync"))
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Union"))
  }

  test("q33 partition assignment shuffles once, by the delivery hash") {
    val plan = formatted(q("q20_total_order"))
    // global order restore = one range-partitioned sort, no extra exchange
    assert("Exchange".r.findAllIn(plan).size <= 2, plan.linesIterator
      .filter(_.contains("Exchange")).mkString("\n"))
  }

  test("retention expiry probe scans only the ts + bucket columns") {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, to_timestamp}
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("graft_retp").toString + "/t"
    val batch = graft.model.Cdc.fromEvents(Tables.events(spark, sf()))
      .filter(pmod(col("commit_lsn"), lit(16)) === 0)
    graft.sinks.EventTableSink.upsert(spark, batch, dir, numBuckets = 4)
    // the probe retention() runs before deciding what to rewrite: its
    // ReadSchema must prune to commit_ts alone (bucket comes from the
    // directory layout) — at 100 TB the expiry check reads one thin
    // column, not the table
    val probe = spark.read.parquet(dir)
      .filter(col("commit_ts") < to_timestamp(lit("2024-01-16 00:00:00")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val plan = formatted(probe)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n")
    assert(readSchema.contains("commit_ts"), readSchema)
    assert(!readSchema.contains("record_pk") && !readSchema.contains("record_props"),
      readSchema)
  }

  test("replay window over a stored event table prunes to in-window EPOCH dirs") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("graft_rw").toString + "/t"
    val batch = graft.model.Cdc.fromEvents(Tables.events(spark, sf()))
      .filter(pmod(col("commit_lsn"), lit(16)) === 0)
    // sf0.001 lsn range is 0..~1136 → epochWidth 128 spans epochs 0..8
    graft.sinks.EventTableSink.upsert(spark, batch, dir, numBuckets = 4,
      epochWidth = 128)
    val df = graft.sinks.EventTableSink.changesBetween(spark, dir,
      256L, 640L, epochWidth = 128)
    // the lsn window must become a PARTITION filter on the epoch dirs —
    // at 100 TB retained, replaying a window lists the window's
    // directories, nothing else
    val plan = formatted(df)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("epoch") && pf.contains(">= 2") && pf.contains("<= 5"),
      pf)
    // and the EXECUTED scan read only the in-window dirs' files
    // (df.inputFiles ignores pruning; the scan metric doesn't). AQE off
    // so the scan node is reachable in the executed plan tree.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val filesRead = withSqlConf("spark.sql.adaptive.enabled" -> "false") {
      val df2 = graft.sinks.EventTableSink.changesBetween(spark, dir,
        256L, 640L, epochWidth = 128)
      df2.collect()
      val scan = df2.queryExecution.executedPlan
        .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
      scan.metrics("numFiles").value
    }
    import scala.jdk.CollectionConverters._
    def filesUnder(pred: Int => Boolean) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .count(p => "epoch=(-?\\d+)".r.findFirstMatchIn(p.toString)
          .exists(m => pred(m.group(1).toInt)))
    assert(filesRead == filesUnder(e => e >= 2 && e <= 5),
      s"read $filesRead files")
    assert(filesRead < filesUnder(_ => true))
  }

  test("td40 payload decode runs shuffle-free (per-partition map only)") {
    val df = q("td40_payload_features")
    val plan = formatted(df)
    // decode + feature reduction is mapPartitions over the scan; the only
    // exchange allowed is the final orderBy's range partitioning — no
    // hash shuffle anywhere in the decode path
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("hashpartitioning"), plan.linesIterator
      .filter(_.contains("partitioning")).mkString("\n"))
  }

  test("td55 gopher rules are a pure projection — no shuffle before the final sort") {
    val plan = formatted(q("td55_gopher_rules"))
    // per-row rule arithmetic must never aggregate or hash-shuffle; the
    // only exchange is the presentation orderBy's range partitioning
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("hashpartitioning"), plan.linesIterator
      .filter(_.contains("partitioning")).mkString("\n"))
    assert(!plan.contains("HashAggregate"), "gopher rules grew an aggregate")
  }

  test("td56 span dedup: first-occurrence is an equijoin on the span hash, no window over the corpus") {
    val plan = formatted(q("td56_span_dedup"))
    assert(!plan.contains("CartesianProduct"), "span dedup went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // corpus-wide first-occurrence must be the min-struct AGGREGATE, not
    // a rank window (a window over every span would single-task at 100 TB
    // if the partition key degenerated)
    assert(!plan.contains("Window"), "span dedup uses a window")
  }

  test("td57 corpus shard: one hash shuffle into shards, per-shard sort only") {
    val plan = formatted(q("td57_corpus_shard"))
    // the in-shard position window partitions by shard — a missing
    // PARTITION BY would move the whole corpus to one task
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("No Partition Defined"))
    assert(plan.contains("hashpartitioning(shard"), plan.linesIterator
      .filter(_.contains("partitioning")).mkString("\n"))
  }

  test("td62 bloom decontam: the filter words broadcast, candidates never shuffle against them") {
    val plan = formatted(q("td62_bloom_decontam"))
    // the 8192-word filter (~32 KB) must be the broadcast side — a
    // sort-merge join here would shuffle every candidate probe at 100 TB
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("td63 cms heavy hitters: the 4096-cell sketch broadcasts into the readback join") {
    val plan = formatted(q("td63_cms_heavy"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
    // final top-k is a TakeOrdered, not a global sort of all tokens
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("td60 bm25: query terms and corpus stats broadcast; top-k is TakeOrdered") {
    val plan = formatted(q("td60_bm25_topk"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("td61 hll: registers reduce via partial aggregation (map-side combine)") {
    val plan = formatted(q("td61_hll_distinct"))
    // two-phase hash agg: partial per input partition, final per group —
    // the sketch property that makes it beat count-distinct at scale
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("td65 inverted index: one hash agg, no window, no join") {
    val plan = formatted(q("td65_inverted_index"))
    assert(plan.contains("HashAggregate"), plan)
    // positions collect within a (term, doc) group — a window over the
    // token stream would single-task on a degenerate key at 100 TB
    assert(!plan.contains("Window"), "index build grew a window")
    assert(!plan.contains("Join"), "index build grew a join")
  }

  test("td66 kmv: bottom-k windows are group-partitioned, merges broadcast") {
    val plan = formatted(q("td66_kmv_setops"))
    // a window without PARTITION BY would sort every distinct value on
    // one task; the sketch windows must partition by group / pair
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("No Partition Defined"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q101 bucketed join: co-located SortMergeJoin, ZERO Exchange") {
    // build via the registry once — this writes + registers the bucketed
    // tables in this session's catalog
    q("q101_bucketed_join")
    // the property under audit is the JOIN stage itself (the registry
    // query adds a groupBy whose hash-agg exchange is expected): two
    // tables bucketed on their join keys with the same bucket count
    // must join with no shuffle AND no sort on either side
    val j = graft.ops.Layout.coLocatedJoin(spark,
      "graft_bkt_lineitem", "l_orderkey", "graft_bkt_orders", "o_orderkey")
    val plan = formatted(j)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join grew a shuffle:\n$plan")
    // one file per bucket (Layout pre-repartitions on the bucket hash),
    // so the bucket-sorted layout also satisfies the join's ordering
    assert(!plan.contains("Sort ["), s"bucketed join re-sorted:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("q104 replay join: the ONLY Exchange is the dedup window's — the " +
      "join itself is exchange-free against the bucketed dimension") {
    q("q104_replay_join") // builds the event table + bucketed dim
    val path = graft.queries.CoreQueries.scratchDirPath("rplj")
    val j = graft.sinks.EventTableSink.replayJoin(spark, path, 4000L, 9000L,
      graft.queries.CoreQueries.epochWidthFor(sf()),
      "graft_bkt_replay_dim", "record_pk")
    val plan = formatted(j)
    assert(plan.contains("SortMergeJoin"), plan)
    // count physical NODES (each appears once as a "(n) Exchange" detail
    // header), not string occurrences (tree line + header = 2 per node)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"replay join must add no Exchange beyond the dedup window's " +
        s"(found $exchanges):\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("AQE skew join: the runtime re-plan splits the skewed partition (skew=true)") {
    import org.apache.spark.sql.functions._
    // the OTHER half of the skew story next to Skew.saltedJoin: salting
    // is the deterministic pre-plan mitigation, AQE's OptimizeSkewedJoin
    // is the runtime re-plan — this proves the knobs actually fire on a
    // hot key (5/6 of rows on one key, padded so the skewed shuffle
    // partition crosses the lowered threshold)
    val skewed = spark.range(0, 60000L)
      .select(when(col("id") < 50000L, lit(7L))
          .otherwise(pmod(col("id"), lit(100))).as("k"),
        concat(lit("v"), col("id")).as("payload"),
        lit("x" * 100).as("pad"))
    val dim = spark.range(0, 100L).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("dname"))
    withSqlConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = skewed.hint("merge").join(dim, Seq("k"))
      // drive THIS dataset's own queryExecution (count() would plan a
      // separate query and leave j's adaptive plan unfinalized)
      assert(j.collect().length == 60000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join did not fire:\n${finalPlan.take(4000)}")
    }
  }

  test("td67 collocations: broadcast unigram table, top-k is TakeOrdered") {
    val plan = formatted(q("td67_collocations"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q59 range join: banding keeps the pair space an equi-join — no nested loop") {
    val plan = formatted(q("q59_range_join"))
    // the whole point of banding: a raw BETWEEN-pair predicate would fall
    // to BroadcastNestedLoopJoin (O(points × intervals))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "range join lost its equi-join shape")
  }

  test("td70 weighted sample: per-row keys + TakeOrdered, no shuffle before the top-k") {
    val plan = formatted(q("td70_weighted_sample"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      "weighted sample grew a hash shuffle")
  }

  test("graph queries: co-occurrence build and closures stay equi-joins") {
    // the co-purchase self-join must be an equi-join on the order key
    // (bounded groups), PageRank iterations equi-joins on the node id,
    // and the triangle closure two equi-joins over the oriented list —
    // any CartesianProduct/BNLJ here is the O(n²) cliff the degree
    // orientation exists to avoid. (q66's final one-row stats crossJoin
    // of two singleton aggregates is the only BNLJ-free exception and
    // shows up as a broadcast of one row, not a nested loop over data.)
    for (name <- Seq("q65_pagerank", "q66_triangles")) {
      val plan = formatted(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("BroadcastHashJoin"), s"$name lost equi-join shape")
    }
  }

  test("q63 interval coverage: sweep is windows over one sort, no self-join") {
    val plan = formatted(q("q63_interval_coverage"))
    assert(!plan.contains("Join"), "sweep grew a join — the O(n²) shape")
    assert(plan.contains("RunningWindowFunction") ||
      plan.contains("Window"), plan)
  }

  test("q71 incremental view: pure aggregation — no join, partial agg " +
      "before the shuffle") {
    val plan = formatted(q("q71_incremental_view"))
    assert(!plan.contains("Join"),
      "view maintenance grew a join — it must read only view + window")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q72 rollup: subtotal levels come from ONE Expand pass, " +
      "partially aggregated before the single shuffle") {
    val plan = formatted(q("q72_rollup"))
    assert(plan.contains("Expand"), plan)
    // partial then final aggregate — the 4 grouping levels shuffle once,
    // combined map-side, instead of 4 scans of the stream
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Join"))
  }

  test("q73 scd2: version intervals are one key shuffle + lead window, " +
      "never a history self-join") {
    val plan = formatted(q("q73_scd2"))
    assert(!plan.contains("Join"),
      "SCD2 grew a self-join — quadratic on hot keys")
    assert(plan.contains("Window"), plan)
  }

  test("td68 hybrid rerank: candidate join broadcasts, rerank is TakeOrdered") {
    val plan = formatted(q("td68_hybrid_rerank"))
    // the 50-row lexical candidate set must be the broadcast side of the
    // embedding join — the float work never shuffles the corpus
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("td25 snapshot novelty: distinct hash aggs + ONE equi-join on the " +
      "shingle hash — no pair space, no window") {
    val plan = formatted(q("td25_ngram_novelty"))
    assert(!plan.contains("CartesianProduct"), "novelty went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"), "novelty grew a window")
    // the old-snapshot universe joins the new per-group universe as an
    // equi-join (broadcast at gate SF, sort-merge at scale — either is
    // the linear shape)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("REGISTRY-WIDE: no unpartitioned WindowExec over unbounded input " +
      "in any registered query") {
    // The td50/td52 class of defect: row_number() OVER (ORDER BY ...)
    // with no PARTITION BY collapses the whole input onto one task —
    // correct at sf0.1, a single-task sort at 100 TB. An empty partition
    // spec is only acceptable when the window's input is already bounded
    // to a constant row count by a limit (TakeOrderedAndProject /
    // GlobalLimit / CollectLimit below it in the same plan) — the
    // bm25TopK "rank k survivors" shape. Everything else must either
    // PARTITION BY or use Ordering.globalRank.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{CollectLimitExec,
      GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    def bounded(p: SparkPlan): Boolean = p.exists {
      case _: GlobalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _ => false
    }
    // Documented exceptions: the empty-partition window runs over an
    // AGGREGATE of a bounded DIMENSION, so its input cardinality does
    // not grow with corpus bytes — each justified at its definition.
    val dimensionBounded = Set(
      "q18_running_counts", // |hours| — running sum over the time dimension
      "q93_yoy_revenue",    // |years| — lag over yearly rollup
      "td69_vocab_growth",  // block TOTALS (n_docs/1024 narrow rows) —
                            // the two-level prefix sum's top level
      "td80_mixture_alloc", // |sources| — largest-remainder ranking
      "td83_dedup_mixture") // |sources| — same algebra over dedup'd counts
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !dimensionBounded.contains(name)) {
      spark.catalog.clearCache()
      val df = fn(spark, sf())
      df.queryExecution.sparkPlan.foreach {
        case w: WindowExec
            if w.partitionSpec.isEmpty && !bounded(w.child) =>
          offenders += name
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over unbounded input in: " +
        offenders.distinct.sorted.mkString(", "))
  }
}

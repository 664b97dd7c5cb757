package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All engine operators are pure `DataFrame => DataFrame`; these helpers are
  * the only place that knows the on-disk layout. At 100 TB the same loaders
  * would point at a partitioned data lake — parquet scans with predicate
  * pushdown and column pruning are preserved because every downstream op is
  * declarative (no collect, no RDD round-trips).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Drop orphaned cached/localCheckpoint'd RDD blocks and cached plans.
    * Bench and Verify call this between queries — re-invoking a query fn
    * re-creates its checkpoints, and the previous generation would
    * otherwise stay pinned until the heap fills and late queries measure
    * GC instead of their plan.
    */
  def dropCachedBlocks(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  /** `events.ts` normalization — the driver has shipped the column under
    * several parquet annotations across rounds (TIMESTAMP(NANOS), which
    * Spark does not model natively; plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ). Every
    * downstream query treats `ts` as session-TZ micros (TIMESTAMP_LTZ,
    * `unix_micros`-able), and every entry point pins the session TZ to
    * UTC, so both normalizations below are value-identical to what DuckDB
    * sees on the same file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos epoch as long; integer div (ts/1000 in Column algebra is
        // DOUBLE division, which loses precision at 1.7e18 ns epochs)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ → LTZ: under the UTC session TZ the wall-clock micros ARE
        // the epoch micros, so the cast relabels without shifting values
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Hash-spread a narrow scan before CPU-heavy per-row work.
    *
    * A parquet file smaller than `spark.sql.files.maxPartitionBytes` (or
    * with one row group) yields ONE scan task, so everything up to the
    * first Exchange — per-row codecs, tokenizers, hashing — serializes on
    * a single core while the rest of the cluster idles (opt guide §2.5,
    * "input skew: one huge unsplittable file → repartition immediately
    * after the read"). When the scan is already at least as wide as the
    * session's parallelism (the 100 TB layout: thousands of splits), this
    * is a no-op — no payload shuffle is added at scale. Hash partitioning
    * on a real key keeps the row→partition map deterministic under task
    * retry (round-robin repartition is not, SPARK-38388) and adds no
    * pre-shuffle sort.
    */
  def spread(df: DataFrame, key: String): DataFrame = {
    // escape hatch + A/B toggle (graft.AbSpread interleaves both arms in
    // one session so host-load noise cannot masquerade as a delta)
    if (df.sparkSession.conf.get("spark.graft.spread", "on") == "off")
      return df
    // r17 hardening (ADVICE): the width probe below builds `df.rdd`,
    // which under AQE EXECUTES any upstream exchange eagerly — and the
    // real query then re-executes it (no reuse across executions). Every
    // call site passes a plain scan/filter/projection, but spread() is
    // embedded in generic helpers; guard structurally instead of by
    // convention: any shuffle-inducing operator in the analyzed plan →
    // no-op (those inputs are post-exchange and already wide or
    // AQE-managed anyway).
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffleInducing = df.queryExecution.analyzed.collectFirst {
      case n @ (_: Aggregate | _: Join | _: Window | _: Sort |
                _: Distinct | _: GlobalLimit | _: RepartitionOperation) => n
    }.isDefined
    if (shuffleInducing) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, org.apache.spark.sql.functions.col(key))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")

  /** NOTE (r16 opt): a `spread` here was tried — the ANN queries' fat
    * stages are single-task broadcast builds inheriting this one-file
    * scan's width — but measured SLOWER interleaved on the deep IVF-PQ
    * chains (td110 min 5.0→7.3: every duplicated broadcast subtree
    * re-executes the added exchange, and AQE coalesces the tiny
    * post-shuffle stage back to one task anyway). Left on scan width.
    */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

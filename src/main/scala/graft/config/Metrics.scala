package graft.config

import java.util.concurrent.atomic.{AtomicLong, DoubleAdder, LongAdder}
import scala.collection.concurrent.TrieMap

/** Prometheus metrics for the running plane — the reference's registry +
  * exporter (`/root/reference/lib/sequin/metrics/prometheus.ex:1-605`
  * declares the metric families; `prometheus_exporter.ex` mounts the
  * text-format scrape endpoint). Same metric names, same label sets, so
  * dashboards written against the reference scrape unchanged.
  *
  * The Spark rendition has three feeds:
  *   - the DELIVERY path: [[Metrics.Registry.recordOutcomes]] folds a
  *     [[graft.sinks.SinkDispatch]] outcome batch into
  *     attempt/success/failure counters and delivered bytes;
  *   - the STREAMING path: [[Metrics.listener]] is a
  *     `StreamingQueryListener` that turns each micro-batch progress
  *     event into ingested-message counts and batch latency
  *     observations — attach it with
  *     `spark.streams.addListener(Metrics.listener(registry, ...))`;
  *   - direct setters for the replication client (ingestion latency).
  *
  * Exposition is Prometheus text format 0.0.4 (`# HELP` / `# TYPE`,
  * histograms with cumulative `_bucket{le=...}` + `_sum` + `_count`),
  * served at `GET /metrics` on the management listener, outside the
  * authenticated pipeline like the reference's PlugExporter mount.
  */
object Metrics {

  /** Histogram bucket bounds in microseconds (latency families). */
  val LatencyBucketsUs: Vector[Double] =
    Vector(1e3, 1e4, 1e5, 1e6, 1e7)

  private final case class Key(name: String, labels: Vector[(String, String)])

  private final class Histo(buckets: Vector[Double]) {
    val counts = Array.fill(buckets.length + 1)(new LongAdder)
    val sum = new DoubleAdder
    val n = new LongAdder
    def observe(v: Double): Unit = {
      var i = 0
      while (i < buckets.length && v > buckets(i)) i += 1
      counts(i).increment(); sum.add(v); n.increment()
    }
  }

  final class Registry {
    private val counters = TrieMap.empty[Key, LongAdder]
    // gauges are SET, not accumulated: an AtomicLong of doubleToLongBits
    // makes the write atomic — the previous reset+add on a DoubleAdder
    // let a concurrent scrape observe 0 or a doubled value
    private val gauges = TrieMap.empty[Key, AtomicLong]
    private val histos = TrieMap.empty[Key, Histo]
    // name → (type, help), declared lazily on first touch
    private val families = TrieMap.empty[String, (String, String)]

    private def declare(name: String, typ: String, help: String): Unit = {
      families.putIfAbsent(name, (typ, help)); ()
    }

    def inc(name: String, labels: Seq[(String, String)], by: Long = 1L,
        help: String = ""): Unit = {
      declare(name, "counter", help)
      counters.getOrElseUpdate(Key(name, labels.toVector), new LongAdder)
        .add(by)
    }

    def set(name: String, labels: Seq[(String, String)], v: Double,
        help: String = ""): Unit = {
      declare(name, "gauge", help)
      gauges.getOrElseUpdate(Key(name, labels.toVector), new AtomicLong)
        .set(java.lang.Double.doubleToLongBits(v))
    }

    def observe(name: String, labels: Seq[(String, String)], v: Double,
        help: String = ""): Unit = {
      declare(name, "histogram", help)
      histos.getOrElseUpdate(Key(name, labels.toVector),
        new Histo(LatencyBucketsUs)).observe(v)
    }

    // ---- the reference's metric surface (prometheus.ex) ----------------

    // per-consumer per-second processed buckets backing the console's
    // throughput timeseries (the reference computes the same series
    // from Redis-sorted samples —
    // metrics.ex `get_consumer_messages_processed_throughput_timeseries
    // _smoothed`); bounded: buckets older than retentionSec are dropped
    // on every write
    private val seriesRetentionSec = 150L
    private val series =
      TrieMap.empty[String, java.util.TreeMap[java.lang.Long, Long]]

    private def recordSeries(consumerId: String, n: Long,
        nowSec: Long): Unit = if (n > 0) {
      val m = series.getOrElseUpdate(consumerId,
        new java.util.TreeMap[java.lang.Long, Long]())
      m.synchronized {
        m.merge(nowSec, n, (a, b) => a + b)
        val cutoff = nowSec - seriesRetentionSec
        while (!m.isEmpty && m.firstKey() < cutoff) m.pollFirstEntry()
      }
    }

    /** Messages-processed throughput, per-second over the trailing
      * `windows` seconds, smoothed with a trailing mean of
      * `smoothing` buckets — the series the reference's console
      * sparklines render (sink_consumers/index.ex:
      * `@timeseries_window_count 60`, `@smoothing_window 5`).
      */
    def throughputTimeseries(consumerId: String, windows: Int = 60,
        smoothing: Int = 5,
        nowSec: Long = System.currentTimeMillis() / 1000L): Vector[Double] = {
      val m = series.get(consumerId)
      val raw = new Array[Double](windows + smoothing)
      m.foreach { tm =>
        tm.synchronized {
          var i = 0
          while (i < raw.length) {
            val sec = nowSec - (raw.length - 1 - i)
            raw(i) = Option(tm.get(java.lang.Long.valueOf(sec)))
              .map(_.toDouble).getOrElse(0.0)
            i += 1
          }
        }
      }
      Vector.tabulate(windows) { j =>
        var s = 0.0
        var k = 0
        while (k < smoothing) { s += raw(j + k + 1); k += 1 }
        s / smoothing
      }
    }

    /** Sum of one counter family over all label sets containing the
      * given (label, value) pair — the console's per-consumer rollup
      * read (the reference reads the same counters back from Redis,
      * metrics.ex `get_consumer_messages_processed_count`).
      */
    def counterSum(name: String, label: (String, String)): Long =
      counters.iterator.collect {
        case (k, v) if k.name == name && k.labels.contains(label) =>
          v.sum()
      }.sum

    /** `increment_message_deliver_attempt/success/failure`
      * (prometheus.ex:308-322) + delivered bytes (:178) from one
      * SinkDispatch outcome batch.
      */
    def recordOutcomes(consumerId: String, consumerName: String,
        outcomes: Seq[graft.sinks.SinkDispatch.Outcome],
        bytes: Long = 0L): Unit = {
      val l = Seq("consumer_id" -> consumerId,
        "consumer_name" -> consumerName)
      recordSeries(consumerId, outcomes.count(_.ok).toLong,
        System.currentTimeMillis() / 1000L)
      inc("sequin_message_deliver_attempt_count", l, outcomes.size.toLong,
        "Total number of message delivery attempts.")
      inc("sequin_message_deliver_success_count", l,
        outcomes.count(_.ok).toLong,
        "Total number of successful message deliveries.")
      inc("sequin_message_deliver_failure_count", l,
        outcomes.count(!_.ok).toLong,
        "Total number of failed message deliveries.")
      if (bytes > 0)
        inc("sequin_bytes_delivered_total", l, bytes,
          "Total number of bytes delivered.")
    }

    /** `observe_delivery_latency` (prometheus.ex:345-354). */
    def observeDeliveryLatencyUs(consumerId: String, consumerName: String,
        success: Boolean, us: Double): Unit =
      observe("sequin_delivery_latency_us",
        Seq("consumer_id" -> consumerId, "consumer_name" -> consumerName,
          "success" -> success.toString), us,
        "The delivery latency in microseconds.")

    /** `observe_ingestion_latency` (prometheus.ex:334-338). */
    def setIngestionLatencyUs(slotId: String, slotName: String,
        us: Double): Unit =
      set("sequin_ingestion_latency_us",
        Seq("replication_slot_id" -> slotId, "slot_name" -> slotName), us,
        "The ingestion latency between Postgres and the plane in microseconds.")

    /** `sequin_messages_ingested_count` (prometheus.ex:57-61). */
    def incMessagesIngested(slotId: String, slotName: String,
        n: Long): Unit =
      inc("sequin_messages_ingested_count",
        Seq("replication_slot_id" -> slotId, "slot_name" -> slotName), n,
        "Total number of messages ingested.")

    /** VM-level gauges (the reference's SystemMetricsServer /
      * ProcessMetrics: run queue, CPU load, scheduler utilization logged
      * every 30 s) — the JVM analogs snapshot on demand so every scrape
      * carries fresh values: heap used/max, cumulative GC count/time,
      * live threads, OS load average, available processors.
      */
    def snapshotSystemMetrics(): Unit = {
      import java.lang.management.ManagementFactory
      val mem = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      set("graft_jvm_heap_used_bytes", Seq.empty, mem.getUsed.toDouble,
        "JVM heap in use.")
      set("graft_jvm_heap_max_bytes", Seq.empty, mem.getMax.toDouble,
        "JVM heap ceiling.")
      var gcCount = 0L; var gcMs = 0L
      ManagementFactory.getGarbageCollectorMXBeans.forEach { gc =>
        if (gc.getCollectionCount >= 0) gcCount += gc.getCollectionCount
        if (gc.getCollectionTime >= 0) gcMs += gc.getCollectionTime
      }
      set("graft_jvm_gc_collections", Seq.empty, gcCount.toDouble,
        "Cumulative GC collections.")
      set("graft_jvm_gc_time_ms", Seq.empty, gcMs.toDouble,
        "Cumulative GC time in milliseconds.")
      set("graft_jvm_threads", Seq.empty,
        ManagementFactory.getThreadMXBean.getThreadCount.toDouble,
        "Live JVM threads.")
      val os = ManagementFactory.getOperatingSystemMXBean
      val load = os.getSystemLoadAverage
      if (load >= 0)
        set("graft_os_load_average", Seq.empty, load,
          "1-minute OS load average (the run-queue signal).")
      set("graft_os_processors", Seq.empty,
        os.getAvailableProcessors.toDouble, "Available processors.")
    }

    // ---- exposition ----------------------------------------------------

    private def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

    private def fmtLabels(ls: Vector[(String, String)],
        extra: Option[(String, String)] = None): String = {
      val all = ls ++ extra.toVector
      if (all.isEmpty) ""
      else all.map { case (k, v) => s"""$k="${esc(v)}"""" }
        .mkString("{", ",", "}")
    }

    private def fmtD(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else d.toString

    /** Text format 0.0.4. Families sort by name, series by labels —
      * deterministic scrapes, diff-able in tests.
      */
    def exposition(): String = {
      val sb = new StringBuilder
      families.toVector.sortBy(_._1).foreach { case (name, (typ, help)) =>
        if (help.nonEmpty) sb.append(s"# HELP $name ${esc(help)}\n")
        sb.append(s"# TYPE $name $typ\n")
        typ match {
          case "counter" =>
            counters.toVector.filter(_._1.name == name)
              .sortBy(_._1.labels.toString).foreach { case (k, v) =>
                sb.append(s"$name${fmtLabels(k.labels)} ${v.sum()}\n")
              }
          case "gauge" =>
            gauges.toVector.filter(_._1.name == name)
              .sortBy(_._1.labels.toString).foreach { case (k, v) =>
                sb.append(s"$name${fmtLabels(k.labels)} " +
                  s"${fmtD(java.lang.Double.longBitsToDouble(v.get()))}\n")
              }
          case "histogram" =>
            histos.toVector.filter(_._1.name == name)
              .sortBy(_._1.labels.toString).foreach { case (k, h) =>
                var cum = 0L
                LatencyBucketsUs.zipWithIndex.foreach { case (b, i) =>
                  cum += h.counts(i).sum()
                  sb.append(s"${name}_bucket${fmtLabels(k.labels,
                    Some("le" -> fmtD(b)))} $cum\n")
                }
                cum += h.counts(LatencyBucketsUs.length).sum()
                sb.append(s"${name}_bucket${fmtLabels(k.labels,
                  Some("le" -> "+Inf"))} $cum\n")
                sb.append(s"${name}_sum${fmtLabels(k.labels)} " +
                  s"${fmtD(h.sum.sum())}\n")
                sb.append(s"${name}_count${fmtLabels(k.labels)} ${h.n.sum()}\n")
              }
        }
      }
      sb.toString
    }
  }

  /** Streaming feed: each micro-batch progress event increments the
    * slot's ingested-message counter and observes the batch's internal
    * latency — the Spark analog of the reference's telemetry handlers
    * (prometheus.ex:275-306 fold Ecto/GenStage telemetry the same way).
    */
  def listener(reg: Registry, slotId: String,
      slotName: String): org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0)
          reg.incMessagesIngested(slotId, slotName, p.numInputRows)
        Option(p.durationMs.get("triggerExecution")).foreach(ms =>
          reg.observe("sequin_internal_latency_us",
            Seq("replication_slot_id" -> slotId, "slot_name" -> slotName),
            ms.toDouble * 1000.0,
            "The internal processing latency in microseconds."))
      }
    }
}

package graft.streaming

/** Per-consumer ring buffer of recent pipeline decisions — the Spark
  * re-expression of the reference's consumer trace
  * (`lib/sequin/runtime/trace.ex:1-172`). The reference publishes trace
  * events over Phoenix PubSub for the console's live trace view; the
  * debugging need it serves ("why is this consumer stuck — what did it
  * just match, filter, deliver, ack?") is met here by a bounded
  * in-memory ring per consumer that the management API reads on demand
  * (`GET /api/sinks/:name/trace`). Events carry the reference Event's
  * external shape — status (info/warning/error), message, extra map,
  * published_at — minus the req/resp pair, which sinks record as
  * flattened `extra` entries instead.
  *
  * Scale stance: the ring is driver-local and O(capacity) — tracing
  * never touches executors, adds no Spark action (batch counts ride an
  * `Observation` on the delivery action itself), and a hot consumer
  * simply wraps the ring faster.
  */
object Trace {

  final case class Event(status: String, message: String,
      extra: Map[String, String], publishedAtMs: Long)

  /** Fixed-capacity overwrite-oldest buffer; reads return newest first. */
  final class Ring(val capacity: Int = 256) {
    private val buf = new Array[Event](capacity)
    private var written = 0L

    def publish(e: Event): Unit = this.synchronized {
      buf((written % capacity).toInt) = e
      written += 1
    }

    def recent(n: Int): Seq[Event] = this.synchronized {
      val have = math.min(written, capacity.toLong).toInt
      (1 to math.min(n, have)).map(i =>
        buf(((written - i) % capacity).toInt))
    }

    def size: Int = this.synchronized(math.min(written, capacity.toLong).toInt)
  }

  private val rings =
    new java.util.concurrent.ConcurrentHashMap[String, Ring]()

  private def ring(consumerId: String): Ring =
    rings.computeIfAbsent(consumerId, _ => new Ring())

  private def publish(consumerId: String, status: String, message: String,
      extra: Seq[(String, String)]): Unit =
    ring(consumerId).publish(Event(status, message, extra.toMap,
      System.currentTimeMillis()))

  def info(consumerId: String, message: String,
      extra: (String, String)*): Unit =
    publish(consumerId, "info", message, extra)

  def warning(consumerId: String, message: String,
      extra: (String, String)*): Unit =
    publish(consumerId, "warning", message, extra)

  def error(consumerId: String, message: String,
      extra: (String, String)*): Unit =
    publish(consumerId, "error", message, extra)

  /** Newest-first recent events for a consumer (empty if never traced). */
  def recent(consumerId: String, n: Int = 100): Seq[Event] =
    Option(rings.get(consumerId)).fold(Seq.empty[Event])(_.recent(n))

  /** Drop a consumer's ring (delete/stop lifecycle). */
  def clear(consumerId: String): Unit = { rings.remove(consumerId); () }
}

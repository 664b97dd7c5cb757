package graft.config

import scala.collection.concurrent.TrieMap

/** The per-entity health subsystem — the check/event machinery behind the
  * reference's console badges and `/health` endpoint
  * (`/root/reference/lib/sequin/health/health.ex`: events are `put_event`ed
  * with a 5s debounce, checks aggregate events per entity kind with
  * dependency laddering, entity status folds checks through a fixed
  * precedence; `health/check.ex:10` status taxonomy).
  *
  * The Spark rendition keeps the same three layers:
  *   - EVENTS: `putEvent(kind, id, slug, status)` — raw signals from the
  *     runtime (a replication client connecting, a delivery acking, an
  *     HTTP endpoint probe), debounced so a hot loop of identical
  *     statuses is one write (health.ex:88 `@debounce_window 5s`);
  *   - CHECKS: per-kind aggregation with the reference's laddering — an
  *     erroring prerequisite forces dependent checks to `initializing`
  *     (health.ex:360-414);
  *   - STATUS: `paused > error > stale > warning > initializing >
  *     waiting > healthy` (health.ex:160-168).
  *
  * Batch integration: [[Health.Registry.ingestSnapshot]] folds the
  * q41-shaped per-table snapshot (counts + last event time) into
  * `messages_ingested` events, so a scheduled batch job feeds the same
  * surface the streaming listeners do.
  */
object Health {

  /** check.ex:10. */
  val CheckStatuses: Set[String] = Set("healthy", "error", "warning",
    "waiting", "initializing", "stale", "notice")

  /** health.ex:66. */
  val EntityStatuses: Set[String] = Set("healthy", "warning", "error",
    "initializing", "waiting", "paused")

  val EntityKinds: Set[String] = Set("postgres_replication_slot",
    "sink_consumer", "http_endpoint", "wal_pipeline", "system")

  /** Expected check slugs per entity kind, in render order
    * (health.ex:360-423).
    */
  val KindChecks: Map[String, Vector[String]] = Map(
    "postgres_replication_slot" -> Vector("reachable",
      "replication_configuration", "replication_connected",
      "replication_messages"),
    "sink_consumer" -> Vector("sink_configuration", "messages_filtered",
      "messages_ingested", "messages_pending_delivery",
      "messages_delivered"),
    "http_endpoint" -> Vector("endpoint_reachable"),
    "wal_pipeline" -> Vector("messages_filtered", "messages_ingested",
      "destination_insert"),
    // infra-level probes (check_system_health.ex:1-70 pings the system
    // Postgres + Redis and distinguishes can't-reach from can't-use; the
    // Spark plane's infra is the checkpoint volume, the WAL spool volume
    // and the sink transport endpoint)
    "system" -> Vector("checkpoint_dir_writable", "spool_dir_readable",
      "transport_reachable"))

  final case class Event(slug: String, status: String, atMs: Long,
      error: Option[String], lastHealthyAtMs: Option[Long],
      erroringSinceMs: Option[Long])

  final case class Check(slug: String, status: String,
      error: Option[String], lastHealthyAtMs: Option[Long],
      erroringSinceMs: Option[Long])

  final case class EntityHealth(entityKind: String, entityId: String,
      status: String, checks: Vector[Check],
      lastHealthyAtMs: Option[Long], erroringSinceMs: Option[Long])

  /** In-memory event store + check computation (the reference keeps
    * events in Redis; a library embedding holds them on the management
    * plane's JVM — same shapes, same aggregation).
    */
  final class Registry(nowMs: () => Long = () => System.currentTimeMillis()) {

    private val DebounceMs = 5000L // health.ex:88

    // (kind, id, slug) → latest event
    private val events = TrieMap.empty[(String, String, String), Event]
    private val paused = TrieMap.empty[(String, String), Boolean]

    /** Record a signal. Repeated same-status writes inside the debounce
      * window are dropped (the hot-loop discipline); a STATUS CHANGE
      * always lands. `success`/`fail`/`warning` map onto check statuses
      * like the reference's event statuses.
      */
    def putEvent(kind: String, id: String, slug: String, status: String,
        error: Option[String] = None): Unit = {
      require(EntityKinds.contains(kind), s"unknown entity kind: $kind")
      require(KindChecks(kind).contains(slug),
        s"unknown check slug for $kind: $slug")
      val st = status match {
        case "success" => "healthy"
        case "fail"    => "error"
        case other     =>
          require(CheckStatuses.contains(other),
            s"unknown event status: $other")
          other
      }
      val now = nowMs()
      val key = (kind, id, slug)
      events.get(key) match {
        case Some(prev) if prev.status == st && now - prev.atMs < DebounceMs =>
          () // debounced
        case prev =>
          val lastHealthy =
            if (st == "healthy") Some(now)
            else prev.flatMap(_.lastHealthyAtMs)
          val erroringSince =
            if (st == "error")
              prev.flatMap(_.erroringSinceMs)
                .filter(_ => prev.exists(_.status == "error"))
                .orElse(Some(now))
            else None
          events.put(key,
            Event(slug, st, now, error, lastHealthy, erroringSince))
          ()
      }
    }

    /** Pause/resume an entity (`paused?` — slot `status == :disabled`,
      * consumer `:disabled | :paused`, health.ex:215-221).
      */
    def setPaused(kind: String, id: String, isPaused: Boolean): Unit = {
      paused.put((kind, id), isPaused); ()
    }

    private def checkOf(kind: String, id: String, slug: String,
        base: String): Check =
      events.get((kind, id, slug)) match {
        case Some(e) =>
          Check(slug, e.status, e.error, e.lastHealthyAtMs, e.erroringSinceMs)
        case None => Check(slug, base, None, None, None)
      }

    /** Aggregated health with the reference's dependency laddering
      * (health.ex:360-414): an erroring prerequisite renders its
      * dependents `initializing` instead of their own state.
      */
    def health(kind: String, id: String): EntityHealth = {
      require(EntityKinds.contains(kind), s"unknown entity kind: $kind")
      val slugs = KindChecks(kind)
      val raw = kind match {
        case "postgres_replication_slot" =>
          val ladder = slugs.map(checkOf(kind, id, _, "initializing"))
          // first erroring rung wins; everything after it initializes
          val cut = ladder.indexWhere(c =>
            c.status == "error" || c.status == "notice")
          if (cut >= 0 && cut < ladder.length - 1)
            ladder.take(cut + 1) ++
              ladder.drop(cut + 1).map(c =>
                Check(c.slug, "initializing", None, None, None))
          else ladder
        case "sink_consumer" =>
          val config = checkOf(kind, id, slugs.head, "initializing")
          if (config.status == "error")
            config +: slugs.tail.map(s =>
              Check(s, "initializing", None, None, None))
          else {
            // messages_filtered / messages_pending_delivery default to
            // `waiting` before their first event (health.ex:397-400)
            config +: slugs.tail.map { s =>
              val base =
                if (s == "messages_filtered" ||
                  s == "messages_pending_delivery") "waiting"
                else "initializing"
              checkOf(kind, id, s, base)
            }
          }
        case _ => slugs.map(checkOf(kind, id, _, "initializing"))
      }
      val status =
        if (paused.getOrElse((kind, id), false)) "paused"
        else if (raw.exists(_.status == "error")) "error"
        else if (raw.exists(_.status == "stale")) "warning"
        else if (raw.exists(_.status == "warning")) "warning"
        else if (raw.exists(_.status == "initializing")) "initializing"
        else if (raw.exists(_.status == "waiting")) "waiting"
        else "healthy"
      EntityHealth(kind, id, status, raw,
        raw.flatMap(_.lastHealthyAtMs).maxOption,
        raw.flatMap(_.erroringSinceMs).minOption)
    }

    /** Forget an entity entirely — called when its resource is DELETED
      * (a removed replication/sink must not live on as a phantom row in
      * `/api/health`, nor keep `/health` erroring over a resource that
      * no longer exists).
      */
    def removeEntity(kind: String, id: String): Unit = {
      events.keysIterator.filter(k => k._1 == kind && k._2 == id)
        .toVector.foreach(events.remove)
      paused.remove((kind, id))
      ()
    }

    /** Every entity that has ever reported (or been paused), per kind. */
    def entities(): Vector[(String, String)] =
      (events.keysIterator.map(k => (k._1, k._2)) ++ paused.keysIterator)
        .toVector.distinct.sorted

    /** System verdict for `GET /health`
      * (`health_check_controller.ex:24-33`): ok unless some entity is
      * erroring; the first erroring entity is named in the error.
      */
    def system(): Either[String, Unit] = {
      val bad = entities().iterator
        .map { case (k, i) => health(k, i) }
        .find(_.status == "error")
      bad match {
        case Some(h) =>
          // name the failing CHECK too (check_system_health.ex returns a
          // per-service error, not just "unhealthy") so the LB probe body
          // says what to fix
          val failing = h.checks.find(_.status == "error")
          val detail = failing.map(c =>
            s" (${c.slug}${c.error.map(e => s": $e").getOrElse("")})")
            .getOrElse("")
          Left(s"${h.entityKind} ${h.entityId} is erroring$detail")
        case None => Right(())
      }
    }

    /** Fold a q41-shaped batch snapshot (rows with `table_schema`,
      * `table_name`, `n`, `last_event_us`) into `messages_ingested`
      * events for per-table sink-consumer entities — the batch job's
      * path onto the same health surface the streaming listeners feed.
      * Tables with zero rows in the window report `warning` (ingestion
      * observed nothing), matching the check-worker discipline of
      * always writing SOMETHING.
      */
    /** Run the infra-level probes once and record their verdicts on the
      * `system` entity (`check_system_health.ex:1-70` shape: each
      * dependency actively exercised — not just pinged — and failures
      * carry a can't-reach vs can't-use distinction where possible).
      * Probes:
      *   - `checkpoint_dir_writable`: create + delete a marker file (a
      *     read-only or missing checkpoint volume kills every stateful
      *     stream at its next commit — fail BEFORE the streams do);
      *   - `spool_dir_readable`: the WAL spool directory lists;
      *   - `transport_reachable`: TCP connect to the sink transport.
      * Unconfigured probes record `healthy` vacuously is WRONG — they
      * are simply skipped, so the check shows its base state and the
      * surface never claims a probe it did not run.
      */
    def runSystemProbes(
        checkpointDir: Option[String] = None,
        spoolDir: Option[String] = None,
        transport: Option[(String, Int)] = None,
        connectTimeoutMs: Int = 2000): Unit = {
      checkpointDir.foreach { dir =>
        val verdict =
          try {
            val d = java.nio.file.Paths.get(dir)
            if (!java.nio.file.Files.isDirectory(d))
              Some(s"checkpoint dir is not a directory: $dir")
            else {
              val probe = java.nio.file.Files.createTempFile(d,
                ".graft_health_probe", "")
              java.nio.file.Files.delete(probe)
              None
            }
          } catch { case e: Exception =>
            Some(s"checkpoint dir not writable: ${e.getMessage}") }
        putEvent("system", "system", "checkpoint_dir_writable",
          verdict.fold("success")(_ => "fail"), verdict)
      }
      spoolDir.foreach { dir =>
        val verdict =
          try {
            val d = java.nio.file.Paths.get(dir)
            if (!java.nio.file.Files.isDirectory(d))
              Some(s"spool dir is not a directory: $dir")
            else {
              val st = java.nio.file.Files.list(d)
              try { st.count(); () } finally st.close()
              None
            }
          } catch { case e: Exception =>
            Some(s"spool dir not readable: ${e.getMessage}") }
        putEvent("system", "system", "spool_dir_readable",
          verdict.fold("success")(_ => "fail"), verdict)
      }
      transport.foreach { case (host, port) =>
        val verdict =
          try {
            val sock = new java.net.Socket()
            try sock.connect(
              new java.net.InetSocketAddress(host, port), connectTimeoutMs)
            finally sock.close()
            None
          } catch { case e: Exception =>
            Some(s"transport $host:$port unreachable: ${e.getMessage}") }
        putEvent("system", "system", "transport_reachable",
          verdict.fold("success")(_ => "fail"), verdict)
      }
    }

    def ingestSnapshot(snapshot: org.apache.spark.sql.DataFrame): Unit =
      snapshot.select("table_schema", "table_name", "n").collect()
        .foreach { r =>
          val id = s"${r.getString(0)}.${r.getString(1)}"
          val n = r.getLong(2)
          putEvent("sink_consumer", id, "messages_ingested",
            if (n > 0) "success" else "warning",
            if (n > 0) None else Some("no messages ingested in window"))
        }
  }
}

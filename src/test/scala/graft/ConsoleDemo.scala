package graft.config

/** Throwaway manual-QA main: stands up a populated management plane and
  * prints the console address. Not a test; run with
  * `sbt "Test/runMain graft.config.ConsoleDemo"`.
  */
object ConsoleDemo {
  def main(args: Array[String]): Unit = {
    val api = new ManagementApi
    val tok = api.bootstrapToken
    val p = api.port()
    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String): Int = {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$p$path"))
        .header("Authorization", s"Bearer $tok")
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    }
    post("/api/sinks",
      """{"name":"orders-to-kafka","source":{"include_schemas":["public"]},
        |"batch_size":100,"filter_function":"record_value > 10",
        |"destination":{"type":"kafka","topic":"orders"}}""".stripMargin)
    post("/api/sinks",
      """{"name":"audit-mirror","source":{"include_schemas":["public"]},
        |"low_latency":true,"low_latency_shards":8,
        |"destination":{"type":"redis_stream","stream_key":"audit"}}"""
        .stripMargin)
    api.databases.put("appdb", api.DatabaseRec("appdb", "db.internal",
      5432, "app", "svc", "hunter22", "graft_slot", "graft_pub",
      tables = Vector(api.TableRec("public", "orders", 16385L,
        Vector(api.ColumnRec(1, "id", "bigint", isPk = true),
          api.ColumnRec(2, "total_cents", "bigint", isPk = false),
          api.ColumnRec(3, "note", "text", isPk = false))))))
    api.health.putEvent("sink_consumer", "orders-to-kafka",
      "sink_configuration", "success")
    api.health.putEvent("sink_consumer", "orders-to-kafka",
      "messages_delivered", "success")
    api.health.putEvent("sink_consumer", "audit-mirror",
      "messages_delivered", "fail", Some("connection refused"))
    val rnd = new scala.util.Random(7)
    (0 until 60).foreach { i =>
      api.metrics.recordOutcomes("orders-to-kafka", "orders-to-kafka",
        (1 to (40 + rnd.nextInt(60))).map(j =>
          graft.sinks.SinkDispatch.Outcome(s"a$i-$j", "g", ok = true, "")),
        bytes = 2048L)
      Thread.sleep(50)
    }
    graft.streaming.Trace.info("orders-to-kafka", "batch processed",
      "received" -> "100", "delivered" -> "100")
    graft.streaming.Trace.warning("orders-to-kafka",
      "endpoint slow, backing off", "delay_ms" -> "250")
    println(s"CONSOLE_URL=http://127.0.0.1:$p/ TOKEN=$tok")
    Thread.sleep(600000)
  }
}

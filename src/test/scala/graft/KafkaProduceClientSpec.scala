package graft

import graft.model.Cdc
import graft.sinks.{KafkaProduceClient, SinkAdapters}
import graft.sinks.KafkaProduceClient.KafkaRequest
import java.io.{BufferedInputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The Kafka produce client against a scripted loopback broker whose
  * INDEPENDENT decoder re-parses everything the client sends: framing,
  * request header v1, Produce v3 fields, and the v2 record batch —
  * magic byte, RECOMPUTED CRC32C compared against the stored one, and
  * zigzag-varint record decoding. The encoder is thereby checked
  * against the public format spec, not against its own mirror.
  * Zero egress: 127.0.0.1 only.
  */
class KafkaProduceClientSpec extends SparkSpec {

  private final case class Rec(topic: String, key: Option[String], value: String)

  private final class ScriptedBroker(failTopics: Map[String, Short] = Map.empty) {
    val records = new ConcurrentLinkedQueue[Rec]()
    val crcChecks = new ConcurrentLinkedQueue[Boolean]()
    @volatile var sawClientId = ""
    @volatile var sawAcks: Int = 999
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    @volatile private var running = true
    private var nextOffset = 1000L

    // independent zigzag varint decoder
    private def readVarint(b: ByteBuffer): Long = {
      var x = 0L; var shift = 0; var cur = 0L
      do {
        cur = b.get() & 0xFF
        x |= (cur & 0x7F) << shift
        shift += 7
      } while ((cur & 0x80) != 0)
      (x >>> 1) ^ -(x & 1)
    }

    private def readStr(b: ByteBuffer): String = {
      val n = b.getShort
      val arr = new Array[Byte](n); b.get(arr)
      new String(arr, UTF_8)
    }

    private val thread = new Thread(() => {
      while (running) {
        var sock: Socket = null
        try {
          sock = server.accept()
          val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
          val out = new DataOutputStream(sock.getOutputStream)
          while (true) {
            val len = in.readInt()
            val body = new Array[Byte](len); in.readFully(body)
            val b = ByteBuffer.wrap(body)
            val apiKey = b.getShort; val apiVer = b.getShort
            require(apiKey == 0 && apiVer == 3, s"api $apiKey v$apiVer")
            val corr = b.getInt
            sawClientId = readStr(b)
            val txnLen = b.getShort; require(txnLen == -1, "txn id must be null")
            sawAcks = b.getShort.toInt
            b.getInt // timeout
            require(b.getInt == 1)
            val topic = readStr(b)
            require(b.getInt == 1)
            val partition = b.getInt
            val batchLen = b.getInt
            val batch = new Array[Byte](batchLen); b.get(batch)
            // ---- decode the v2 record batch ----
            val rb = ByteBuffer.wrap(batch)
            rb.getLong            // baseOffset
            val blen = rb.getInt  // batchLength (rest)
            require(blen == batch.length - 12, s"batchLength $blen")
            rb.getInt             // partitionLeaderEpoch
            require(rb.get() == 2.toByte, "magic must be 2")
            val storedCrc = rb.getInt
            val after = new Array[Byte](rb.remaining()); rb.get(after)
            val crc = new java.util.zip.CRC32C(); crc.update(after)
            crcChecks.add(crc.getValue.toInt == storedCrc)
            val ab = ByteBuffer.wrap(after)
            ab.getShort           // attributes
            ab.getInt             // lastOffsetDelta
            ab.getLong; ab.getLong
            ab.getLong; ab.getShort; ab.getInt
            val n = ab.getInt
            (0 until n).foreach { _ =>
              readVarint(ab)      // record length
              ab.get()            // attributes
              readVarint(ab)      // ts delta
              readVarint(ab)      // offset delta
              val kl = readVarint(ab)
              val key = if (kl < 0) None else {
                val arr = new Array[Byte](kl.toInt); ab.get(arr)
                Some(new String(arr, UTF_8))
              }
              val vl = readVarint(ab)
              val varr = new Array[Byte](vl.toInt); ab.get(varr)
              val hc = readVarint(ab)
              require(hc == 0, "unexpected headers")
              records.add(Rec(topic, key, new String(varr, UTF_8)))
            }
            // ---- respond (v3) ----
            val err: Short = failTopics.getOrElse(topic, 0.toShort)
            val base = nextOffset; if (err == 0) nextOffset += n
            val tb = topic.getBytes(UTF_8)
            val resp = ByteBuffer.allocate(4 + 4 + 2 + tb.length + 4 +
                4 + 2 + 8 + 8 + 4)
              .putInt(corr)
              .putInt(1).putShort(tb.length.toShort).put(tb)
              .putInt(1)
              .putInt(partition).putShort(err).putLong(base)
              .putLong(-1L)     // log_append_time
              .putInt(0)        // throttle_time_ms
              .array()
            out.writeInt(resp.length); out.write(resp); out.flush()
          }
        } catch { case _: Exception => if (sock != null) sock.close() }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; server.close() }
  }

  test("record batches decode spec-correct on the broker side: magic 2, CRC32C verified, varint records intact") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedBroker()
    try {
      val reqs = (1 to 60).map(i => KafkaRequest(s"m$i", s"g$i", "cdc.t0",
        Some(s"k${i % 7}"), s"""{"n":$i}"""))
      val out = KafkaProduceClient.deliver(
        spark.createDataset(reqs).repartition(1), "127.0.0.1", srv.port,
        chunkSize = 25).collect()
      assert(out.length == 60 && out.forall(_.ok))
      assert(srv.sawAcks == -1, "must produce with acks=-1")
      assert(srv.sawClientId == "graft")
      assert(srv.crcChecks.asScala.nonEmpty && srv.crcChecks.asScala.forall(identity),
        "CRC32C mismatch — the batch encoding deviates from the format spec")
      val got = srv.records.asScala.toVector
      assert(got.length == 60)
      assert(got.map(_.value) == reqs.map(_.value).toVector,
        "values must arrive intact, in partition order")
      assert(got.forall(_.key.exists(_.startsWith("k"))))
      // assigned offsets are contiguous per batch from the broker's base
      val offs = out.map(_.base_offset).sorted
      assert(offs.distinct.length == 60 && offs.head == 1000L)
    } finally srv.stop()
  }

  test("broker error codes fail the batch with the reference-style reason; dead port = no_connection") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedBroker(failTopics = Map("doomed" -> 3.toShort))
    try {
      val reqs = Seq(KafkaRequest("a", "ga", "doomed", None, "x"),
        KafkaRequest("b", "gb", "doomed", None, "y"))
      val out = KafkaProduceClient.deliver(
        spark.createDataset(reqs).repartition(1), "127.0.0.1", srv.port)
        .collect()
      assert(out.forall(r => !r.ok && r.err == "unknown_topic_or_partition"))
      val cmds = KafkaProduceClient.commands(KafkaProduceClient.deliver(
          spark.createDataset(reqs).repartition(1), "127.0.0.1", srv.port))
        .collect()
      assert(cmds.forall(_.kind == "nack"))
    } finally srv.stop()
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val out2 = KafkaProduceClient.deliver(
      spark.createDataset(Seq(KafkaRequest("a", "ga", "t", None, "v")))
        .repartition(1), "127.0.0.1", dead).collect()
    assert(out2.forall(r => !r.ok && r.err == "no_connection"))
  }

  test("END TO END: the kafka wire produces per-topic batches with routed keys") {
    implicit val s = spark
    val srv = new ScriptedBroker()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(40)
      val wire = SinkAdapters.kafkaWire(
        graft.ops.Routing.kafka(cdc, prefix = "sequin"))
      val out = KafkaProduceClient.deliver(KafkaProduceClient.requests(wire),
        "127.0.0.1", srv.port).collect()
      assert(out.length == 40 && out.forall(_.ok))
      val got = srv.records.asScala.toVector
      assert(got.length == 40)
      assert(got.forall(_.topic.startsWith("sequin.")))
      // message keys carry the routing key (ordering unit)
      val wireKeys = wire.select("key").collect().map(_.getString(0)).toSet
      assert(got.flatMap(_.key).toSet == wireKeys)
    } finally srv.stop()
  }
}

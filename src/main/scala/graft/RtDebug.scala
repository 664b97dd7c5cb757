package graft

/** Dev-only scratch main for profiling the assembled-runtime bench —
  * not part of the driver contract; safe to delete.
  */
object RtDebug {
  def main(args: Array[String]): Unit = {
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXECUTOR_CLASSPATH").foreach(cp =>
      builder.config("spark.executor.extraClassPath", cp))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val t0 = System.nanoTime()
    def mark(s: String): Unit =
      println(f"[rtdbg] ${(System.nanoTime() - t0) / 1e9}%8.2fs  $s")
    mark("session up")
    if (sys.env.get("RTDBG_LATENCY").contains("1")) {
      val r = RuntimeBench.latency(spark, samples = 30)
      mark(s"latency p50=${r._1}ms p99=${r._2}ms")
    }
    else if (sys.env.get("RTDBG_LATENCY_TAIL").contains("1")) {
      val r = RuntimeBench.latencyTail(spark, samples = 30)
      mark(s"tail latency p50=${r._1}ms p99=${r._2}ms")
    }
    else if (sys.env.get("RTDBG_PACED").contains("1")) {
      // RTDBG_PACED_SHARDS may be a comma list ("1,8"): shard counts are
      // INTERLEAVED per rate so a same-run A/B never straddles a host
      // band (the same discipline as AbProbe)
      val shardArms = sys.env.getOrElse("RTDBG_PACED_SHARDS", "1")
        .split(",").map(_.trim.toInt).toSeq
      val arms = sys.env.getOrElse("RTDBG_PACED_ARMS", "mb,tail")
        .split(",").map(_.trim).toSet
      val reps = sys.env.getOrElse("RTDBG_PACED_REPS", "1").toInt
      sys.env.getOrElse("SPARK_GRAFT_RT_PACED_RATES", "1000,5000,20000")
        .split(",").map(_.trim.toInt).foreach { r =>
          if (arms("mb")) {
            val mb = RuntimeBench.pacedLatency(spark, r, seconds = 10,
              tail = false)
            mark(f"paced mb   $r%6d ev/s: p50=${mb._1}%.1fms p99=${mb._2}%.1fms")
          }
          if (arms("tail")) (1 to reps).foreach { rep =>
            shardArms.foreach { shards =>
              val tl = RuntimeBench.pacedLatency(spark, r, seconds = 10,
                tail = true, shards = shards)
              mark(f"paced tail $r%6d ev/s shards=$shards rep$rep: " +
                f"p50=${tl._1}%.1fms p99=${tl._2}%.1fms")
            }
          }
        }
    }
    else if (sys.env.get("RTDBG_FANOUT").contains("1")) {
      val consumers =
        sys.env.getOrElse("SPARK_GRAFT_RT_FANOUT_CONSUMERS", "8").toInt
      val events = sys.env.get("SPARK_GRAFT_RT_FANOUT_EVENTS")
        .map(_.toInt).getOrElse(60000)
      val sh = RuntimeBench.fanoutProbe(spark, consumers, events,
        shared = true)
      mark(s"fanout shared ($consumers consumers): ${sh.toLong} ev/s aggregate")
      val ind = RuntimeBench.fanoutProbe(spark, consumers, events,
        shared = false)
      mark(s"fanout independent ($consumers consumers): ${ind.toLong} ev/s aggregate")
      mark(f"shared/independent ratio: ${sh / ind}%.2f")
    }
    else if (sys.env.get("RTDBG_DECODE").contains("1")) decodeProfile(spark, n)
    else if (sys.env.get("RTDBG_COMPONENTS").contains("1")) components(spark, n)
    else {
      val r = RuntimeBench.run(spark)
      mark(s"done: $r (n from env)")
    }
    spark.stop()
  }

  /** Pure-JVM decode loop vs the Dataset decode: where does the per-slot
    * serial cost live — the decode logic or Spark's object encoding?
    */
  private def decodeProfile(spark0: org.apache.spark.sql.SparkSession, n: Int): Unit = {
    implicit val spark: org.apache.spark.sql.SparkSession = spark0
    import spark.implicits._
    import graft.sources.{PgOutput, PgStream}
    import graft.sources.PgOutput._
    val t0 = System.nanoTime()
    def mark(s: String): Unit =
      println(f"[rtdec] ${(System.nanoTime() - t0) / 1e9}%8.2fs  $s")
    val relation = Relation(16384L, "public", "events_src", "d", Seq(
      RelationColumn("event_id", isKey = true, 20L, -1),
      RelationColumn("user_id", isKey = false, 20L, -1),
      RelationColumn("event_type", isKey = false, 25L, -1),
      RelationColumn("value", isKey = false, 701L, -1),
      RelationColumn("props", isKey = false, 3802L, -1)))
    val frames = PgStream.Frame("s", 0L, PgOutput.encode(relation)) +:
      (0 until n).flatMap { i =>
        val id = i.toLong
        val lsn = (id + 1) * 8
        val cells = Seq(Cell.Text(id.toString), Cell.Text((id % 150).toString),
          Cell.Text("purchase"), Cell.Text("5.0"), Cell.Text("{\"k\":1}"))
        Seq(
          PgStream.Frame("s", id * 3 + 1, PgOutput.encode(Begin(lsn, id * 1000, id))),
          PgStream.Frame("s", id * 3 + 2, PgOutput.encode(Insert(16384L, cells))),
          PgStream.Frame("s", id * 3 + 3, PgOutput.encode(Commit(0, lsn, lsn + 8, id * 1000))))
      }
    mark(s"${frames.length} frames built")
    (1 to 3).foreach { rep =>
      val t1 = System.nanoTime()
      val out = new scala.collection.mutable.ArrayBuffer[PgStream.Decoded](n)
      // mirror decodePartitions' loop without Spark
      val it = frames.iterator
      val ds = spark.emptyDataset[PgStream.Frame] // unused, for types only
      val cnt = {
        val d = PgStream.decodeLoopForProfiling(frames.iterator)
        d.length
      }
      mark(f"pure loop rep$rep: $cnt decoded in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    val df = spark.createDataset(frames).repartition(1)
      .sortWithinPartitions("seq").persist()
    mark(s"dataset cached: ${df.count()} rows")
    (1 to 3).foreach { rep =>
      val t1 = System.nanoTime()
      val cnt = PgStream.decodePartitions(df).count()
      mark(f"dataset decode rep$rep: $cnt in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    (1 to 2).foreach { rep =>
      val t1 = System.nanoTime()
      val cnt = PgStream.toRecords(PgStream.decodePartitions(df).toDF()
        .repartition(32), relation).count()
      mark(f"decode+toRecords rep$rep: $cnt in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
  }

  /** Isolate the dispatch chain from streaming machinery: N local
    * events → build → wire → RESP client → loopback, timed per stage.
    */
  private def components(spark0: org.apache.spark.sql.SparkSession, n: Int): Unit = {
    implicit val spark: org.apache.spark.sql.SparkSession = spark0
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    def mark(s: String): Unit =
      println(f"[rtcomp] ${(System.nanoTime() - t0) / 1e9}%8.2fs  $s")
    val events = (0 until n).map { i =>
      graft.model.ChangeEvent(i * 8L, 0L,
        new java.sql.Timestamp(1704067200000L), "insert", "public", "t0",
        16384L, i.toString, i.toLong, i.toLong, 5.0, """{"k":1}""", None,
        s"k$i", i.toString, 100L)
    }
    mark(s"built $n events")
    val cfg = graft.config.PipelineSpec.parse(
      """{"name":"comp","group_columns":["record_id"],
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    val df = spark.createDataset(events).toDF()
    val built = graft.streaming.CdcPipeline.build(df, cfg)
    mark(s"plan built; build count=${built.count()}")
    mark(s"build count again=${built.count()}")
    val wire = graft.sinks.SinkAdapters.redisStreamWire(built)
    mark(s"wire count=${wire.count()}")
    val reqs = graft.sinks.RespClient.streamRequests(wire)
    mark(s"requests count=${reqs.count()}")
    // loopback server
    val srvClass = Class.forName("graft.RuntimeBench")
    val srv = new java.net.ServerSocket(0, 64,
      java.net.InetAddress.getLoopbackAddress)
    val thread = new Thread(() => {
      try while (true) {
        val sock = srv.accept()
        val t = new Thread(() => {
          try {
            sock.setTcpNoDelay(true)
            val in = new java.io.BufferedInputStream(sock.getInputStream, 1 << 16)
            val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
            val ok = "$3\r\n1-1\r\n".getBytes
            def line(): String = {
              val sb = new StringBuilder; var c = in.read()
              while (c != '\r') { sb.append(c.toChar); c = in.read() }
              in.read(); sb.toString
            }
            while (true) {
              if (in.read() < 0) throw new java.io.EOFException
              val na = line().toInt
              var i = 0
              while (i < na) {
                in.read(); val len = line().toInt
                var left = len.toLong
                while (left > 0) { val s = in.skip(left); if (s <= 0) { in.read(); left -= 1 } else left -= s }
                in.read(); in.read(); i += 1
              }
              out.write(ok)
              if (in.available() == 0) out.flush()
            }
          } catch { case _: Exception => () } finally sock.close()
        })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true); thread.start()
    val port = srv.getLocalPort
    (1 to 3).foreach { rep =>
      val t1 = System.nanoTime()
      val res = graft.sinks.RespClient.deliver(reqs, "127.0.0.1", port).collect()
      mark(f"deliver rep$rep: ${res.length} outcomes, ok=${res.count(_.ok)} in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    val t2 = System.nanoTime()
    val out2 = graft.sinks.SinkDispatch.deliver(built,
      cfg.sink.get, graft.sinks.SinkDispatch.Env(host = "127.0.0.1", port = port))(spark).collect()
    mark(f"full dispatch: ${out2.length} in ${(System.nanoTime() - t2) / 1e9}%.2fs")
    srv.close()
  }
}

package graft

import graft.sources.{OidNames, PgOutput, PgStream, SchemaRegistry}
import graft.sources.PgOutput._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Binary pgoutput codec: property-tested encode/decode round-trip,
  * frame-level decode cases matching the reference's semantics
  * (decoder.ex:267-474), the schema registry, and a streaming decode whose
  * Relation cache survives micro-batch boundaries (processor.ex:139-141).
  */
class PgOutputSpec extends AnyFunSuite {

  // ------------------------------------------------- generators

  private val genCell: Gen[Cell] = Gen.frequency(
    2 -> Gen.const(Cell.Null),
    1 -> Gen.const(Cell.UnchangedToast),
    7 -> Gen.asciiPrintableStr.map(Cell.Text(_)),
    2 -> Gen.oneOf("héllo wörld", "{\"k\": 1}", "line\nbreak", "",
      "nulbyte").map(Cell.Text(_)))

  private val genTuple: Gen[Seq[Cell]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, genCell))

  private val genName: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (head :: tail).mkString

  private val genColumn: Gen[RelationColumn] = for {
    name <- genName
    key <- Arbitrary.arbBool.arbitrary
    oid <- Gen.oneOf(16L, 17L, 20L, 21L, 23L, 25L, 700L, 701L, 1043L,
      1082L, 1114L, 1184L, 1700L, 3802L, 99999L)
    mod <- Gen.oneOf(-1, 0, 64)
  } yield RelationColumn(name, key, oid, mod)

  private val genLsn: Gen[Long] = Gen.chooseNum(0L, Long.MaxValue)
  private val genOid: Gen[Long] = Gen.chooseNum(1L, 0xffffffffL)
  private val genTs: Gen[Long] =
    Gen.chooseNum(PgOutput.PgEpochUnixMicros, 4102444800000000L)
  private val genXid: Gen[Long] = Gen.chooseNum(0L, 0xffffffffL)

  private val genMessage: Gen[PgMessage] = Gen.oneOf(
    for { l <- genLsn; t <- genTs; x <- genXid } yield Begin(l, t, x),
    for { f <- Gen.oneOf(0, 1); l <- genLsn; e <- genLsn; t <- genTs }
      yield Commit(f, l, e, t),
    for { l <- genLsn; n <- genName } yield Origin(l, n),
    for {
      id <- genOid; ns <- genName; n <- genName
      ident <- Gen.oneOf("d", "n", "f", "i")
      cols <- Gen.chooseNum(0, 6).flatMap(k => Gen.listOfN(k, genColumn))
    } yield Relation(id, ns, n, ident, cols),
    for { r <- genOid; t <- genTuple } yield Insert(r, t),
    for {
      r <- genOid; t <- genTuple
      old <- Gen.option(genTuple)
      key <- if (old.isDefined) Gen.const(None) else Gen.option(genTuple)
    } yield Update(r, old, key, t),
    for {
      r <- genOid; t <- genTuple
      useKey <- Arbitrary.arbBool.arbitrary
    } yield
      if (useKey) Delete(r, None, Some(t)) else Delete(r, Some(t), None),
    for {
      opts <- Gen.chooseNum(0, 3)
      rels <- Gen.chooseNum(0, 5).flatMap(k => Gen.listOfN(k, genOid))
    } yield Truncate(opts, rels),
    for { id <- genOid; ns <- genName; n <- genName } yield PgType(id, ns, n),
    for {
      tx <- Arbitrary.arbBool.arbitrary; l <- genLsn; p <- genName
      c <- Gen.listOf(Arbitrary.arbByte.arbitrary).map(_.toArray)
    } yield LogicalMessage(tx, l, p, c))

  test("encode/decode round-trips every message type (ScalaCheck)") {
    val prop = Prop.forAll(genMessage) { m =>
      PgOutput.decode(PgOutput.encode(m)) == m
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------- frame-level cases

  test("decode never throws on arbitrary bytes (fuzz: a stream must survive garbage)") {
    val prop = Prop.forAll(Gen.listOf(Arbitrary.arbByte.arbitrary)) { bytes =>
      PgOutput.decode(bytes.toArray) != null // Unsupported or parsed, never a throw
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // truncated real frames (every prefix of a valid frame) also survive
    val frame = PgOutput.encode(Relation(7L, "public", "t", "d",
      Seq(RelationColumn("id", isKey = true, 20L, -1))))
    (0 until frame.length).foreach { n =>
      assert(PgOutput.decode(frame.take(n)) != null)
    }
  }

  test("ValueCaster.cast never throws on arbitrary type/text (falls back to raw)") {
    val genType = Gen.oneOf("bool", "int2", "int4", "int8", "float8",
      "numeric", "money", "bytea", "timestamp", "timestamptz", "date",
      "interval", "vector", "_int4", "_text", "jsonb", "mystery")
    val prop = Prop.forAll(genType, Gen.asciiStr) { (t, v) =>
      graft.types.ValueCaster.cast(t, v) // any outcome, no throw
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("insert frame decodes tuple cells: text, null, unchanged toast") {
    val frame = PgOutput.encode(Insert(24576L,
      Seq(Cell.Text("baz"), Cell.Null, Cell.UnchangedToast, Cell.Text("560"))))
    val Insert(rel, cells) = PgOutput.decode(frame): @unchecked
    assert(rel == 24576L)
    assert(textCells(cells) ==
      Seq("baz", null, graft.types.ValueCaster.ToastSentinel, "560"))
  }

  test("update frame variants: bare, with old tuple, with key tuple") {
    val bare = PgOutput.decode(PgOutput.encode(
      Update(1L, None, None, Seq(Cell.Text("v")))))
    assert(bare == Update(1L, None, None, Seq(Cell.Text("v"))))
    val withOld = PgOutput.decode(PgOutput.encode(
      Update(1L, Some(Seq(Cell.Text("o"))), None, Seq(Cell.Text("v")))))
    assert(withOld.asInstanceOf[Update].oldTuple.isDefined)
    val withKey = PgOutput.decode(PgOutput.encode(
      Update(1L, None, Some(Seq(Cell.Text("k"))), Seq(Cell.Text("v")))))
    assert(withKey.asInstanceOf[Update].keyTuple.isDefined)
  }

  test("relation frame carries identity, key flags and oid-resolved types") {
    val rel = Relation(16388L, "public", "orders", "d", Seq(
      RelationColumn("id", isKey = true, 20L, -1),
      RelationColumn("note", isKey = false, 25L, -1),
      RelationColumn("total", isKey = false, 1700L, 4)))
    val decoded = PgOutput.decode(PgOutput.encode(rel)).asInstanceOf[Relation]
    assert(decoded == rel)
    assert(decoded.columns.map(_.pgType) == Seq("int8", "text", "numeric"))
    assert(decoded.columns.map(_.isKey) == Seq(true, false, false))
  }

  test("truncate options decode to names; unknown tags are Unsupported") {
    assert(PgOutput.truncateOptions(3) == Seq("cascade", "restart_identity"))
    assert(PgOutput.truncateOptions(0) == Nil)
    assert(PgOutput.decode(Array[Byte]('Z', 1, 2)).isInstanceOf[Unsupported])
  }

  test("corrupt frames of KNOWN tags surface as Malformed, not Unsupported") {
    // a truncated Begin is stream corruption — must be observable
    val short = PgOutput.decode(Array[Byte]('B'))
    assert(short.isInstanceOf[Malformed])
    assert(short.asInstanceOf[Malformed].tag == 'B')
    // a truncated Insert likewise
    val frame = PgOutput.encode(Insert(5L, Seq(Cell.Text("abc"))))
    val cut = PgOutput.decode(frame.take(frame.length - 2))
    assert(cut.isInstanceOf[Malformed])
    assert(cut.asInstanceOf[Malformed].tag == 'I')
    assert(PgOutput.decode(Array.empty[Byte]).isInstanceOf[Malformed])
    // malformed frames still round-trip their raw bytes through encode
    assert(PgOutput.encode(cut).sameElements(frame.take(frame.length - 2)))
  }

  test("timestamps convert between PG epoch and unix micros") {
    val b = PgOutput.decode(PgOutput.encode(
      Begin(8L, 1704067200000000L, 7L))).asInstanceOf[Begin]
    assert(b.commitTsMicros == 1704067200000000L) // 2024-01-01 UTC
    assert(PgOutput.formatLsn((0x1L << 32) | 0x9A2EL) == "1/9A2E")
  }

  test("oid map covers the ValueCaster surface; unknown oids decay to text") {
    assert(OidNames.nameFor(3802L) == "jsonb")
    assert(OidNames.nameFor(1016L) == "_int8")
    assert(OidNames.nameFor(424242L) == "text")
    assert(OidNames.oidFor("numeric") == 1700L)
  }

  // ------------------------------------------------- schema registry

  private def rel(oid: Long, cols: (String, Long)*): Relation =
    Relation(oid, "public", s"t$oid", "d",
      cols.map { case (n, o) => RelationColumn(n, isKey = n == "id", o, -1) })

  test("SchemaRegistry: first sight and hash moves are changes; repeats are not") {
    val reg = new SchemaRegistry
    val v1 = rel(42L, "id" -> 20L, "name" -> 25L)
    assert(reg.observe(v1).exists(_.previousHash.isEmpty))
    assert(reg.observe(v1).isEmpty) // same schema re-announced
    val v2 = rel(42L, "id" -> 20L, "name" -> 25L, "score" -> 701L)
    val change = reg.observe(v2)
    assert(change.exists(_.previousHash.isDefined))
    assert(reg.sparkSchemaOf(42L).get.fieldNames.toSeq ==
      Seq("id", "name", "score"))
    val typed = SchemaRegistry.castTuple(v2, Seq("7", "ada", "1.5"))
    assert(typed == Seq(7L, "ada", 1.5))
  }

  // ------------------------------------------------- streaming decode

  private lazy val spark = SparkSpec.session

  test("decodeStateful: relation cache crosses micro-batches; mid-stream schema change switches decoding without restart") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val v1 = rel(99L, "id" -> 20L, "name" -> 25L)
    val v2 = rel(99L, "id" -> 20L, "name" -> 25L, "score" -> 701L)
    def ins(cells: Cell*) = PgOutput.encode(Insert(99L, cells))
    def frame(seq: Long, payload: Array[Byte]) =
      PgStream.Frame("slot1", seq, payload)

    val input = MemoryStream[PgStream.Frame]
    val query = PgStream.decodeStateful(input.toDS())
      .writeStream.format("memory").queryName("pg_decoded")
      .outputMode("append").start()
    try {
      // batch 1: relation v1 + one txn
      input.addData(
        frame(1, PgOutput.encode(v1)),
        frame(2, PgOutput.encode(Begin(8L, 1704067200000000L, 100L))),
        frame(3, ins(Cell.Text("1"), Cell.Text("a"))),
        frame(4, PgOutput.encode(Commit(0, 8L, 16L, 1704067200000000L))))
      query.processAllAvailable()
      // batch 2: NO relation frame — cache must come from the state store
      input.addData(
        frame(5, PgOutput.encode(Begin(16L, 1704067201000000L, 101L))),
        frame(6, ins(Cell.Text("2"), Cell.Text("b"))),
        frame(7, PgOutput.encode(Commit(0, 16L, 24L, 1704067201000000L))))
      query.processAllAvailable()
      // batch 3: schema changes mid-stream, decoding follows immediately
      input.addData(
        frame(8, PgOutput.encode(v2)),
        frame(9, PgOutput.encode(Begin(24L, 1704067202000000L, 102L))),
        frame(10, ins(Cell.Text("3"), Cell.Text("c"), Cell.Text("9.5"))),
        frame(11, PgOutput.encode(Commit(0, 24L, 32L, 1704067202000000L))))
      query.processAllAvailable()

      val out = spark.table("pg_decoded").as[PgStream.Decoded].collect()
        .sortBy(_.seq)
      val changes = out.filter(_.kind == "change")
      assert(changes.map(_.columns.size).toSeq == Seq(2, 2, 3))
      assert(changes.map(_.values.last).toSeq == Seq("a", "b", "9.5"))
      assert(changes.map(_.commit_lsn).toSeq == Seq(8L, 16L, 24L))
      assert(changes.map(_.table_name).forall(_ == "t99"))
      // hash moved exactly on the two distinct schemas
      val schemaChanges = out.filter(_.kind == "schema_change")
      assert(schemaChanges.length == 2)
      assert(changes.map(_.schema_hash).distinct.length == 2)

      // replayed frames (same seq) must not re-emit
      input.addData(frame(10, ins(Cell.Text("3"), Cell.Text("c"), Cell.Text("9.5"))))
      query.processAllAvailable()
      assert(spark.table("pg_decoded").filter("kind = 'change'").count() == 3)
    } finally query.stop()
  }

  test("transaction annotations: .set carries forward across txns, .clear removes") {
    implicit val s = spark
    import s.implicits._
    def lm(prefix: String, content: String) = PgOutput.encode(
      LogicalMessage(transactional = true, 8L, prefix, content.getBytes("UTF-8")))
    val v1 = rel(7L, "id" -> 20L)
    def txn(seq: Long, lsn: Long, id: String) = Seq(
      PgStream.Frame("s", seq, PgOutput.encode(Begin(lsn, 0L, 1L))),
      PgStream.Frame("s", seq + 1, PgOutput.encode(Insert(7L, Seq(Cell.Text(id))))),
      PgStream.Frame("s", seq + 2, PgOutput.encode(Commit(0, lsn, lsn + 8, 0L))))
    val frames =
      Seq(PgStream.Frame("s", 0, PgOutput.encode(v1))) ++
        txn(1, 8, "1") ++                                     // before any set
        Seq(PgStream.Frame("s", 10,
          lm(PgStream.AnnotationSetPrefix, """{"who":"ada"}"""))) ++
        txn(11, 16, "2") ++ txn(14, 24, "3") ++               // annotated
        Seq(PgStream.Frame("s", 20,
          lm(PgStream.AnnotationClearPrefix, ""))) ++
        txn(21, 32, "4")                                      // cleared
    val out = PgStream.decodePartitions(
        frames.toDS().repartition(1).sortWithinPartitions("seq"))
      .collect().filter(_.kind == "change").sortBy(_.seq)
    assert(out.map(_.annotations).toSeq ==
      Seq(None, Some("""{"who":"ada"}"""), Some("""{"who":"ada"}"""), None))
  }

  test("toRecords: pinned-schema path types the text cells declaratively") {
    implicit val s = spark
    import s.implicits._
    val orders = Relation(88L, "public", "orders", "d", Seq(
      RelationColumn("id", isKey = true, 20L, -1),
      RelationColumn("total", isKey = false, 701L, -1),
      RelationColumn("note", isKey = false, 25L, -1)))
    val frames = Seq(
      PgStream.Frame("s", 1, PgOutput.encode(orders)),
      PgStream.Frame("s", 2, PgOutput.encode(Begin(8L, 1704067200000000L, 5L))),
      PgStream.Frame("s", 3, PgOutput.encode(Insert(88L,
        Seq(Cell.Text("42"), Cell.Text("99.5"), Cell.Null)))),
      PgStream.Frame("s", 4, PgOutput.encode(Update(88L,
        Some(Seq(Cell.Text("42"), Cell.Text("99.5"), Cell.Null)), None,
        Seq(Cell.Text("42"), Cell.Text("100.5"), Cell.Text("hi"))))),
      PgStream.Frame("s", 5, PgOutput.encode(Commit(0, 8L, 16L, 1704067200000000L))))
    val decoded = PgStream.decodePartitions(
      frames.toDS().repartition(1).sortWithinPartitions("seq")).toDF()
    val recs = PgStream.toRecords(decoded, orders)
      .orderBy("commit_idx").collect()
    assert(recs.length == 2)
    val ins = recs(0)
    assert(ins.getAs[Long]("id") == 42L)
    assert(ins.getAs[Double]("total") == 99.5)
    assert(ins.isNullAt(ins.fieldIndex("note")))
    assert(ins.isNullAt(ins.fieldIndex("old_total")))
    val upd = recs(1)
    assert(upd.getAs[Double]("total") == 100.5)
    assert(upd.getAs[String]("note") == "hi")
    assert(upd.getAs[Double]("old_total") == 99.5)
    assert(upd.getAs[String]("action") == "update")
  }

  test("decodePartitions: batch replay decodes a seq-sorted slot partition") {
    implicit val s = spark
    import s.implicits._
    val v1 = rel(7L, "id" -> 20L, "v" -> 701L)
    val frames = Seq(
      PgStream.Frame("s", 1, PgOutput.encode(v1)),
      PgStream.Frame("s", 2, PgOutput.encode(Begin(8L, 1704067200000000L, 1L))),
      PgStream.Frame("s", 3, PgOutput.encode(Insert(7L,
        Seq(Cell.Text("1"), Cell.Text("2.5"))))),
      PgStream.Frame("s", 4, PgOutput.encode(Update(7L,
        Some(Seq(Cell.Text("1"), Cell.Text("2.5"))), None,
        Seq(Cell.Text("1"), Cell.Text("3.5"))))),
      PgStream.Frame("s", 5, PgOutput.encode(Delete(7L,
        Some(Seq(Cell.Text("1"), Cell.Text("3.5"))), None))),
      PgStream.Frame("s", 6, PgOutput.encode(Commit(0, 8L, 16L, 1704067200000000L))))
    val out = PgStream.decodePartitions(
      frames.toDS().repartition(1).sortWithinPartitions("seq"))
      .collect().filter(_.kind == "change").sortBy(_.seq)
    assert(out.map(_.action).toSeq == Seq("insert", "update", "delete"))
    assert(out.map(_.commit_idx).toSeq == Seq(0L, 1L, 2L))
    assert(out(1).old_values.get == Seq("1", "2.5"))
  }

  test("malformed known-tag frames surface as decode_error rows, not silent drops") {
    implicit val s = spark
    import s.implicits._
    val v1 = rel(7L, "id" -> 20L)
    val good = PgOutput.encode(Insert(7L, Seq(Cell.Text("1"))))
    val frames = Seq(
      PgStream.Frame("s", 1, PgOutput.encode(v1)),
      PgStream.Frame("s", 2, PgOutput.encode(Begin(8L, 0L, 1L))),
      PgStream.Frame("s", 3, good),
      PgStream.Frame("s", 4, good.take(good.length - 2)), // corrupt insert
      PgStream.Frame("s", 5, PgOutput.encode(Commit(0, 8L, 16L, 0L))))
    val out = PgStream.decodePartitions(
        frames.toDS().repartition(1).sortWithinPartitions("seq"))
      .collect().sortBy(_.seq)
    assert(out.count(_.kind == "change") == 1)
    val errs = out.filter(_.kind == "decode_error")
    assert(errs.length == 1)
    assert(errs.head.columns == Seq("tag", "error"))
    assert(errs.head.values.head == "I")
  }

  test("toRecords drops rows decoded before their Relation (unequal columns/values)") {
    implicit val s = spark
    import s.implicits._
    val orders = Relation(88L, "public", "orders", "d", Seq(
      RelationColumn("id", isKey = true, 20L, -1)))
    val frames = Seq(
      // NO Relation frame first: the insert decodes with empty columns
      PgStream.Frame("s", 1, PgOutput.encode(Begin(8L, 0L, 1L))),
      PgStream.Frame("s", 2, PgOutput.encode(Insert(88L, Seq(Cell.Text("1"))))),
      PgStream.Frame("s", 3, PgOutput.encode(Commit(0, 8L, 16L, 0L))),
      // now the Relation arrives; later rows are typeable
      PgStream.Frame("s", 4, PgOutput.encode(orders)),
      PgStream.Frame("s", 5, PgOutput.encode(Begin(9L, 0L, 2L))),
      PgStream.Frame("s", 6, PgOutput.encode(Insert(88L, Seq(Cell.Text("2"))))),
      PgStream.Frame("s", 7, PgOutput.encode(Commit(0, 9L, 24L, 0L))))
    val decoded = PgStream.decodePartitions(
      frames.toDS().repartition(1).sortWithinPartitions("seq")).toDF()
    // without the guard this throws in map_from_arrays; with it, the
    // schema-less early row is dropped and the typed one survives
    val recs = PgStream.toRecords(decoded, orders).collect()
    assert(recs.map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("truncate frames emit one change row per truncated relation") {
    implicit val s = spark
    import s.implicits._
    val v1 = rel(7L, "id" -> 20L)
    val v2 = rel(9L, "id" -> 20L)
    val frames = Seq(
      PgStream.Frame("s", 1, PgOutput.encode(v1)),
      PgStream.Frame("s", 2, PgOutput.encode(v2)),
      PgStream.Frame("s", 3, PgOutput.encode(Begin(8L, 0L, 1L))),
      PgStream.Frame("s", 4, PgOutput.encode(Truncate(3, Seq(7L, 9L)))),
      PgStream.Frame("s", 5, PgOutput.encode(Commit(0, 8L, 16L, 0L))))
    val out = PgStream.decodePartitions(
        frames.toDS().repartition(1).sortWithinPartitions("seq"))
      .collect().filter(_.action == "truncate").sortBy(_.table_oid)
    assert(out.map(_.table_oid).toSeq == Seq(7L, 9L))
    assert(out.map(_.table_name).toSeq == Seq("t7", "t9"))
    assert(out.map(_.commit_lsn).forall(_ == 8L))
  }

  test("SlotState snapshot codec: explicit versioned layout round-trips every field") {
    val st = PgStream.SlotState(
      lastSeq = 12345L,
      relationFrames = Map(
        7L -> PgOutput.encode(rel(7L, "id" -> 20L, "name" -> 25L)),
        9L -> PgOutput.encode(rel(9L, "id" -> 20L))),
      beginFrame = Some(PgOutput.encode(Begin(64L, 1704067200000000L, 42L))),
      commitIdx = 3L,
      annotations = Some("""{"who":"ada"}"""))
    val bytes = PgStream.encodeSlotState(st)
    val back = PgStream.decodeSlotState(bytes)
    assert(back.lastSeq == st.lastSeq && back.commitIdx == st.commitIdx &&
      back.annotations == st.annotations)
    assert(back.beginFrame.get.sameElements(st.beginFrame.get))
    assert(back.relationFrames.keySet == Set(7L, 9L))
    assert(back.relationFrames(7L).sameElements(st.relationFrames(7L)))
    // the layout is POSITIONAL in the codec, not reflective over the case
    // class — identical state encodes identically (determinism), and the
    // None/empty corners survive too
    assert(PgStream.encodeSlotState(st).sameElements(bytes))
    val minimal = PgStream.SlotState(Long.MinValue, Map.empty, None, 0L, None)
    assert(PgStream.decodeSlotState(
      PgStream.encodeSlotState(minimal)) == minimal)
  }

  test("SlotState snapshot codec: corrupt, legacy, and future-version snapshots fail LOUDLY into the cold-restart path") {
    val st = PgStream.SlotState(5L,
      Map(7L -> PgOutput.encode(rel(7L, "id" -> 20L))), None, 0L, None)
    val good = PgStream.encodeSlotState(st)
    // truncated mid-stream: explicit error, never a partial restore
    val e1 = intercept[IllegalStateException](
      PgStream.decodeSlotState(good.take(good.length - 3)))
    assert(e1.getMessage.contains("cold-restart"))
    // a pre-versioned Java-serialized snapshot (what r15 wrote) is named
    // as such — the operator learns WHY the resume point is unreadable
    val legacy = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(st); oos.close()
      bos.toByteArray
    }
    val e2 = intercept[IllegalStateException](PgStream.decodeSlotState(legacy))
    assert(e2.getMessage.contains("Java-serialized"))
    // a future layout version refuses instead of misparsing
    val future = good.clone(); future(3) = '2'
    val e3 = intercept[IllegalStateException](PgStream.decodeSlotState(future))
    assert(e3.getMessage.contains("version"))
    // arbitrary garbage
    intercept[IllegalStateException](
      PgStream.decodeSlotState("not a snapshot".getBytes("UTF-8")))
  }

  test("LinearDecoder: snapshot/restore across a mid-transaction boundary keeps typing, txn state and the replay cursor") {
    val orders = rel(7L, "id" -> 20L, "name" -> 25L)
    val d1 = new PgStream.LinearDecoder
    // relation + annotation + open txn + first row, then snapshot
    d1.feedAll(Seq(
      PgStream.Frame("s", 1, PgOutput.encode(orders)),
      PgStream.Frame("s", 2, PgOutput.encode(LogicalMessage(
        transactional = true, 8L, PgStream.AnnotationSetPrefix,
        """{"who":"ada"}""".getBytes("UTF-8")))),
      PgStream.Frame("s", 3, PgOutput.encode(Begin(64L, 1704067200000000L, 42L))),
      PgStream.Frame("s", 4, PgOutput.encode(Insert(7L,
        Seq(Cell.Text("1"), Cell.Text("a")))))))
    val snap = d1.snapshot()
    val d2 = new PgStream.LinearDecoder
    d2.restore(snap)
    // a restarted tail re-feeds the whole segment: frames 1-4 are
    // suppressed by the seq cursor, the unseen suffix decodes with the
    // restored relation schema, commit_idx continuity and annotations
    val out = d2.feedAll(Seq(
      PgStream.Frame("s", 1, PgOutput.encode(orders)),
      PgStream.Frame("s", 4, PgOutput.encode(Insert(7L,
        Seq(Cell.Text("1"), Cell.Text("a"))))),
      PgStream.Frame("s", 5, PgOutput.encode(Insert(7L,
        Seq(Cell.Text("2"), Cell.Text("b"))))),
      PgStream.Frame("s", 6, PgOutput.encode(
        Commit(0, 64L, 72L, 1704067200000000L)))))
    assert(out.size == 1)
    val row = out.head
    assert(row.seq == 5L && row.commit_idx == 1L && // frame 4 was idx 0
      row.table_name == "t7" && row.columns == Seq("id", "name") &&
      row.values == Seq("2", "b") && row.commit_lsn == 64L &&
      row.xid == 42L && row.annotations.contains("""{"who":"ada"}"""))
  }
}

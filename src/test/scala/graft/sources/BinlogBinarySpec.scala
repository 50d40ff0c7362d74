package graft.sources

import graft.SparkSpec
import BinlogBinary._

/** S5/S6 — the binary binlog row-image and JSONB decoders, verified
  * against hand-computed wire arithmetic (not against the paired
  * encoder's own output shape): value dispatch per row_event.py:189-314,
  * temporal packing :320-490, NEWDECIMAL :492-539, JSONB
  * json_binary.py:40-187.
  */
class BinlogBinarySpec extends SparkSpec {

  private def images(id: Long): Map[String, Map[String, Option[String]]] = {
    val events = BinlogBinary.decodeFile(BinlogFixture.gateFile(id))
    val cols = events.collect { case TableMapEv(_, _, m) => m.cols }.head
    BinlogFixture.gateImages(id).map { case (kind, img) =>
      kind -> cols.map(_.name).zip(img).toMap
    }.toMap
  }

  test("decodes every scalar wire type to hand-computed values") {
    val id = 37L
    val s = id * 5 // the w0 image seed
    val w0 = images(id)("w0")
    assert(w0("pk") === Some((s * 1000003L - 500000000L).toString))
    assert(w0("t") === Some(((s % 256) - 128).toString))
    assert(w0("sh") === Some(((s * 7) % 65536 - 32768).toString))
    assert(w0("i24") === Some(((s * 131) % 16777216L - 8388608L).toString))
    assert(w0("i32") ===
      Some(((s * 2654435L) % 4294967296L - 2147483648L).toString))
    assert(w0("u32") === Some(((s * 40503L) % 4294967296L).toString))
    assert(w0("f") === Some(((s % 1000) / 4.0).toFloat.toString))
    assert(w0("d") === Some(((s % 100000) / 8.0).toString))
    assert(w0("yr") === Some((1901 + s % 155).toString))
    assert(w0("bt") === Some((s % 4096).toString))
    assert(w0("en") === Some((1 + s % 3).toString))
    assert(w0("st") === Some((s % 16).toString))
    assert(w0("ch") === Some(s"c${s % 1000}"))
  }

  test("string types: 1-byte and 2-byte lengths, blob, null bitmap") {
    // seed with vc non-null: s % 7 != 3
    val w0 = images(1L)("w0") // s = 5
    val s = 5L
    val vcExpect = s"v$s-" + (0L until s % 20).map(k =>
      ('a' + (s + k) % 26).toChar).mkString
    assert(w0("vc") === Some(vcExpect))
    assert(w0("vl").get.length === (200 + s % 90).toInt)
    assert(w0("vl").get ===
      (0L until 200 + s % 90).map(k => ('a' + (s + 3 * k) % 26).toChar)
        .mkString)
    assert(w0("bl") ===
      Some((0L until 10 + s % 40).map(k => ('a' + (s + 17 * k) % 26).toChar)
        .mkString))
    // seed with vc NULL: s % 7 == 3 → s = 10 (id=2, w0)
    assert(images(2L)("w0")("vc") === None)
  }

  test("temporal packing: datetime2 fsp=3, time2 fsp=2, zero date") {
    val w0 = images(1L)("w0"); val s = 5L
    assert(w0("dt2") === Some(
      f"${2000 + s % 30}%04d-${1 + s % 12}%02d-${1 + (s * 11) % 28}%02d " +
        f"${s % 24}%02d:${(s * 3) % 60}%02d:${(s * 7) % 60}%02d" +
        f".${s % 1000}%03d"))
    assert(w0("ts2") === Some((1400000000L + (s * 97) % 500000000L).toString))
    // s=5 → s%5==0 → negative duration
    val micros = ((1 + s % 199) * 3600L + ((s * 13) % 60) * 60L +
      (s * 17) % 60) * 1000000L + (s % 100) * 10000L
    assert(w0("tm") === Some((-micros).toString))
    // positive branch: s=6 (id=1, w1)
    val w1 = images(1L)("w1"); val s2 = 6L
    val micros2 = ((1 + s2 % 199) * 3600L + ((s2 * 13) % 60) * 60L +
      (s2 * 17) % 60) * 1000000L + (s2 % 100) * 10000L
    assert(w1("tm") === Some(micros2.toString))
    assert(w1("dt") === Some(
      f"${1990 + s2 % 40}%04d-${1 + s2 % 12}%02d-${1 + s2 % 28}%02d"))
    // zero-date sentinel decodes to NULL: s % 13 == 12 → s = 25 (id=5)
    assert(images(5L)("w0")("dt") === None)
  }

  test("NEWDECIMAL: sign, compressed groups, zero padding") {
    def dec(s: Long): String = {
      val ipart = (s * 7919123L) % 10000000000L
      val frac = (s * 37) % 10000
      val neg = s % 3 == 0 && (ipart > 0 || frac > 0)
      (if (neg) "-" else "") + ipart + "." + f"$frac%04d"
    }
    // s=5 (positive), s=15 (s%3==0 → negative)
    assert(images(1L)("w0")("dec") === Some(dec(5)))
    assert(images(3L)("w0")("dec") === Some(dec(15)))
    // zero value renders 0.0000 (seed 0 → ipart 0, frac 0, positive)
    assert(images(0L)("w0")("dec") === Some("0.0000"))
  }

  test("JSON column decodes the JSONB tree to canonical text") {
    val w0 = images(1L)("w0"); val s = 5L
    assert(w0("js") === Some(
      s"""{"a":${s % 1000 - 500},"b":"t${s % 7}","c":[${s % 5},null],""" +
        s""""d":${(s % 200) / 2.0}}"""))
    // JSONB null bitmap: s % 11 == 7 → s = 18 → id=3 image w1 (s=16)? no:
    // 18 = 3*5+3 → image ua of id 3
    assert(images(3L)("ua")("js") === None)
  }

  test("update pairs before/after; delete carries before image") {
    val m = images(11L)
    assert(m.keySet === Set("w0", "w1", "ub", "ua", "d"))
    assert(m("ub")("pk") === Some((57L * 1000003L - 500000000L).toString))
    assert(m("ua")("pk") === Some((58L * 1000003L - 500000000L).toString))
    assert(m("d")("pk") === Some((59L * 1000003L - 500000000L).toString))
  }

  test("CRC corruption and truncation fail loudly") {
    val good = BinlogFixture.gateFile(4L)
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x40).toByte
    intercept[BinlogFormatException] { BinlogBinary.decodeFile(flipped) }
    intercept[BinlogFormatException] {
      BinlogBinary.decodeFile(good.take(good.length - 3))
    }
    intercept[BinlogFormatException] {
      BinlogBinary.decodeFile("nope".getBytes)
    }
  }

  test("JSONB: inline vs offset scalars, large format, escapes, u64") {
    import JsonBinary._
    def rt(v: JValue): String = render(decode(encode(v)))
    // small object: int16 inline, int32/int64 via offset
    assert(rt(JObject(Seq("a" -> JLong(-5), "b" -> JLong(100000),
      "c" -> JLong(5000000000L)))) ===
      """{"a":-5,"b":100000,"c":5000000000}""")
    // uint64 above Long.MaxValue renders unsigned
    assert(rt(JULong(-1L)) === "18446744073709551615")
    // string escaping + varlen > 127 bytes (two-byte length)
    val long = "x" * 130 + "\"\\\u0001"
    assert(rt(JString(long)) ===
      "\"" + "x" * 130 + "\\\"\\\\\\u0001" + "\"")
    // nested array/object, doubles, literals
    assert(rt(JArray(Seq(JNull, JBool(true), JDouble(2.5),
      JObject(Seq("k" -> JArray(Seq(JLong(1), JLong(2)))))))) ===
      """[null,true,2.5,{"k":[1,2]}]""")
    // keys re-sort MySQL-style: by length then bytes
    assert(rt(JObject(Seq("bb" -> JLong(1), "a" -> JLong(2)))) ===
      """{"a":2,"bb":1}""")
    // large format: enough elements to overflow the small 16-bit size
    val big = JArray((0 until 25000).map(i => JLong(i.toLong)))
    val enc = encode(big)
    assert((enc(0) & 0xff) === TLargeArr)
    assert(render(decode(enc)) ===
      "[" + (0 until 25000).mkString(",") + "]")
    // int32 is INLINE in the large format (offset-coded in small)
    val bigWithI32 = JArray(JLong(100000) +: (0 until 25000)
      .map(i => JLong(i.toLong)))
    assert(render(decode(encode(bigWithI32))) ===
      "[100000," + (0 until 25000).mkString(",") + "]")
  }

  test("toSourceEvents folds images like the reference normalization") {
    val events = BinlogBinary.decodeFile(BinlogFixture.custSegment(
      Seq((1L, "n1", "s1"), (5L, "n5", "s5"), (11L, "n11", "s11")),
      withDdl = true, nextFile = "b.000002.bin"))
    val src = BinlogBinary.toSourceEvents(events)
    // DDL once (BEGIN markers dropped), 3 inserts, 1 update→ADD, 1 delete
    val ddl = src.filter(_.op == EventSpool.OpQuery)
    assert(ddl.size === 1 && ddl.head.query.get.startsWith("CREATE TABLE"))
    val adds = src.filter(_.op == EventSpool.OpAdd)
    assert(adds.size === 4)
    assert(adds.last.row.get.contains(""""seg":"UPDATED""""))
    val removes = src.filter(_.op == EventSpool.OpRemove)
    assert(removes.size === 1 && removes.head.row.get.contains(""""pk":"11""""))
    // row JSON keys come from the COLUMN_NAME TLV
    assert(adds.head.row.get === """{"pk":"1","name":"n1","seg":"s1"}""")
  }

  test("BinlogTail: name order, active-segment holdback, resume") {
    val dump = tmpDir("graft-binlog-dump")
    val spool = tmpDir("graft-binlog-spool")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dump, name), bytes)
    put("b.000001.bin", BinlogFixture.custSegment(
      Seq((1L, "n1", "s1")), withDdl = true, nextFile = "b.000002.bin"))
    put("b.000002.bin", BinlogFixture.custSegment(
      Seq((2L, "n2", "s2")), withDdl = false, nextFile = "b.000003.bin"))
    val producer = new SpoolProducer(spool, graft.GraftConfig())
    val tail = new BinlogTail(dump, producer)
    // newest segment held back (may still be the active one)
    assert(tail.tick() > 0)
    assert(producer.sourcePos === Some("b.000001.bin"))
    // a third segment rotates in → the second becomes consumable; a
    // RESTARTED tailer resumes from the persisted cursor
    put("b.000003.bin", BinlogFixture.custSegment(
      Seq((3L, "n3", "s3")), withDdl = false, nextFile = "b.000004.bin"))
    val resumed = new BinlogTail(dump,
      new SpoolProducer(spool, graft.GraftConfig()))
    assert(resumed.tick() > 0)
    val batch = EventSpool.readBatch(spark, spool)
    // pk 1 and 2 arrived exactly once each; pk 3 still held back
    val rows = batch.filter("op = 'ADD'").select("row").collect()
      .map(_.getString(0))
    assert(rows.count(_.contains(""""pk":"1"""")) === 1)
    assert(rows.count(_.contains(""""pk":"2"""")) === 1)
    assert(!rows.exists(_.contains(""""pk":"3"""")))
  }

  test("MariaDB dialect: v1 rows, no checksum, control events") {
    val rows = Seq((1L, "n1", "s1"), (5L, "n5", "s5"), (11L, "n11", "s11"))
    val events = BinlogBinary.decodeFile(BinlogFixture.mariaSegment(
      rows, withDdl = true, nextFile = "maria-bin.000002.bin"))
    // the FDE declares the MariaDB server and no checksums
    val fde = events.collectFirst {
      case f: BinlogBinary.FormatDescription => f }.get
    assert(fde.serverVersion === BinlogFixture.MariaServerVersion)
    assert(!fde.checksummed)
    // control events decode: GTID_LIST, BINLOG_CHECKPOINT, per-txn
    // GTID (domain-server-seqno) and ANNOTATE_ROWS
    val gl = events.collectFirst {
      case g: BinlogBinary.MariaGtidList => g }.get
    assert(gl.gtids === Seq((0L, 3L, 0L)))
    val cp = events.collectFirst {
      case c: BinlogBinary.MariaCheckpoint => c }.get
    assert(cp.file === "maria-bin.000001")
    val gtids = events.collect { case g: BinlogBinary.MariaGtid => g }
    assert(gtids.nonEmpty && gtids.head.text === "0-3-1")
    val ann = events.collect { case a: BinlogBinary.MariaAnnotate => a }
    assert(ann.exists(_.sql.startsWith("INSERT INTO custs")))
    // the v1 rows events fold to the SAME source events as the v2
    // MySQL segment over the same rows (dialects converge)
    val mariaSrc = BinlogBinary.toSourceEvents(events)
    val mysqlSrc = BinlogBinary.toSourceEvents(BinlogBinary.decodeFile(
      BinlogFixture.custSegment(rows, withDdl = true,
        nextFile = "b.000002.bin")))
    assert(mariaSrc.map(e => (e.db, e.table, e.op, e.row, e.query)) ===
      mysqlSrc.map(e => (e.db, e.table, e.op, e.row, e.query)))
  }

  test("transaction payload: zstd + none unwrap to the plain images") {
    for (id <- Seq(0L, 1L, 2L, 7L, 40L)) { // even = ZSTD, odd = NONE
      val evs = BinlogBinary.decodeFile(BinlogFixture.tpayloadGateFile(id))
      val wrap = evs.collectFirst {
        case p: BinlogBinary.PayloadWrap => p }.get
      assert(wrap.compression === (if (id % 2 == 0) "ZSTD" else "NONE"))
      assert(wrap.innerEvents === 6)
      if (id % 2 == 0) // the event stream is repetitive; zstd shrinks it
        assert(wrap.compressedBytes < wrap.uncompressedBytes, s"id=$id")
      val row = BinlogFixture.tpayloadRowFor(id)
      // 5 images: w0, w1, the update's (ub, ua) pair, d
      assert(row.n_rows === 5 && row.match_plain, s"id=$id")
    }
    // a corrupted zstd payload fails loudly, not silently — the CRC is
    // RECOMPUTED after the flip so the corruption reaches the
    // decompressor itself, not just the checksum wall
    val f = BinlogFixture.tpayloadGateFile(2L)
    var pos = 4; var payloadAt = -1; var payloadSize = -1
    while (payloadAt < 0) {
      val evType = f(pos + 4) & 0xff
      val size = (f(pos + 9) & 0xff) | ((f(pos + 10) & 0xff) << 8) |
        ((f(pos + 11) & 0xff) << 16) | ((f(pos + 12) & 0xff) << 24)
      if (evType == BinlogBinary.EvTransactionPayload) {
        payloadAt = pos; payloadSize = size
      } else pos += size
    }
    val bad = f.clone()
    bad(payloadAt + 40) = (bad(payloadAt + 40) ^ 0x55).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(bad, payloadAt, payloadSize - 4)
    val cv = crc.getValue
    (0 until 4).foreach(i =>
      bad(payloadAt + payloadSize - 4 + i) = ((cv >> (8 * i)) & 0xff).toByte)
    intercept[BinlogBinary.BinlogFormatException] {
      BinlogBinary.decodeFile(bad)
    }
  }

  test("JSON diff grammar: paths, semantics, key ordering") {
    import BinlogBinary.JsonBinary._
    assert(parsePath("$.a.b[2]") ===
      Seq(Member("a"), Member("b"), Index(2)))
    assert(parsePath("$.\"a b\"[0].c") ===
      Seq(Member("a b"), Index(0), Member("c")))
    val doc = JObject(Seq("a" -> JLong(1),
      "c" -> JArray(Seq(JLong(1), JLong(2)))))
    // INSERT of an existing member is a no-op (JSON_INSERT semantics)
    assert(applyDiff(doc, DiffInsert, Seq(Member("a")),
      Some(JLong(9))) === doc)
    // INSERT of a new member lands in MySQL (length, bytes) key order
    assert(render(applyDiff(doc, DiffInsert, Seq(Member("b")),
      Some(JLong(7)))) === """{"a":1,"b":7,"c":[1,2]}""")
    // array INSERT clamps to the end (JSON_ARRAY_INSERT)
    assert(render(applyDiff(doc, DiffInsert, Seq(Member("c"), Index(99)),
      Some(JLong(3)))) === """{"a":1,"c":[1,2,3]}""")
    // REMOVE of a missing target is a no-op
    assert(applyDiff(doc, DiffRemove, Seq(Member("zz")), None) === doc)
    // REPLACE of a missing member fails loudly
    intercept[IllegalArgumentException] {
      applyDiff(doc, DiffReplace, Seq(Member("zz")), Some(JLong(0)))
    }
    // a longer key sorts AFTER all 1-byte keys regardless of bytes
    assert(render(applyDiff(doc, DiffInsert, Seq(Member("aa")),
      Some(JLong(5)))) === """{"a":1,"c":[1,2],"aa":5}""")
  }

  test("partial-JSON update materializes the after image") {
    // id=7: 7%3=1 (b replaced), 7%4=3 (d.y replaced)
    val r7 = BinlogFixture.partialGateRowFor(7)
    assert(r7.before_js ===
      """{"a":-493,"b":"t0","c":[2,7,7],"d":{"x":7,"y":"u1"}}""")
    assert(r7.after_js ===
      """{"a":-43,"b":"r7","c":[2,7,7,7],"d":{"x":7,"y":"w2"},"e":"n0"}""")
    // id=12: 12%3=0 → $.b REMOVEd; 12%4=0 → $.d.y REMOVEd
    val r12 = BinlogFixture.partialGateRowFor(12)
    assert(r12.before_js ===
      """{"a":-488,"b":"t5","c":[2,1,12],"d":{"x":12,"y":"u0"}}""")
    assert(r12.after_js ===
      """{"a":-38,"c":[2,3,12,12],"d":{"x":12},"e":"n5"}""")
    assert(r12.n_diffs === 6 && r12.pk === 12L)
  }

  test("BinlogTail: counter rollover orders numerically, not lexically") {
    // b.999999 → b.1000000 sorts lexically BACKWARD; the tailer must
    // consume the rollover segment instead of skipping it as done
    val dump = tmpDir("graft-binlog-roll")
    val spool = tmpDir("graft-binlog-roll-spool")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dump, name), bytes)
    put("b.999999.bin", BinlogFixture.custSegment(
      Seq((1L, "n1", "s1")), withDdl = true, nextFile = "b.1000000.bin"))
    put("b.1000000.bin", BinlogFixture.custSegment(
      Seq((2L, "n2", "s2")), withDdl = false, nextFile = "b.1000001.bin"))
    put("b.1000001.bin", BinlogFixture.custSegment(
      Seq((3L, "n3", "s3")), withDdl = false, nextFile = "b.1000002.bin"))
    val producer = new SpoolProducer(spool, graft.GraftConfig())
    assert(new BinlogTail(dump, producer).tick() > 0)
    // two rotated segments consumed IN NUMERIC ORDER; newest held back
    assert(producer.sourcePos === Some("b.1000000.bin"))
    val rows = EventSpool.readBatch(spark, spool)
      .filter("op = 'ADD'").select("row").collect().map(_.getString(0))
    assert(rows.count(_.contains(""""pk":"1"""")) === 1)
    assert(rows.count(_.contains(""""pk":"2"""")) === 1)
    assert(!rows.exists(_.contains(""""pk":"3"""")))
  }

  test("binlog route and Debezium route converge on the same table") {
    import graft.streaming.CdcPipeline
    import graft.ddl.SchemaRegistry
    val dump = tmpDir("graft-binlog-e2e")
    val spool = tmpDir("graft-binlog-e2e-spool")
    val wh = tmpDir("graft-binlog-e2e-wh")
    val rows = (1L to 40L).map(pk => (pk, s"name$pk", s"seg${pk % 4}"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dump, "b.000001.bin"),
      BinlogFixture.custSegment(rows, withDdl = true,
        nextFile = "b.000002.bin"))
    val producer = new SpoolProducer(spool, graft.GraftConfig())
    new BinlogTail(dump, producer, consumeActive = true).tick()
    val pipeline = new CdcPipeline(spark, graft.GraftConfig(),
      new SchemaRegistry("d"), wh)
    pipeline.processBatch(EventSpool.readBatch(spark, spool), batchId = 0)
    val got = pipeline.table("custs").read
      .select("pk", "name", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val expect = rows.filter(_._1 % 11 != 0).map { case (pk, n, s) =>
      (pk, n, if (pk % 5 == 0) "UPDATED" else s) }.toSet
    assert(got === expect)
  }

  test("schema evolution mid-binlog: ALTER between two TABLE_MAP generations") {
    import BinlogFixture._
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >>> (8 * i)) & 0xff).toByte)
    def str1(s: String): Array[Byte] =
      Array(s.length.toByte) ++ s.getBytes("UTF-8")
    val pkC = Col("pk", BinlogBinary.LONGLONG, Array.empty,
      nullable = false, numeric = true, unsigned = false, _ => None)
    val aC = Col("a", BinlogBinary.VARCHAR, le(20, 2),
      nullable = false, numeric = false, unsigned = false, _ => None)
    val bC = Col("b", BinlogBinary.LONGLONG, Array.empty,
      nullable = true, numeric = true, unsigned = false, _ => None)
    val colsV1 = IndexedSeq(pkC, aC)
    val colsV2 = IndexedSeq(pkC, aC, bC)
    def img2(pk: Long, a: String) =
      IndexedSeq[Option[Array[Byte]]](Some(le(pk, 8)), Some(str1(a)))
    def img3(pk: Long, a: String, b: Option[Long]) =
      IndexedSeq[Option[Array[Byte]]](Some(le(pk, 8)), Some(str1(a)),
        b.map(le(_, 8)))
    val ts = 1700000000L
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bs, next) = f(pos); out.write(bs, 0, bs.length); pos = next
    }
    emit(fdeEvent(ts, _))
    emit(queryEvent(ts, "d",
      "CREATE TABLE evo (pk bigint NOT NULL, a varchar(20), " +
        "PRIMARY KEY(pk))", _))
    emit(gtidEvent(ts, 1, _))
    emit(queryEvent(ts, "d", "BEGIN", _))
    emit(tableMapEvent(ts, 50, "d", "evo", colsV1, _))
    emit(rowsEvent(ts, BinlogBinary.EvWriteRowsV2, 50, colsV1,
      Seq(img2(1, "a1"), img2(2, "a2")), _))
    emit(xidEvent(ts, 1, _))
    // the ALTER arrives mid-stream; the next generation maps a NEW
    // table id with three columns (exactly what a real server logs)
    emit(queryEvent(ts, "d", "ALTER TABLE evo ADD COLUMN b bigint", _))
    emit(gtidEvent(ts, 2, _))
    emit(queryEvent(ts, "d", "BEGIN", _))
    emit(tableMapEvent(ts, 51, "d", "evo", colsV2, _))
    emit(rowsEvent(ts, BinlogBinary.EvWriteRowsV2, 51, colsV2,
      Seq(img3(3, "a3", Some(77))), _))
    emit(rowsEvent(ts, BinlogBinary.EvUpdateRowsV2, 51, colsV2,
      Seq(img3(1, "a1", None), img3(1, "upd", Some(88))), _))
    emit(xidEvent(ts, 2, _))
    emit(rotateEvent(ts, "evo.000002.bin", _))
    val dump = tmpDir("graft-evo-dump")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dump, "evo.000001.bin"), out.toByteArray)
    val spool = tmpDir("graft-evo-spool")
    val wh = tmpDir("graft-evo-wh")
    val producer = new SpoolProducer(spool, graft.GraftConfig())
    new BinlogTail(dump, producer, consumeActive = true).tick()
    val pipeline = new graft.streaming.CdcPipeline(spark,
      graft.GraftConfig(), new graft.ddl.SchemaRegistry("d"), wh)
    pipeline.processBatch(EventSpool.readBatch(spark, spool), batchId = 0)
    val rows = pipeline.table("evo").read
      .select("pk", "a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    // pre-ALTER rows land with b NULL; the post-ALTER insert and the
    // update's after-image carry their b values
    assert(rows === Set(
      (1L, "upd", Some(88L)),
      (2L, "a2", None),
      (3L, "a3", Some(77L))))
  }

  test("MINIMAL row images: absent columns decode as None, nulls index right") {
    import BinlogFixture._
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >>> (8 * i)) & 0xff).toByte)
    def str1(s: String): Array[Byte] =
      Array(s.length.toByte) ++ s.getBytes("UTF-8")
    val cols = IndexedSeq(
      Col("pk", BinlogBinary.LONGLONG, Array.empty, nullable = false,
        numeric = true, unsigned = false, _ => None),
      Col("a", BinlogBinary.VARCHAR, le(20, 2), nullable = true,
        numeric = false, unsigned = false, _ => None),
      Col("b", BinlogBinary.LONGLONG, Array.empty, nullable = true,
        numeric = true, unsigned = false, _ => None))
    val ts = 1700000000L
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bs, next) = f(pos); out.write(bs, 0, bs.length); pos = next
    }
    emit(fdeEvent(ts, _))
    emit(tableMapEvent(ts, 9, "d", "m", cols, _))
    // MINIMAL delete before-image: only the PK column present
    emit(rowsEvent(ts, BinlogBinary.EvDeleteRowsV2, 9, cols,
      Seq(IndexedSeq(Some(le(42, 8)))), _,
      presentMask = IndexedSeq(true, false, false)))
    // MINIMAL write: pk + b present, a absent; b NULL in one row —
    // the null bitmap indexes PRESENT columns (pk=0, b=1), so a
    // full-width indexer would misread bit 2 vs bit 1
    emit(rowsEvent(ts, BinlogBinary.EvWriteRowsV2, 9, cols,
      Seq(IndexedSeq(Some(le(1, 8)), Some(le(7, 8))),
        IndexedSeq(Some(le(2, 8)), None)), _,
      presentMask = IndexedSeq(true, false, true)))
    emit(rotateEvent(ts, "m.000002.bin", _))
    val events = BinlogBinary.decodeFile(out.toByteArray)
    val del = events.collect { case r: Rows if r.kind == 'd' => r }.head
    assert(del.rows.head._1.get ===
      IndexedSeq(Some("42"), None, None)) // absent → None
    val wr = events.collect { case r: Rows if r.kind == 'w' => r }.head
    assert(wr.rows(0)._2.get === IndexedSeq(Some("1"), None, Some("7")))
    assert(wr.rows(1)._2.get === IndexedSeq(Some("2"), None, None))
  }
}

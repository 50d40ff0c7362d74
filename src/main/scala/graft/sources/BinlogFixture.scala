package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import BinlogBinary._

/** Deterministic MySQL binlog ENCODER — the paired fixture builder for
  * [[BinlogBinary]], in the codebase's codec-gate style (the MediaCodec
  * encoders): every byte derives from seed arithmetic the DuckDB oracle
  * replays, so the decoder is verified against re-derived values, not
  * against itself. Emits real v4 binlog files: magic, CRC32-checksummed
  * FORMAT_DESCRIPTION, GTID / QUERY / XID / ROTATE, TABLE_MAP with
  * binlog_row_metadata=FULL TLVs (SIGNEDNESS, COLUMN_NAME), and v2
  * WRITE/UPDATE/DELETE rows events over a 22-column table exercising
  * every supported wire type.
  *
  * The per-image seed grid: image k of document id uses s = id*5 + k,
  * k = 0,1 (write rows), 2/3 (update before/after), 4 (delete) —
  * `oracleSql` for `cdc_binlog_decode` re-derives every column from the
  * same grid.
  */
object BinlogFixture {

  val ServerVersion = "8.0.36-graft-fixture"

  // ------------------------------------------------------------ writer

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def le(v: Long, width: Int): this.type = {
      var i = 0
      while (i < width) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def be(v: Long, width: Int): this.type = {
      var i = width - 1
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def bytes(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
    def str(s: String): this.type = bytes(s.getBytes(UTF_8))
    def lenenc(v: Long): this.type =
      if (v < 0xfb) u8(v.toInt)
      else if (v <= 0xffff) { u8(0xfc); le(v, 2) }
      else if (v <= 0xffffff) { u8(0xfd); le(v, 3) }
      else { u8(0xfe); le(v, 8) }
    def result(): Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------------ column spec

  /** One fixture column: TABLE_MAP type byte, metadata bytes, the
    * signedness-TLV participation, and the per-seed value encoder
    * (None = SQL NULL via the row null bitmap). */
  private[sources] final case class Col(name: String, typeByte: Int,
      meta: Array[Byte], nullable: Boolean, numeric: Boolean,
      unsigned: Boolean, enc: Long => Option[Array[Byte]])

  private def le(v: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def be(v: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((v >>> (8 * (width - 1 - i))) & 0xff).toByte)

  private def letters(n: Long, f: Long => Long): Array[Byte] =
    Array.tabulate(n.toInt)(k => ('a' + f(k.toLong) % 26).toByte)

  private def pascal(width: Int, payload: Array[Byte]): Array[Byte] =
    le(payload.length.toLong, width) ++ payload

  /** NEWDECIMAL(14,4) wire bytes: 1-byte compressed integral digit +
    * one 4-byte base-10^9 group + 2-byte compressed 4-digit fraction;
    * first byte XOR 0x80, all bytes complemented when negative
    * (row_event.py:492-539 decoded shape). */
  private def decimalBytes(neg: Boolean, ipart: Long,
                           frac: Long): Array[Byte] = {
    val raw = be(ipart / 1000000000L, 1) ++ be(ipart % 1000000000L, 4) ++
      be(frac, 2)
    raw(0) = (raw(0) ^ 0x80).toByte
    if (neg) raw.map(b => (~b).toByte) else raw
  }

  /** The 22-column decode-gate table: every wire type [[BinlogBinary]]
    * supports, with seed arithmetic the oracle replays. */
  private val gateCols: IndexedSeq[Col] = IndexedSeq(
    Col("pk", LONGLONG, Array.empty, nullable = false, numeric = true,
      unsigned = false, s => Some(le(s * 1000003L - 500000000L, 8))),
    Col("t", TINY, Array.empty, nullable = false, numeric = true,
      unsigned = false, s => Some(le((s % 256) - 128, 1))),
    Col("sh", SHORT, Array.empty, nullable = false, numeric = true,
      unsigned = false, s => Some(le((s * 7) % 65536 - 32768, 2))),
    Col("i24", INT24, Array.empty, nullable = false, numeric = true,
      unsigned = false, s => Some(le((s * 131) % 16777216L - 8388608L, 3))),
    Col("i32", LONG, Array.empty, nullable = false, numeric = true,
      unsigned = false,
      s => Some(le((s * 2654435L) % 4294967296L - 2147483648L, 4))),
    Col("u32", LONG, Array.empty, nullable = false, numeric = true,
      unsigned = true, s => Some(le((s * 40503L) % 4294967296L, 4))),
    Col("f", FLOAT, Array(4.toByte), nullable = false, numeric = true,
      unsigned = false, s => Some(le(java.lang.Float.floatToIntBits(
        ((s % 1000) / 4.0).toFloat).toLong & 0xffffffffL, 4))),
    Col("d", DOUBLE, Array(8.toByte), nullable = false, numeric = true,
      unsigned = false, s => Some(le(java.lang.Double.doubleToLongBits(
        (s % 100000) / 8.0), 8))),
    Col("vc", VARCHAR, le(60, 2), nullable = true, numeric = false,
      unsigned = false, s =>
        if (s % 7 == 3) None
        else Some(pascal(1, (s"v$s-" + new String(
          letters(s % 20, k => s + k), UTF_8)).getBytes(UTF_8)))),
    Col("vl", VARCHAR, le(400, 2), nullable = false, numeric = false,
      unsigned = false,
      s => Some(pascal(2, letters(200 + s % 90, k => s + 3 * k)))),
    Col("ch", STRING, Array(STRING.toByte, 40.toByte), nullable = false,
      numeric = false, unsigned = false,
      s => Some(pascal(1, s"c${s % 1000}".getBytes(UTF_8)))),
    Col("bl", BLOB, Array(2.toByte), nullable = false, numeric = false,
      unsigned = false,
      s => Some(pascal(2, letters(10 + s % 40, k => s + 17 * k)))),
    Col("dt", DATE, Array.empty, nullable = false, numeric = false,
      unsigned = false, s =>
        if (s % 13 == 12) Some(le(0, 3)) // the 0000-00-00 sentinel
        else Some(le(((1990 + s % 40) << 9) | ((1 + s % 12) << 5) |
          (1 + s % 28), 3))),
    Col("dt2", DATETIME2, Array(3.toByte), nullable = false,
      numeric = false, unsigned = false, s => {
        val ym = (2000 + s % 30) * 13 + (1 + s % 12)
        val packed = (1L << 39) | (ym.toLong << 22) |
          ((1 + (s * 11) % 28) << 17) | ((s % 24) << 12) |
          (((s * 3) % 60) << 6) | ((s * 7) % 60)
        Some(be(packed, 5) ++ be((s % 1000) * 10, 2)) // fsp=3 frac
      }),
    Col("ts2", TIMESTAMP2, Array(0.toByte), nullable = false,
      numeric = false, unsigned = false,
      s => Some(be(1400000000L + (s * 97) % 500000000L, 4))),
    Col("tm", TIME2, Array(2.toByte), nullable = false, numeric = false,
      unsigned = false, s => {
        val packed = (1L << 23) | ((1 + s % 199) << 12) |
          (((s * 13) % 60) << 6) | ((s * 17) % 60)
        val stored =
          if (s % 5 == 0) ((~packed) + 1) & 0xffffffL else packed
        Some(be(stored, 3) ++ be(s % 100, 1)) // fsp=2 frac
      }),
    Col("yr", YEAR, Array.empty, nullable = false, numeric = true,
      unsigned = false, s => Some(le(1 + s % 155, 1))),
    Col("dec", NEWDECIMAL, Array(14.toByte, 4.toByte), nullable = false,
      numeric = true, unsigned = false, s => {
        val ipart = (s * 7919123L) % 10000000000L
        val frac = (s * 37) % 10000
        Some(decimalBytes(s % 3 == 0 && (ipart > 0 || frac > 0),
          ipart, frac))
      }),
    Col("bt", BIT, Array(4.toByte, 1.toByte), nullable = false,
      numeric = false, unsigned = false, s => Some(be(s % 4096, 2))),
    Col("en", STRING, Array(ENUM.toByte, 1.toByte), nullable = false,
      numeric = false, unsigned = false, s => Some(le(1 + s % 3, 1))),
    Col("st", STRING, Array(SET.toByte, 1.toByte), nullable = false,
      numeric = false, unsigned = false, s => Some(le(s % 16, 1))),
    Col("js", JSON, Array(4.toByte), nullable = true, numeric = false,
      unsigned = false, s =>
        if (s % 11 == 7) None
        else {
          import JsonBinary._
          val payload = encode(JObject(Seq(
            "a" -> JLong(s % 1000 - 500),
            "b" -> JString(s"t${s % 7}"),
            "c" -> JArray(Seq(JLong(s % 5), (s % 3) match {
              case 0 => JBool(true); case 1 => JBool(false); case _ => JNull
            })),
            "d" -> JDouble((s % 200) / 2.0))))
          Some(le(payload.length.toLong, 4) ++ payload)
        }))

  // ----------------------------------------------------- event frames

  /** v4 header + body [+ CRC32], advancing `pos`. `crc = false` emits
    * the binlog_checksum=NONE framing (the MariaDB fixture dialect);
    * `serverId` rides the header (MariaDB GTIDs render it). */
  private[sources] def event(ts: Long, evType: Int, body: Array[Byte],
                    pos: Long, crc: Boolean = true,
                    serverId: Long = 1L): (Array[Byte], Long) = {
    val size = 19 + body.length + (if (crc) 4 else 0)
    val nextPos = pos + size
    val w = new W
    w.le(ts, 4).u8(evType).le(serverId, 4).le(size.toLong, 4)
      .le(nextPos, 4).le(0L, 2).bytes(body)
    val head = w.result()
    if (!crc) (head, nextPos)
    else {
      val c = new java.util.zip.CRC32(); c.update(head)
      (head ++ le(c.getValue, 4), nextPos)
    }
  }

  /** FDE is special: its own CRC and the checksum-algorithm byte are
    * part of the body it declares. */
  private[sources] def fdeEvent(ts: Long, pos: Long): (Array[Byte], Long) = {
    val body = new W
    body.le(4L, 2) // binlog version
    val ver = ServerVersion.getBytes(UTF_8)
    body.bytes(java.util.Arrays.copyOf(ver, 50)) // NUL-padded 50 bytes
    body.le(ts, 4)
    body.u8(19) // event header length
    // post-header length table for event types 1..39 (we only rely on
    // the sniffed checksum byte, but emit honest values for our types)
    val lens = new Array[Byte](39)
    lens(EvQuery - 1) = 13; lens(EvRotate - 1) = 8
    lens(EvFormatDescription - 1) = (2 + 50 + 4 + 1 + 39).toByte
    lens(EvXid - 1) = 0; lens(EvTableMap - 1) = 8
    lens(EvWriteRowsV2 - 1) = 10; lens(EvUpdateRowsV2 - 1) = 10
    lens(EvDeleteRowsV2 - 1) = 10; lens(EvGtid - 1) = 42
    body.bytes(lens)
    body.u8(1) // checksum algorithm: CRC32
    event(ts, EvFormatDescription, body.result(), pos)
  }

  private[sources] def gtidEvent(ts: Long, seed: Long, pos: Long)
      : (Array[Byte], Long) = {
    val body = new W
    body.u8(1) // flags
    val sid = Array.tabulate[Byte](16)(i => ((seed * 31 + i * 7) % 251).toByte)
    body.bytes(sid).le(seed + 1, 8)
    event(ts, EvGtid, body.result(), pos)
  }

  private[sources] def queryEvent(ts: Long, db: String, sql: String, pos: Long,
      crc: Boolean = true): (Array[Byte], Long) = {
    val body = new W
    body.le(7L, 4).le(0L, 4) // thread id, exec time
    val dbBytes = db.getBytes(UTF_8)
    body.u8(dbBytes.length).le(0L, 2).le(0L, 2) // error code, status len
    body.bytes(dbBytes).u8(0).str(sql)
    event(ts, EvQuery, body.result(), pos, crc)
  }

  private[sources] def xidEvent(ts: Long, xid: Long, pos: Long,
      crc: Boolean = true): (Array[Byte], Long) =
    event(ts, EvXid, le(xid, 8), pos, crc)

  private[sources] def rotateEvent(ts: Long, nextFile: String, pos: Long,
      crc: Boolean = true): (Array[Byte], Long) =
    event(ts, EvRotate, le(4L, 8) ++ nextFile.getBytes(UTF_8), pos, crc)

  private[sources] def tableMapEvent(ts: Long, tableId: Long, db: String,
      table: String, cols: IndexedSeq[Col], pos: Long,
      crc: Boolean = true): (Array[Byte], Long) = {
    val w = new W
    w.le(tableId, 6).le(1L, 2)
    val dbB = db.getBytes(UTF_8); val tbB = table.getBytes(UTF_8)
    w.u8(dbB.length).bytes(dbB).u8(0)
    w.u8(tbB.length).bytes(tbB).u8(0)
    w.lenenc(cols.size.toLong)
    cols.foreach(c => w.u8(c.typeByte))
    val meta = cols.flatMap(_.meta).toArray
    w.lenenc(meta.length.toLong).bytes(meta)
    val nullBitmap = new Array[Byte]((cols.size + 7) / 8)
    cols.zipWithIndex.foreach { case (c, i) =>
      if (c.nullable)
        nullBitmap(i / 8) = (nullBitmap(i / 8) | (1 << (i % 8))).toByte
    }
    w.bytes(nullBitmap)
    // SIGNEDNESS TLV: MSB-first bits over numeric columns only
    val numeric = cols.filter(_.numeric)
    val signBits = new Array[Byte]((numeric.size + 7) / 8)
    numeric.zipWithIndex.foreach { case (c, i) =>
      if (c.unsigned)
        signBits(i / 8) = (signBits(i / 8) | (0x80 >>> (i % 8))).toByte
    }
    w.u8(1).lenenc(signBits.length.toLong).bytes(signBits)
    // COLUMN_NAME TLV: lenenc-prefixed names
    val names = new W
    cols.foreach { c =>
      val nb = c.name.getBytes(UTF_8)
      names.lenenc(nb.length.toLong).bytes(nb)
    }
    val nameBytes = names.result()
    w.u8(4).lenenc(nameBytes.length.toLong).bytes(nameBytes)
    event(ts, EvTableMap, w.result(), pos, crc)
  }

  /** images: per row, the per-column wire values (None = NULL). For
    * update events pass (before, after) pairs flattened in order. */
  /** `presentMask`: null = FULL row image (every column present); a
    * mask emits binlog_row_image=MINIMAL-style events — absent columns
    * appear in neither the per-row null bitmap (which indexes PRESENT
    * columns only) nor the value stream, and the images must carry
    * values only for masked-in columns. */
  private[sources] def rowsEvent(ts: Long, evType: Int, tableId: Long,
      cols: IndexedSeq[Col], images: Seq[IndexedSeq[Option[Array[Byte]]]],
      pos: Long,
      presentMask: IndexedSeq[Boolean] = null,
      crc: Boolean = true): (Array[Byte], Long) = {
    val mask =
      if (presentMask == null) IndexedSeq.fill(cols.size)(true)
      else presentMask
    require(mask.size == cols.size)
    val isV1 = evType == EvWriteRowsV1 || evType == EvUpdateRowsV1 ||
      evType == EvDeleteRowsV1
    val w = new W
    w.le(tableId, 6).le(1L, 2) // flags
    if (!isV1) w.le(2L, 2)     // extra-data length (v2 framing only)
    w.lenenc(cols.size.toLong)
    val present = Array.fill[Byte]((cols.size + 7) / 8)(0)
    cols.indices.foreach(i => if (mask(i))
      present(i / 8) = (present(i / 8) | (1 << (i % 8))).toByte)
    w.bytes(present)
    if (evType == EvUpdateRowsV2 || evType == EvUpdateRowsV1)
      w.bytes(present) // after-image bitmap
    val presentIdx = cols.indices.filter(mask)
    images.foreach { img =>
      require(img.size == presentIdx.size,
        "image must carry exactly the present columns")
      val nullBitmap = new Array[Byte]((presentIdx.size + 7) / 8)
      img.zipWithIndex.foreach { case (v, i) =>
        if (v.isEmpty)
          nullBitmap(i / 8) = (nullBitmap(i / 8) | (1 << (i % 8))).toByte
      }
      w.bytes(nullBitmap)
      img.foreach(_.foreach(w.bytes))
    }
    event(ts, evType, w.result(), pos, crc)
  }

  // -------------------------------------------------------- gate file

  /** One standalone binlog file for document `id`: FDE, GTID, BEGIN,
    * TABLE_MAP, WRITE (2 rows, seeds 5id+0/1), UPDATE (before 5id+2 →
    * after 5id+3), DELETE (seed 5id+4), XID, ROTATE. */
  def gateFile(id: Long): Array[Byte] = {
    val ts = 1700000000L + id
    val tableId = 100 + (id % 50)
    def img(s: Long) = gateCols.map(_.enc(s))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(pos); out.write(bytes, 0, bytes.length)
      pos = next
    }
    emit(fdeEvent(ts, _))
    emit(gtidEvent(ts, id, _))
    emit(queryEvent(ts, "d", "BEGIN", _))
    emit(tableMapEvent(ts, tableId, "d", "wide", gateCols, _))
    emit(rowsEvent(ts, EvWriteRowsV2, tableId, gateCols,
      Seq(img(id * 5), img(id * 5 + 1)), _))
    emit(rowsEvent(ts, EvUpdateRowsV2, tableId, gateCols,
      Seq(img(id * 5 + 2), img(id * 5 + 3)), _))
    emit(rowsEvent(ts, EvDeleteRowsV2, tableId, gateCols,
      Seq(img(id * 5 + 4)), _))
    emit(xidEvent(ts, id + 7, _))
    emit(rotateEvent(ts, "graft-bin.000002", _))
    out.toByteArray
  }

  /** Decode a gate file into its flat image rows for the
    * `cdc_binlog_decode` gate: (imgKind, values) in binlog order, with
    * imgKind ∈ w0, w1, ub, ua, d. */
  def gateImages(id: Long): Seq[(String, RowImage)] =
    imagesOf(BinlogBinary.decodeFile(gateFile(id)))

  private def imagesOf(evs: Seq[BinlogEvent]): Seq[(String, RowImage)] =
    evs.collect {
      case Rows(_, _, 'w', _, rows) =>
        rows.zipWithIndex.map { case ((_, after), i) => (s"w$i", after.get) }
      case Rows(_, _, 'u', _, rows) =>
        rows.flatMap { case (b, a) => Seq(("ub", b.get), ("ua", a.get)) }
      case Rows(_, _, 'd', _, rows) =>
        rows.map { case (before, _) => ("d", before.get) }
    }.flatten

  // ---------------------------------------------- transaction payload

  /** TRANSACTION_PAYLOAD (event 40) writer: TLV fields per the
    * libbinlogevents codec grammar — compression type (2),
    * uncompressed size (3, compressed payloads only), payload size
    * (1), end mark (0) — then the payload bytes, zstd-compressed when
    * `zstd` (the only algorithm MySQL ships; NONE = 255 otherwise). */
  private[sources] def tpayloadEvent(ts: Long, inner: Array[Byte],
      zstd: Boolean, pos: Long): (Array[Byte], Long) = {
    val payload =
      if (zstd) com.github.luben.zstd.Zstd.compress(inner, 3) else inner
    val body = new W
    def field(tpe: Long, value: Long): Unit = {
      val vw = new W; vw.lenenc(value)
      val vb = vw.result()
      body.lenenc(tpe).lenenc(vb.length.toLong).bytes(vb)
    }
    field(2, if (zstd) 0L else 255L)
    if (zstd) field(3, inner.length.toLong)
    field(1, payload.length.toLong)
    body.lenenc(0) // end mark
    body.bytes(payload)
    event(ts, EvTransactionPayload, body.result(), pos)
  }

  /** The cdc_binlog_decode transaction, WRAPPED: FDE + GTID outside
    * (as MySQL writes them), the BEGIN / TABLE_MAP / rows / XID
    * stream inside one TRANSACTION_PAYLOAD — ZSTD for even ids,
    * compression NONE for odd; inner events carry no checksums per
    * the format. */
  def tpayloadGateFile(id: Long): Array[Byte] = {
    val ts = 1700000000L + id
    val tableId = 100 + (id % 50)
    def img(s: Long) = gateCols.map(_.enc(s))
    val innerOut = new java.io.ByteArrayOutputStream()
    var ipos = 0L
    def iemit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(ipos); innerOut.write(bytes, 0, bytes.length)
      ipos = next
    }
    iemit(queryEvent(ts, "d", "BEGIN", _, crc = false))
    iemit(tableMapEvent(ts, tableId, "d", "wide", gateCols, _,
      crc = false))
    iemit(rowsEvent(ts, EvWriteRowsV2, tableId, gateCols,
      Seq(img(id * 5), img(id * 5 + 1)), _, crc = false))
    iemit(rowsEvent(ts, EvUpdateRowsV2, tableId, gateCols,
      Seq(img(id * 5 + 2), img(id * 5 + 3)), _, crc = false))
    iemit(rowsEvent(ts, EvDeleteRowsV2, tableId, gateCols,
      Seq(img(id * 5 + 4)), _, crc = false))
    iemit(xidEvent(ts, id + 7, _, crc = false))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(pos); out.write(bytes, 0, bytes.length)
      pos = next
    }
    emit(fdeEvent(ts, _))
    emit(gtidEvent(ts, id, _))
    emit(tpayloadEvent(ts, innerOut.toByteArray, id % 2 == 0, _))
    emit(rotateEvent(ts, "graft-bin.000002", _))
    out.toByteArray
  }

  /** One decoded wrapped-transaction summary for `cdc_binlog_tpayload`:
    * the wrap marker's codec facts plus `match_plain` — the unwrapped
    * row images compared 1:1 against the PLAIN gate file's (whose 22
    * values per image `cdc_binlog_decode` already hash-pins), so the
    * payload route carries the full value-correctness weight without
    * re-deriving the images. */
  final case class TpayloadRow(doc_id: Long, compression: String,
      inner_events: Int, n_rows: Int, match_plain: Boolean)

  def tpayloadRowFor(id: Long): TpayloadRow = {
    val evs = BinlogBinary.decodeFile(tpayloadGateFile(id))
    val wrap = evs.collectFirst { case p: PayloadWrap => p }.get
    val imgs = imagesOf(evs)
    TpayloadRow(id, wrap.compression, wrap.innerEvents, imgs.size,
      imgs == gateImages(id))
  }

  /** One decoded gate image as a typed row for `cdc_binlog_decode`
    * (column names are the oracle's aliases; `ti`/`fl`/`db`/`dc` dodge
    * SQL keywords). */
  final case class GateRow(doc_id: Long, img: String, pk: Long, ti: Int,
      sh: Int, i24: Int, i32: Long, u32: Long, fl: Double, db: Double,
      vc: Option[String], vl: String, ch: String, bl: String,
      dt: Option[String], dt2: String, ts2: Long, tm: Long, yr: Int,
      dc: String, bt: Int, en: Int, st: Int, js: Option[String])

  /** Build, decode, and type the five gate images of one document —
    * the executor-side body of the `cdc_binlog_decode` gate. */
  def gateRowsFor(id: Long): Seq[GateRow] =
    gateImages(id).map { case (kind, v) =>
      GateRow(id, kind,
        pk = v(0).get.toLong, ti = v(1).get.toInt, sh = v(2).get.toInt,
        i24 = v(3).get.toInt, i32 = v(4).get.toLong, u32 = v(5).get.toLong,
        fl = v(6).get.toDouble, db = v(7).get.toDouble,
        vc = v(8), vl = v(9).get, ch = v(10).get, bl = v(11).get,
        dt = v(12), dt2 = v(13).get, ts2 = v(14).get.toLong,
        tm = v(15).get.toLong, yr = v(16).get.toInt, dc = v(17).get,
        bt = v(18).get.toInt, en = v(19).get.toInt, st = v(20).get.toInt,
        js = v(21))
    }

  /** The JSONB-focused gate document for `conv_jsonb_decode`: every
    * scalar type (int16/int32/int64 auto-sized, uint64 above
    * Long.MaxValue, double, literals, long strings with 2-byte
    * varlens), a nested object/array, and — every 20th id — a filler
    * array pushing the container past the 16-bit small format into the
    * 4-byte LARGE layout. Returns (decoded canonical text, wasLarge). */
  def jsonbGateDoc(id: Long): (String, Boolean) = {
    import JsonBinary._
    val entries = Seq.newBuilder[(String, JValue)]
    if (id % 20 == 0)
      entries += "big" -> JArray((0 until 230).map(i => JString(
        new String(letters(300, j => id + i + j), UTF_8))))
    entries += "dbl" -> JDouble((id % 1000) / 2.0)
    entries += "i16" -> JLong(id % 30000 - 15000)
    entries += "i32" -> JLong((id * 98765L) % 2000000000L - 1000000000L)
    entries += "i64" -> JLong(id * 1000000007L + 3000000000L)
    entries += "lit" -> ((id % 3) match {
      case 0 => JBool(true); case 1 => JBool(false); case _ => JNull })
    entries += "obj" -> JObject(Seq("k" -> JLong(id % 10),
      "m" -> JArray(Seq(JLong(id % 4), JString(s"z${id % 6}")))))
    entries += "str" -> JString(
      new String(letters(100 + id % 200, j => id + 2 * j), UTF_8))
    entries += "u64" -> JULong(Long.MinValue + id % 100)
    val bytes = encode(JObject(entries.result()))
    (render(decode(bytes)), (bytes(0) & 0xff) == TLargeObj)
  }

  // --------------------------------------------- replication segments

  private val custCols: IndexedSeq[Col] = IndexedSeq(
    Col("pk", LONGLONG, Array.empty, nullable = false, numeric = true,
      unsigned = false, _ => None),
    Col("name", VARCHAR, le(64, 2), nullable = false, numeric = false,
      unsigned = false, _ => None),
    Col("seg", VARCHAR, le(16, 2), nullable = false, numeric = false,
      unsigned = false, _ => None))

  private def custImg(pk: Long, name: String, seg: String)
      : IndexedSeq[Option[Array[Byte]]] =
    IndexedSeq(Some(le(pk, 8)),
      Some(pascal(1, name.getBytes(UTF_8))),
      Some(pascal(1, seg.getBytes(UTF_8))))

  /** One rotated binlog segment holding a shard of customer rows for
    * the `cdc_binlog_ingest` gate: inserts for every row, the seg
    * update for pk%5==0, the delete for pk%11==0 — the same change
    * pattern `cdc_debezium_ingest` replays over the JSON route, so the
    * two transports are oracle-verified to converge on the same FINAL
    * table. `withDdl` embeds the CREATE TABLE query event (segment 0,
    * like the connector's schema-history bootstrap). */
  def custSegment(rows: Seq[(Long, String, String)], withDdl: Boolean,
                  nextFile: String): Array[Byte] = {
    val ts = 1700000000L
    val tableId = 7L
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(pos); out.write(bytes, 0, bytes.length)
      pos = next
    }
    emit(fdeEvent(ts, _))
    if (withDdl)
      emit(queryEvent(ts, "d",
        "CREATE TABLE custs (pk bigint NOT NULL, name varchar(40), " +
          "seg varchar(12), PRIMARY KEY(pk))", _))
    var txn = 0L
    def transaction(body: => Unit): Unit = {
      emit(gtidEvent(ts, txn, _)); txn += 1
      emit(queryEvent(ts, "d", "BEGIN", _))
      emit(tableMapEvent(ts, tableId, "d", "custs", custCols, _))
      body
      emit(xidEvent(ts, txn, _))
    }
    // inserts in chunks of ≤100 rows per event (real servers split on
    // binlog_row_event_max_size the same way)
    rows.grouped(100).foreach { chunk =>
      transaction {
        emit(rowsEvent(ts, EvWriteRowsV2, tableId, custCols,
          chunk.map { case (pk, name, seg) => custImg(pk, name, seg) }, _))
      }
    }
    val updates = rows.filter(_._1 % 5 == 0)
    if (updates.nonEmpty) transaction {
      emit(rowsEvent(ts, EvUpdateRowsV2, tableId, custCols,
        updates.flatMap { case (pk, name, seg) =>
          Seq(custImg(pk, name, seg), custImg(pk, name, "UPDATED")) }, _))
    }
    val deletes = rows.filter(_._1 % 11 == 0)
    if (deletes.nonEmpty) transaction {
      emit(rowsEvent(ts, EvDeleteRowsV2, tableId, custCols,
        deletes.map { case (pk, name, seg) =>
          custImg(pk, name, if (pk % 5 == 0) "UPDATED" else seg) }, _))
    }
    emit(rotateEvent(ts, nextFile, _))
    out.toByteArray
  }

  // ------------------------------------------- MariaDB dialect segment

  val MariaServerVersion = "10.11.6-MariaDB-log"

  /** MariaDB FDE: same v4 grammar with a MariaDB server-version string,
    * a post-header length table long enough to describe the MariaDB
    * control events (160-163), checksum algorithm NONE — and, like a
    * checksum-aware server, the FDE itself still carries the alg byte
    * at end-5 (readers sniff it there; with alg=0 the 4 trailing bytes
    * are unverified padding and every FOLLOWING event is CRC-less). */
  private[sources] def mariaFdeEvent(ts: Long, pos: Long)
      : (Array[Byte], Long) = {
    val body = new W
    body.le(4L, 2)
    val ver = MariaServerVersion.getBytes(UTF_8)
    body.bytes(java.util.Arrays.copyOf(ver, 50))
    body.le(ts, 4)
    body.u8(19)
    val lens = new Array[Byte](EvMariaGtidList) // types 1..163
    lens(EvQuery - 1) = 13; lens(EvRotate - 1) = 8
    lens(EvFormatDescription - 1) = (2 + 50 + 4 + 1 + lens.length).toByte
    lens(EvXid - 1) = 0; lens(EvTableMap - 1) = 8
    lens(EvWriteRowsV1 - 1) = 8; lens(EvUpdateRowsV1 - 1) = 8
    lens(EvDeleteRowsV1 - 1) = 8
    lens(EvMariaAnnotateRows - 1) = 0; lens(EvMariaBinlogCheckpoint - 1) = 4
    lens(EvMariaGtid - 1) = 13; lens(EvMariaGtidList - 1) = 4
    body.bytes(lens)
    body.u8(0)      // checksum algorithm: NONE
    body.le(0L, 4)  // alg-byte offset convention keeps these 4 bytes
    event(ts, EvFormatDescription, body.result(), pos, crc = false)
  }

  private[sources] def mariaGtidEvent(ts: Long, domain: Long, seqNo: Long,
      serverId: Long, pos: Long): (Array[Byte], Long) = {
    val body = new W
    body.le(seqNo, 8).le(domain, 4).u8(0) // flags2: no optional fields
    event(ts, EvMariaGtid, body.result(), pos, crc = false, serverId)
  }

  private[sources] def mariaGtidListEvent(ts: Long,
      gtids: Seq[(Long, Long, Long)], pos: Long): (Array[Byte], Long) = {
    val body = new W
    body.le(gtids.size.toLong, 4) // top 4 bits (flags) zero
    gtids.foreach { case (domain, server, seq) =>
      body.le(domain, 4).le(server, 4).le(seq, 8)
    }
    event(ts, EvMariaGtidList, body.result(), pos, crc = false)
  }

  private[sources] def mariaCheckpointEvent(ts: Long, file: String,
      pos: Long): (Array[Byte], Long) = {
    val nb = file.getBytes(UTF_8)
    event(ts, EvMariaBinlogCheckpoint, le(nb.length.toLong, 4) ++ nb,
      pos, crc = false)
  }

  private[sources] def mariaAnnotateEvent(ts: Long, sql: String, pos: Long)
      : (Array[Byte], Long) =
    event(ts, EvMariaAnnotateRows, sql.getBytes(UTF_8), pos, crc = false)

  /** One MariaDB-dialect binlog segment over the SAME customer change
    * pattern as [[custSegment]] (inserts all, update seg for pk%5==0,
    * delete pk%11==0), so the `cdc_binlog_mariadb` gate verifies the
    * dialect converges on the identical replica: v1 rows events (no
    * extra-data field), binlog_checksum=NONE (no per-event CRC), and
    * the MariaDB control chatter a real 10.x log carries — GTID_LIST +
    * BINLOG_CHECKPOINT after the FDE, then per transaction the MariaDB
    * GTID (162) and ANNOTATE_ROWS ahead of each rows event
    * (reference dialect handling: binlogstream.py:186, 396-397,
    * constants/BINLOG.py:47). TABLE_MAP still carries the FULL
    * metadata TLVs (MariaDB 10.5+ binlog_row_metadata=FULL — without
    * COLUMN_NAME a file-only consumer cannot key rows). */
  def mariaSegment(rows: Seq[(Long, String, String)], withDdl: Boolean,
                   nextFile: String): Array[Byte] = {
    val ts = 1700000100L
    val tableId = 9L
    val serverId = 3L
    val domain = 0L
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(pos); out.write(bytes, 0, bytes.length)
      pos = next
    }
    emit(mariaFdeEvent(ts, _))
    emit(mariaGtidListEvent(ts, Seq((domain, serverId, 0L)), _))
    emit(mariaCheckpointEvent(ts, "maria-bin.000001", _))
    if (withDdl)
      emit(queryEvent(ts, "d",
        "CREATE TABLE custs (pk bigint NOT NULL, name varchar(40), " +
          "seg varchar(12), PRIMARY KEY(pk))", _, crc = false))
    var txn = 1L
    def transaction(annotate: String)(body: => Unit): Unit = {
      emit(mariaGtidEvent(ts, domain, txn, serverId, _)); txn += 1
      emit(mariaAnnotateEvent(ts, annotate, _))
      emit(tableMapEvent(ts, tableId, "d", "custs", custCols, _,
        crc = false))
      body
      emit(xidEvent(ts, txn, _, crc = false))
    }
    rows.grouped(100).foreach { chunk =>
      transaction("INSERT INTO custs VALUES (...)") {
        emit(rowsEvent(ts, EvWriteRowsV1, tableId, custCols,
          chunk.map { case (pk, name, seg) => custImg(pk, name, seg) }, _,
          crc = false))
      }
    }
    val updates = rows.filter(_._1 % 5 == 0)
    if (updates.nonEmpty)
      transaction("UPDATE custs SET seg = 'UPDATED' WHERE pk % 5 = 0") {
        emit(rowsEvent(ts, EvUpdateRowsV1, tableId, custCols,
          updates.flatMap { case (pk, name, seg) =>
            Seq(custImg(pk, name, seg), custImg(pk, name, "UPDATED")) }, _,
          crc = false))
      }
    val deletes = rows.filter(_._1 % 11 == 0)
    if (deletes.nonEmpty)
      transaction("DELETE FROM custs WHERE pk % 11 = 0") {
        emit(rowsEvent(ts, EvDeleteRowsV1, tableId, custCols,
          deletes.map { case (pk, name, seg) =>
            custImg(pk, name, if (pk % 5 == 0) "UPDATED" else seg) }, _,
          crc = false))
      }
    emit(rotateEvent(ts, nextFile, _, crc = false))
    out.toByteArray
  }

  // ------------------------------------------ partial-JSON gate file

  /** The before-image JSON document of the partial-update gate:
    * single-character keys so MySQL key order (length, then bytes) is
    * plain lexicographic and the oracle can build the text by concat. */
  private def partialBefore(s: Long): JsonBinary.JValue = {
    import JsonBinary._
    JObject(Seq(
      "a" -> JLong(s % 1000 - 500),
      "b" -> JString(s"t${s % 7}"),
      "c" -> JArray(Seq(JLong(s % 5), JLong(s % 11), JLong(s % 17))),
      "d" -> JObject(Seq("x" -> JLong(s % 13),
        "y" -> JString(s"u${s % 3}")))))
  }

  /** The gate's diff sequence: REPLACE on a member / nested member /
    * array element, INSERT of a new member and an array append, REMOVE
    * of a member (top-level every 3rd id, nested every 4th) — every
    * path shape and operation of the diff grammar. */
  private def partialDiffs(s: Long)
      : Seq[(Int, String, Option[JsonBinary.JValue])] = {
    import JsonBinary._
    Seq(
      (DiffReplace, "$.a", Some(JLong(s % 100 - 50))),
      if (s % 3 == 0) (DiffRemove, "$.b", None)
      else (DiffReplace, "$.b", Some(JString(s"r${s % 19}"))),
      (DiffReplace, "$.c[1]", Some(JLong(s % 9))),
      (DiffInsert, "$.c[3]", Some(JLong(s % 23))),
      (DiffInsert, "$.e", Some(JString(s"n${s % 7}"))),
      if (s % 4 == 0) (DiffRemove, "$.d.y", None)
      else (DiffReplace, "$.d.y", Some(JString(s"w${s % 5}"))))
  }

  private val partialCols: IndexedSeq[Col] = IndexedSeq(
    Col("pk", LONGLONG, Array.empty, nullable = false, numeric = true,
      unsigned = false, _ => None),
    Col("js", JSON, Array(4.toByte), nullable = true, numeric = false,
      unsigned = false, _ => None))

  /** PARTIAL_UPDATE_ROWS_EVENT (39): v2 framing, and each AFTER image
    * is prefixed by lenenc value_options (bit 0 = PARTIAL_JSON) and
    * partial_bits (one bit per JSON column present in the after
    * image); a partial JSON column's value is a length-prefixed DIFF
    * SEQUENCE instead of a JSONB document. */
  private[sources] def partialUpdateEvent(ts: Long, tableId: Long,
      cols: IndexedSeq[Col],
      rows: Seq[(IndexedSeq[Option[Array[Byte]]],
                 IndexedSeq[Option[Array[Byte]]], Array[Byte])],
      pos: Long): (Array[Byte], Long) = {
    val w = new W
    w.le(tableId, 6).le(1L, 2).le(2L, 2)
    w.lenenc(cols.size.toLong)
    val present = Array.fill[Byte]((cols.size + 7) / 8)(0)
    cols.indices.foreach(i =>
      present(i / 8) = (present(i / 8) | (1 << (i % 8))).toByte)
    w.bytes(present); w.bytes(present)
    val nJson = cols.count(_.typeByte == JSON)
    rows.foreach { case (before, after, partialBits) =>
      require(partialBits.length == (nJson + 7) / 8)
      def image(img: IndexedSeq[Option[Array[Byte]]]): Unit = {
        val nullBitmap = new Array[Byte]((cols.size + 7) / 8)
        img.zipWithIndex.foreach { case (v, i) =>
          if (v.isEmpty)
            nullBitmap(i / 8) = (nullBitmap(i / 8) | (1 << (i % 8))).toByte
        }
        w.bytes(nullBitmap)
        img.foreach(_.foreach(w.bytes))
      }
      image(before)
      w.lenenc(1L) // value_options: PARTIAL_JSON
      w.bytes(partialBits)
      image(after)
    }
    event(ts, EvPartialUpdateRows, w.result(), pos)
  }

  /** One gate file for document `id`: WRITE of (pk, full JSONB doc),
    * then a PARTIAL_UPDATE whose after image carries the diff sequence
    * of [[partialDiffs]]. MySQL framing (CRC32, v2, GTID/BEGIN/XID). */
  def partialGateFile(id: Long): Array[Byte] = {
    import JsonBinary._
    val ts = 1700000000L + id
    val tableId = 200 + (id % 50)
    val doc = partialBefore(id)
    val docBytes = encode(doc)
    val fullJs = le(docBytes.length.toLong, 4) ++ docBytes
    val diffBytes = encodeDiffs(partialDiffs(id))
    val diffJs = le(diffBytes.length.toLong, 4) ++ diffBytes
    def img(js: Array[Byte]) =
      IndexedSeq[Option[Array[Byte]]](Some(le(id, 8)), Some(js))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'), 0, 4)
    var pos = 4L
    def emit(f: Long => (Array[Byte], Long)): Unit = {
      val (bytes, next) = f(pos); out.write(bytes, 0, bytes.length)
      pos = next
    }
    emit(fdeEvent(ts, _))
    emit(gtidEvent(ts, id, _))
    emit(queryEvent(ts, "d", "BEGIN", _))
    emit(tableMapEvent(ts, tableId, "d", "jdoc", partialCols, _))
    emit(rowsEvent(ts, EvWriteRowsV2, tableId, partialCols,
      Seq(img(fullJs)), _))
    emit(partialUpdateEvent(ts, tableId, partialCols,
      Seq((img(fullJs), img(diffJs), Array(1.toByte))), _))
    emit(xidEvent(ts, id + 3, _))
    emit(rotateEvent(ts, "graft-bin.000002", _))
    out.toByteArray
  }

  /** Decoded gate row for `cdc_binlog_partial`: the WRITE image is the
    * before document, the partial UPDATE's materialized after image is
    * the after document. */
  final case class PartialGateRow(doc_id: Long, pk: Long, n_diffs: Int,
      before_js: String, after_js: String)

  def partialGateRowFor(id: Long): PartialGateRow = {
    val events = BinlogBinary.decodeFile(partialGateFile(id))
    val before = events.collectFirst {
      case Rows(_, _, 'w', _, rs) => rs.head._2.get
    }.getOrElse(sys.error(s"gate file $id: no write image"))
    val after = events.collectFirst {
      case Rows(_, _, 'u', _, rs) => rs.head._2.get
    }.getOrElse(sys.error(s"gate file $id: no update image"))
    PartialGateRow(id, after(0).get.toLong, partialDiffs(id).size,
      before(1).get, after(1).get)
  }
}

/** Tails a directory of rotated binlog segment files (`*.bin`, name
  * order) through [[BinlogBinary.decodeFile]] →
  * [[BinlogBinary.toSourceEvents]] → the [[SpoolProducer]] — the
  * binlog-file twin of [[DebeziumTail]], playing the reference's
  * binlog_replicator role over `mysqlbinlog`-style rotated logs.
  * Segments are immutable once rotated (the server appends only to the
  * newest), so resume state is simply the last fully-processed file
  * name, serialized into the producer's `source_pos`; the newest file
  * is only consumed once a later file exists or `consumeActive` is set
  * (a half-written active segment would fail its trailing CRC). */
final class BinlogTail(dumpDir: String, producer: SpoolProducer,
                       consumeActive: Boolean = false) {

  private var lastDone: Option[String] = producer.sourcePos

  /** Process newly-rotated segments; returns events appended. */
  def tick(): Int = {
    val dir = new java.io.File(dumpDir)
    // Segments order by their NUMERIC rotation suffix, not raw name:
    // plain string order skips the b.999999 → b.1000000 rollover (and
    // mis-sorts non-zero-padded logs), replaying or dropping segments
    // at exactly the moment a long-lived server wraps its counter.
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".bin"))
      .sortBy(f => BinlogTail.segmentOrder(f.getName))
    val ord = implicitly[Ordering[(String, Long)]]
    val pending = files.filter(f => lastDone.forall(done =>
      ord.lt(BinlogTail.segmentOrder(done),
        BinlogTail.segmentOrder(f.getName))))
    val ready =
      if (consumeActive) pending
      else pending.dropRight(1) // newest may still be mid-append
    var appended = 0
    ready.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val events = BinlogBinary.toSourceEvents(BinlogBinary.decodeFile(bytes))
      producer.append(events, Some(f.getName))
      appended += events.size
      lastDone = Some(f.getName)
    }
    appended
  }
}

object BinlogTail {
  /** Sort key for rotated segment names: (base name, numeric suffix) —
    * MySQL/MariaDB name segments `<base>.<NNNNNN>` where the counter
    * can outgrow its zero-padding, so `b.999999` must precede
    * `b.1000000`. Names with no numeric suffix order by raw name with
    * suffix -1 (before any numbered sibling of the same base). */
  private[sources] def segmentOrder(name: String): (String, Long) = {
    val stem = if (name.endsWith(".bin")) name.dropRight(4) else name
    val dot = stem.lastIndexOf('.')
    val suffix = if (dot < 0) "" else stem.substring(dot + 1)
    if (suffix.nonEmpty && suffix.forall(_.isDigit) && suffix.length <= 18)
      (stem.substring(0, dot), suffix.toLong)
    else (stem, -1L)
  }
}

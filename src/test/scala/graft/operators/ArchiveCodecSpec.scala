package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import ArchiveCodec._

/** gzip member walk (RFC 1952) + WARC/1.0 record grammar — verified
  * against hand-built streams, flag combinations, and corruption.
  */
class ArchiveCodecSpec extends AnyFunSuite {

  private def text(n: Int, seed: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ('a' + (seed + i) % 26).toByte)

  test("gzip: every optional-header combination round-trips") {
    // seeds 0..11 cover FEXTRA (s%3==0), FCOMMENT (s%4==1),
    // FHCRC (s%2==1), FNAME on/off
    (0L until 12L).foreach { s =>
      val data = text(500 + s.toInt * 13, s.toInt)
      val name = if (s % 5 == 0) Some(s"f$s.txt") else None
      val gz = gzipMember(data, s, name)
      val members = gunzipMembers(gz).get
      assert(members.size === 1, s"seed=$s")
      assert(members.head.data.toSeq === data.toSeq, s"seed=$s")
      assert(members.head.name === name, s"seed=$s")
      assert(members.head.compressedLen === gz.length)
    }
  }

  test("gzip: multi-member concatenation walks in order") {
    val a = text(100, 1); val b = text(9000, 2); val c = text(3, 3)
    val gz = gzipMember(a, 0, Some("a")) ++ gzipMember(b, 1, None) ++
      gzipMember(c, 3, Some("c"))
    val ms = gunzipMembers(gz).get
    assert(ms.map(_.data.length) === Seq(100, 9000, 3))
    assert(ms.map(_.name) === Seq(Some("a"), None, Some("c")))
  }

  test("gzip: trailer CRC, ISIZE, header CRC, magic all verified") {
    val data = text(400, 7)
    val gz = gzipMember(data, 1, Some("x")) // seed 1 → FHCRC on
    // CRC32 trailer (8 bytes from end: crc then isize)
    val badCrc = gz.clone(); badCrc(gz.length - 6) =
      (badCrc(gz.length - 6) ^ 1).toByte
    assert(gunzipMembers(badCrc).isEmpty)
    val badIsize = gz.clone(); badIsize(gz.length - 2) =
      (badIsize(gz.length - 2) ^ 1).toByte
    assert(gunzipMembers(badIsize).isEmpty)
    // header CRC (FHCRC): flip a header byte (MTIME)
    val badHdr = gz.clone(); badHdr(4) = (badHdr(4) ^ 1).toByte
    assert(gunzipMembers(badHdr).isEmpty)
    // magic
    val badMagic = gz.clone(); badMagic(0) = 0x1e
    assert(gunzipMembers(badMagic).isEmpty)
    // truncation mid-deflate
    assert(gunzipMembers(gz.take(gz.length / 2)).isEmpty)
  }

  test("warc: records parse with framing and HTTP envelope") {
    val doc = "hello warc world " * 20
    val gz = buildWarcGz(42, doc)
    val members = gunzipMembers(gz).get
    assert(members.size === 3)
    val records = parseWarcRecords(members.flatMap(_.data).toArray).get
    assert(records.map(_.warcType) === Seq("warcinfo", "request",
      "response"))
    val resp = records(2)
    assert(resp.targetUri ===
      Some("https://www.site2.example.com/doc/42"))
    assert(resp.httpStatus === 200)
    assert(new String(resp.body, "UTF-8") === doc)
    assert(resp.contentLength ===
      63 + doc.length.toString.length + doc.length)
  }

  test("warc: bad framing rejected") {
    val good = gunzipMembers(buildWarcGz(7, "abc"))
      .get.flatMap(_.data).toArray
    // corrupt the version line
    val bad = good.clone(); bad(0) = 'X'
    assert(parseWarcRecords(bad).isEmpty)
    // truncate inside the last record separator
    assert(parseWarcRecords(good.take(good.length - 2)).isEmpty)
    // declared Content-Length larger than the remaining bytes
    val s = new String(good, "UTF-8")
    val inflated = s.replaceFirst("Content-Length: \\d+",
      "Content-Length: 99999")
    assert(parseWarcRecords(inflated.getBytes("UTF-8")).isEmpty)
  }

  test("zip: stored + deflated entries round-trip with EOCD comments") {
    (0L until 9L).foreach { id =>
      val doc = s"document $id body " * (10 + id.toInt)
      val entries = unzipEntries(buildZip(id, doc)).get
      assert(entries.map(_.name) === Seq("meta.json", "doc.txt", "pad.bin"))
      assert(new String(entries(0).data, "UTF-8") === s"""{"id":$id}""")
      assert(entries(0).method === 0)
      assert(entries(1).method === 8)
      assert(new String(entries(1).data, "UTF-8") === doc)
      assert(entries(2).data.length === (10 + id % 30).toInt)
    }
  }

  test("zip: corrupted CRC, truncation, wrong local name all rejected") {
    val zip = buildZip(5, "payload text " * 30)
    // find the central directory and corrupt the doc.txt CRC there
    val s = zip.indexOfSlice("doc.txt".getBytes("UTF-8"))
    assert(s > 0)
    // the SECOND occurrence is in the central directory
    val s2 = zip.indexOfSlice("doc.txt".getBytes("UTF-8"), s + 1)
    assert(s2 > s)
    val badCrc = zip.clone()
    badCrc(s2 - 46 + 16) = (badCrc(s2 - 46 + 16) ^ 1).toByte
    assert(unzipEntries(badCrc).isEmpty)
    // EOCD count mismatch
    val badCount = zip.clone()
    val eocd = {
      var i = zip.length - 22
      while (!(zip(i) == 'P' && zip(i + 1) == 'K' && zip(i + 2) == 5 &&
        zip(i + 3) == 6)) i -= 1
      i
    }
    badCount(eocd + 10) = 9
    assert(unzipEntries(badCount).isEmpty)
    // truncation
    assert(unzipEntries(zip.take(zip.length / 2)).isEmpty)
    assert(unzipEntries(Array[Byte](1, 2, 3)).isEmpty)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Vp8Codec._

/** VP8 keyframe bitstream mechanics (RFC 6386): the bool-coder pair
  * is property-tested against itself (encode→decode identity over
  * LCG-driven bit/probability sequences — this validates the
  * arithmetic-coding renormalization and carry paths without trusting
  * either side), the transforms are pinned to their DC closed forms,
  * and the full frame decode is checked against an INDEPENDENT
  * reimplementation of the DC-only reconstruction recurrence (the
  * same arithmetic the DuckDB oracle replays). */
class Vp8CodecSpec extends AnyFunSuite {

  test("bool coder: encode/decode identity across probs and carries") {
    var s = 987654321L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33
    }
    val n = 5000
    val probs = Array.tabulate(n)(_ => 1 + (next() % 254).toInt)
    val bits = Array.tabulate(n)(_ => (next() % 2).toInt)
    val e = new BoolEnc
    var i = 0
    while (i < n) { e.bool(probs(i), bits(i)); i += 1 }
    // skewed tail: long runs of 1s at high prob force carry chains
    val tailProbs = Array.fill(600)(250)
    val tailBits = Array.fill(600)(1)
    tailProbs.indices.foreach(j => e.bool(tailProbs(j), tailBits(j)))
    val enc = e.result()
    val d = new BoolDec(enc, 0, enc.length)
    i = 0
    while (i < n) {
      assert(d.bool(probs(i)) === bits(i), s"bit $i"); i += 1
    }
    tailProbs.indices.foreach(j =>
      assert(d.bool(tailProbs(j)) === tailBits(j), s"tail $j"))
    assert(d.overrun === 0)
  }

  test("bool coder: literals and signed values round-trip") {
    val e = new BoolEnc
    val vals = Seq((3, 5), (7, 100), (2, 0), (6, 63), (7, 127))
    vals.foreach { case (w, v) => e.literal(w, v) }
    val svals = Seq((4, -7), (4, 7), (4, 0), (4, -15))
    svals.foreach { case (w, v) => e.signed(w, v) }
    val enc = e.result()
    val d = new BoolDec(enc, 0, enc.length)
    vals.foreach { case (w, v) => assert(d.literal(w) === v) }
    svals.foreach { case (w, v) => assert(d.signed(w) === v) }
  }

  test("transforms: DC-only closed forms") {
    for (dc <- Seq(-600, -9, -1, 0, 1, 5, 123, 600)) {
      val w = iwalsh(Array(dc) ++ Array.fill(15)(0))
      assert(w.toSeq === Seq.fill(16)((dc + 3) >> 3), s"iwalsh dc=$dc")
      val p = idct4x4(Array(dc) ++ Array.fill(15)(0))
      assert(p.toSeq === Seq.fill(16)((dc + 4) >> 3), s"idct dc=$dc")
    }
  }

  /** Independent DC-only reconstruction recurrence — the oracle's
    * arithmetic, written a second time from the spec. */
  private def expected(id: Long, n: Long): (Int, Int, Int,
      Double, Double, Double) = {
    val mw = 1 + (n % 3).toInt; val mh = 1 + ((n / 3) % 3).toInt
    val q = (id % 32).toInt
    def clamp(v: Int) = math.max(0, math.min(255, v))
    def grid(rFor: (Int, Int) => Int,
             modeFor: (Int, Int) => Int): Array[Array[Int]] = {
      val g = Array.ofDim[Int](mh, mw)
      for (i <- 0 until mh; j <- 0 until mw) {
        val a = if (i > 0) g(i - 1)(j) else -1
        val l = if (j > 0) g(i)(j - 1) else -1
        val d = if (i > 0 && j > 0) g(i - 1)(j - 1) else -1
        val pred = modeFor(i, j) match {
          case 0 =>
            if (a < 0 && l < 0) 128
            else if (a < 0) l
            else if (l < 0) a
            else (16 * a + 16 * l + 16) >> 5
          case 1 => if (a < 0) 127 else a
          case 2 => if (l < 0) 129 else l
          case _ =>
            val tl = if (l < 0) 129 else l
            val ta = if (a < 0) 127 else a
            val tc = if (a < 0) 127 else if (l < 0) 129 else d
            clamp(tl + ta - tc)
        }
        g(i)(j) = clamp(pred + rFor(i, j))
      }
      g
    }
    val gy = grid((i, j) => {
      val lvl = ((i + 2 * j + id) % 9).toInt - 4
      (((lvl * (2 * (4 + q)) + 3) >> 3) + 4) >> 3
    }, (i, j) => ((i + j + id) % 4).toInt)
    val gu = grid((i, j) => {
      val lvl = ((2 * i + j + id) % 7).toInt - 3
      (lvl * (4 + q) + 4) >> 3
    }, (i, j) => ((i + 2 * j + id) % 4).toInt)
    val gv = grid((i, j) => {
      val lvl = ((i + 3 * j + 2 * id) % 7).toInt - 3
      (lvl * (4 + q) + 4) >> 3
    }, (i, j) => ((i + 2 * j + id) % 4).toInt)
    def mean(g: Array[Array[Int]]): Double =
      g.flatten.sum.toDouble / (mw * mh)
    (16 * mw, 16 * mh, q, mean(gy), mean(gu), mean(gv))
  }

  test("frame decode matches the independent recurrence") {
    // ids sweep all four modes at every grid position, negative and
    // positive levels, and qindex 0..31
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 13L, 31L, 100L);
         n <- Seq(0L, 1L, 2L, 4L, 8L)) {
      val px = parseVp8Pixels(id, buildVp8Frame(id, n)).get
      val (w, h, q, my, mu, mv) = expected(id, n)
      assert(px.width === w && px.height === h && px.qindex === q,
        s"id=$id n=$n")
      assert(px.meanY === my, s"Y id=$id n=$n")
      assert(px.meanU === mu, s"U id=$id n=$n")
      assert(px.meanV === mv, s"V id=$id n=$n")
    }
  }

  test("lossy webp: RIFF walk finds the VP8 frame; sizes verified") {
    for (id <- Seq(0L, 3L, 9L); n <- Seq(2L, 6L)) {
      val f = buildWebpLossy(id, n)
      val px = parseWebpLossy(id, f).get
      // the embedded frame uses shifted seeds
      val inner = parseVp8Pixels(id, buildVp8Frame(2 * id + 1, n + 5)).get
      assert(px === inner)
    }
    val good = buildWebpLossy(1L, 2L)
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(parseWebpLossy(1L, badSize).isEmpty)
    val badTag = good.clone(); badTag(12) = 'X'
    assert(parseWebpLossy(1L, badTag).isEmpty)
    assert(parseWebpLossy(1L, good.take(30)).isEmpty)
  }

  test("webm: EBML walk decodes every V_VP8 SimpleBlock frame") {
    for (id <- Seq(0L, 2L, 11L); n <- Seq(0L, 4L, 7L)) {
      val wf = parseWebmFrames(id, buildWebmVideo(id, n)).get
      val nFrames = (3 + n % 5).toInt
      assert(wf.nFrames === nFrames, s"id=$id n=$n")
      // per-frame sums equal the standalone frames' plane sums
      var sy = 0L; var su = 0L; var sv = 0L
      for (k <- 0 until nFrames) {
        val (_, _, _, y, u, v) =
          decodeFrame(buildVp8Frame(id + 31 * k, n)).get
        sy += y.foldLeft(0L)(_ + _)
        su += u.foldLeft(0L)(_ + _)
        sv += v.foldLeft(0L)(_ + _)
      }
      assert(wf.sumY === sy && wf.sumU === su && wf.sumV === sv)
    }
    // a corrupted EBML size or block header is data, not a failure
    val good = buildWebmVideo(1L, 3L)
    assert(parseWebmFrames(1L, good.take(good.length / 2)).isEmpty)
    val bad = good.clone(); bad(5) = (bad(5) ^ 0x7f).toByte
    parseWebmFrames(1L, bad) // totality
  }

  test("out-of-profile and corrupt frames are data, not failures") {
    val good = buildVp8Frame(5L, 4L)
    assert(parseVp8Pixels(5L, good).isDefined)
    // interframe bit set
    val inter = good.clone(); inter(0) = (inter(0) | 1).toByte
    assert(parseVp8Pixels(5L, inter).isEmpty)
    // broken start code
    val sc = good.clone(); sc(3) = 0x00
    assert(parseVp8Pixels(5L, sc).isEmpty)
    // truncations at every prefix must never throw
    (0 until good.length by 7).foreach { cut =>
      parseVp8Pixels(5L, good.take(cut)) // totality
    }
    // a flipped byte in partition 1 either rejects or decodes to
    // something (bool streams have no checksum) — never a crash
    val flip = good.clone()
    flip(12) = (flip(12) ^ 0x40).toByte
    parseVp8Pixels(5L, flip)
  }
}

package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** weightedSample's monotone-mixture contract rests entirely on
  * weightHex: raising a weight must never shrink the kept set, which
  * holds iff the hex threshold is monotone in the weight (string order
  * on fixed-width lowercase hex == numeric order). */
object SamplingPropSpec extends Properties("Sampling") {
  private val weight = Gen.chooseNum(0.0, 1.0)

  property("weightHex is monotone and fixed-width below 1.0") =
    forAll(weight, weight) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (hl, hh) = (Sampling.weightHex(lo), Sampling.weightHex(hi))
      hl <= hh && (hi >= 1.0 || (hl.length == 8 && hh.length == 8))
    }

  property("weightHex clamps out-of-range weights") = forAll(
    Gen.oneOf(-1.5, -0.0, 2.5, 1e9)) { w =>
    val h = Sampling.weightHex(w)
    (w <= 0.0 && h == "00000000") || (w >= 1.0 && h == "g")
  }

  // weight 1.0 must keep ALL rows: "g" sorts above every 8-hex prefix,
  // so `substring(md5, 1, 8) < weightHex(1.0)` is a tautology
  property("weight 1.0 threshold beats every hex prefix") = forAll(
    Gen.listOfN(8, Gen.oneOf(("0123456789abcdef": Seq[Char])))) { cs =>
    cs.mkString < Sampling.weightHex(1.0)
  }
}

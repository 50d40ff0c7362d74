package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** weightedSample's monotone-mixture contract rests entirely on
  * weightHex: raising a weight must never shrink the kept set, which
  * holds iff the hex threshold is monotone in the weight (string order
  * on fixed-width lowercase hex == numeric order). */
object SamplingPropSpec extends Properties("Sampling") {
  private val weight = Gen.chooseNum(0.0, 1.0)

  property("weightHex is monotone and fixed-width") = forAll(weight, weight) {
    (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (hl, hh) = (Sampling.weightHex(lo), Sampling.weightHex(hi))
      hl.length == 8 && hh.length == 8 && hl <= hh
  }

  property("weightHex clamps out-of-range weights") = forAll(
    Gen.oneOf(-1.5, -0.0, 1.0, 2.5, 1e9)) { w =>
    val h = Sampling.weightHex(w)
    (w <= 0.0 && h == "00000000") || (w >= 1.0 && h == "ffffffff") ||
      (h >= "00000000" && h <= "ffffffff")
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import UrlCanonicalize.{canonicalize, pctNormalize, removeDotSegments}

/** RFC 3986 §6 normalization — hand cases including the RFC's own
  * §5.2.4 dot-segment examples, plus the two crawl-pipeline
  * conventions (sorted params, dropped fragment) and the fixture's
  * pair-collapse property.
  */
class UrlCanonSpec extends AnyFunSuite {

  test("remove_dot_segments: the RFC §5.2.4 examples") {
    assert(removeDotSegments("/a/b/c/./../../g") === "/a/g")
    assert(removeDotSegments("mid/content=5/../6") === "mid/6")
    assert(removeDotSegments("/./x") === "/x")
    assert(removeDotSegments("/x/..") === "/")
    assert(removeDotSegments("/..") === "/")
    assert(removeDotSegments("/a//b/../c") === "/a//c") // double slash kept
  }

  test("percent normalization: decode unreserved, uppercase the rest") {
    assert(pctNormalize("%7Euser") === "~user")
    assert(pctNormalize("%61%2D%2f") === "a-%2F") // '/' is reserved
    assert(pctNormalize("%3f") === "%3F")
    assert(pctNormalize("100%zz") === "100%zz") // broken escape intact
    assert(pctNormalize("%") === "%")
  }

  test("full canonicalization: case, ports, params, fragment") {
    assert(canonicalize("HTTP://WWW.Ex.COM:80/a/../b?z=1&a=2#f") ===
      "http://www.ex.com/b?a=2&z=1")
    assert(canonicalize("https://Ex.com:443/") === "https://ex.com/")
    assert(canonicalize("https://ex.com:8443/x") === "https://ex.com:8443/x")
    assert(canonicalize("http://ex.com") === "http://ex.com/")
    assert(canonicalize("http://ex.com?b&a") === "http://ex.com/?a&b")
    // path case is significant and survives
    assert(canonicalize("http://ex.com/CaSe") === "http://ex.com/CaSe")
    // userinfo preserved, host still lowercased
    assert(canonicalize("http://u:p@Ex.com/x") === "http://u:p@ex.com/x")
    // IPv6 literal: colons inside brackets are not ports; :80 after is
    assert(canonicalize("http://[2001:DB8::1]:80/x") ===
      "http://[2001:db8::1]/x")
    assert(canonicalize("http://[2001:DB8::1]:8080/x") ===
      "http://[2001:db8::1]:8080/x")
  }

  test("unparseable inputs are NULL, not failures") {
    assert(canonicalize("not a url") === null)
    assert(canonicalize("http://") === null)
    assert(canonicalize("://host/x") === null)
  }

  test("fixture pairs collapse to one canonical form") {
    (0L until 40L by 2).foreach { s =>
      val even = canonicalize(graft.queries.messyUrl(s))
      val odd = canonicalize(graft.queries.messyUrl(s + 1))
      assert(even === odd, s"pair $s")
      assert(even != null)
      // and distinct pairs stay distinct
      val other = canonicalize(graft.queries.messyUrl(s + 2))
      assert(even !== other)
    }
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Robots._

/** RFC 9309 semantics on hand cases: group exclusivity, longest-match,
  * Allow ties, wildcards with backtracking, the $ anchor, empty
  * Disallow, parser tolerance. */
class RobotsSpec extends AnyFunSuite {

  test("pattern matching: wildcards, anchors, backtracking") {
    assert(patternMatches("/tmp*", "/tmp/abc"))
    assert(patternMatches("/tmp*", "/tmp"))
    assert(!patternMatches("/tmp*", "/tm"))
    assert(patternMatches("/a*b*c", "/aXbYbZc-tail")) // needs backtrack
    assert(patternMatches("/p/pub$", "/p/pub"))
    assert(!patternMatches("/p/pub$", "/p/pub2"))
    assert(patternMatches("/*.php$", "/x/y.php"))
    assert(!patternMatches("/*.php$", "/x/y.php?q=1"))
    assert(patternMatches("/", "/anything"))
  }

  test("longest match wins; Allow wins ties; empty Disallow is no-op") {
    val g = parse(
      """User-agent: bot
        |Disallow: /dir/
        |Allow: /dir/ok
        |Disallow:
        |""".stripMargin)
    assert(!allowed(g, "bot", "/dir/x"))
    assert(allowed(g, "bot", "/dir/ok-page")) // longer Allow wins
    assert(allowed(g, "bot", "/elsewhere"))   // empty Disallow no-op
    // exact tie: Allow wins
    val t = parse("User-agent: bot\nDisallow: /p/\nAllow: /p/\n")
    assert(allowed(t, "bot", "/p/x"))
  }

  test("group exclusivity and UA prefix selection") {
    val g = parse(
      """User-agent: megabot
        |User-agent: graftbot
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /tmp
        |""".stripMargin)
    // graftbot/2.1 selects the specific group: /tmp is NOT disallowed
    assert(allowed(g, "graftbot/2.1", "/tmp/x"))
    assert(!allowed(g, "graftbot/2.1", "/private/x"))
    // unknown agent falls to *
    assert(!allowed(g, "unknown", "/tmp/x"))
    assert(allowed(g, "unknown", "/private/x"))
    // no groups at all → allowed
    assert(allowed(parse("# nothing here"), "any", "/x"))
  }

  test("same-token groups merge; product-token identity, not prefix") {
    // RFC 9309 §2.2.1: repeated blocks naming the same token are ONE
    // group — the second * block's rules must not be dropped
    val g = parse(
      """User-agent: *
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /b/
        |""".stripMargin)
    assert(!allowed(g, "anybot", "/a/x"))
    assert(!allowed(g, "anybot", "/b/x")) // merged, not first-wins
    // specific-token merge too
    val s = parse(
      """User-agent: graftbot
        |Disallow: /one/
        |
        |User-agent: graftbot
        |Allow: /one/ok
        |""".stripMargin)
    assert(!allowed(s, "graftbot/3.0", "/one/x"))
    assert(allowed(s, "graftbot/3.0", "/one/ok-page"))
    // token identity: graftbot2 is a DIFFERENT product token
    val t = parse(
      """User-agent: graftbot
        |Disallow: /priv/
        |
        |User-agent: *
        |Disallow: /star/
        |""".stripMargin)
    assert(allowed(t, "graftbot2/1.0", "/priv/x")) // not the graftbot group
    assert(!allowed(t, "graftbot2/1.0", "/star/x")) // falls to *
    // a robots token carrying a version still names the same product
    val v = parse("User-agent: graftbot/1.2\nDisallow: /v/\n")
    assert(!allowed(v, "graftbot/9.9", "/v/x"))
  }

  test("fixture probes match the oracle's arithmetic") {
    (0L until 20L).foreach { id =>
      val g = parse(graft.queries.robotsText(id))
      assert(!allowed(g, "graftbot/1.0", s"/private${id % 5}/x"), s"$id")
      assert(allowed(g, "graftbot", s"/private${(id * 3) % 5}/y") ===
        (id % 5 != 0), s"$id")
      assert(allowed(g, "graftbot", s"/private${id % 5}/pub"), s"$id")
      assert(allowed(g, "graftbot", "/tmp/z"), s"$id")
      assert(!allowed(g, "otherbot", "/tmp/z"), s"$id")
      assert(allowed(g, "otherbot", s"/private${id % 5}/x"), s"$id")
    }
  }
}

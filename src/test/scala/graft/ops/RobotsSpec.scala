package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 adversarial cases for the robots.txt evaluator. */
class RobotsSpec extends AnyFunSuite {
  import Robots._

  test("group selection: specific agent beats *, longest token wins") {
    val txt = "User-agent: *\nDisallow: /\n" +
      "User-agent: bot\nDisallow: /a\n" +
      "User-agent: graftbot\nDisallow: /b"
    // 'graftbot' (8) is a longer matching token than 'bot' (3)
    assert(isAllowed(txt, "graftbot/1.0", "/a"))
    assert(!isAllowed(txt, "graftbot/1.0", "/b"))
    // unknown agent falls back to the * group
    assert(!isAllowed(txt, "otherbot", "/anything"))
  }

  test("consecutive User-agent lines share one group") {
    val txt = "User-agent: abot\nUser-agent: bbot\nDisallow: /x"
    assert(!isAllowed(txt, "abot", "/x"))
    assert(!isAllowed(txt, "bbot", "/x"))
    assert(isAllowed(txt, "bbot", "/y"))
  }

  test("precedence: longest pattern wins; Allow wins exact ties") {
    val txt = "User-agent: *\nDisallow: /\nAllow: /public"
    assert(isAllowed(txt, "bot", "/public/page"))
    assert(!isAllowed(txt, "bot", "/private"))
    val tie = "User-agent: *\nDisallow: /dir\nAllow: /dir"
    assert(isAllowed(tie, "bot", "/dir/x"))
  }

  test("wildcard * and $ anchor") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*/draft"
    assert(!isAllowed(txt, "bot", "/docs/a.pdf"))
    assert(isAllowed(txt, "bot", "/docs/a.pdf.html")) // $ anchors the match
    assert(!isAllowed(txt, "bot", "/tmp/2026/draft-x"))
    assert(isAllowed(txt, "bot", "/tmp/draft")) // middle * needs a segment
  }

  test("empty Disallow matches nothing; unknown fields are not rules") {
    assert(isAllowed("User-agent: *\nDisallow:", "bot", "/any"))
    assert(isAllowed("User-agent: bot\nCrawl-delay: 2", "bot", "/any"))
  }

  test("comments stripped; field names case-insensitive; no groups = allowed") {
    val txt = "USER-AGENT: bot # primary\nDISALLOW: /x # embargo"
    assert(!isAllowed(txt, "bot", "/x"))
    assert(isAllowed("", "bot", "/x"))
    assert(isAllowed("# only comments\n\n", "bot", "/x"))
  }

  test("an unknown field ends a User-agent run (next UA starts a new group)") {
    val txt = "User-agent: abot\nCrawl-delay: 1\nUser-agent: bbot\nDisallow: /x"
    assert(isAllowed(txt, "abot", "/x"), "abot's group has no rules")
    assert(!isAllowed(txt, "bbot", "/x"))
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial cases for the from-scratch URL canonicalizer (RFC 3986
  * §6 normalization + crawl-convention tracking-param strip). */
class UrlOpsSpec extends AnyFunSuite {
  import UrlOps.canonicalize

  test("scheme and host lowercase; trailing host dot and userinfo dropped") {
    assert(canonicalize("HTTPS://User:Pw@WWW.Example.ORG./a") ==
      "https://www.example.org/a")
  }

  test("default ports removed, non-default kept") {
    assert(canonicalize("https://h.example:443/x") == "https://h.example/x")
    assert(canonicalize("http://h.example:80/x") == "http://h.example/x")
    assert(canonicalize("http://h.example:8080/x") == "http://h.example:8080/x")
  }

  test("fragment dropped; empty path becomes /") {
    assert(canonicalize("https://h.example#top") == "https://h.example/")
    assert(canonicalize("https://h.example/a/b#sec-2") == "https://h.example/a/b")
  }

  test("path: duplicate slashes, dot segments, .. clamping at root, trailing slash") {
    assert(canonicalize("https://h.example//a///b/") == "https://h.example/a/b")
    assert(canonicalize("https://h.example/./a/x/../b") == "https://h.example/a/b")
    assert(canonicalize("https://h.example/../../a") == "https://h.example/a")
  }

  test("percent-escapes: unreserved decoded, reserved kept uppercased, malformed verbatim") {
    assert(canonicalize("https://h.example/%41%42%7e") == "https://h.example/AB~")
    assert(canonicalize("https://h.example/a%2fb") == "https://h.example/a%2Fb")
    assert(canonicalize("https://h.example/a%2") == "https://h.example/a%2")
  }

  test("query: tracking params stripped, survivors sorted by (key, value), bare keys kept") {
    assert(canonicalize("https://h.example/a?utm_source=x&q=1&fbclid=y&b=2") ==
      "https://h.example/a?b=2&q=1")
    assert(canonicalize("https://h.example/a?z=1&z=0&flag") ==
      "https://h.example/a?flag&z=0&z=1")
    assert(canonicalize("https://h.example/a?utm_campaign=c") == "https://h.example/a")
  }

  test("empty value with '=' is distinct from a bare key") {
    assert(canonicalize("https://h.example/a?k=") == "https://h.example/a?k=")
    assert(canonicalize("https://h.example/a?k") == "https://h.example/a?k")
  }

  test("relative refs pass through fragment-stripped") {
    assert(canonicalize("/a/b?x=1#f") == "/a/b?x=1")
  }

  test("idempotence on every fixture form") {
    val urls = Seq(
      "HTTPS://User@WWW.Example.ORG.:443//a/./b/../c?utm_source=s&q=%41&k#f",
      "http://h.example:8080/%2f?z=1&z=0&flag",
      "https://h.example", "/rel/x?utm_medium=m")
    urls.foreach { u =>
      val once = canonicalize(u)
      assert(canonicalize(once) == once, u)
    }
  }

  test("idempotence + totality over generated messy URLs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val seg = Gen.oneOf("a", "B", ".", "..", "%2F", "%41", "%zz", "x y", "")
    val messy: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      host <- Gen.oneOf("Ex.Com", "ex.com.", "user:pw@Ex.Com", "ex.com:443", "ex.com:8080")
      nSeg <- Gen.chooseNum(0, 5)
      segs <- Gen.listOfN(nSeg, seg)
      q <- Gen.oneOf("", "?utm_source=x&b=2&a=1", "?a=1&a=0&flag", "?=v&k=")
      frag <- Gen.oneOf("", "#frag")
    } yield s"$scheme://$host/${segs.mkString("/")}$q$frag"
    val urls = (0 until 300)
      .flatMap(i => messy.apply(Gen.Parameters.default, Seed(1234L + i)))
    urls.foreach { u =>
      val once = canonicalize(u) // totality: must never throw
      assert(canonicalize(once) == once, s"not idempotent for <$u> -> <$once>")
      assert(!once.contains("#"), s"fragment survived in <$once>")
      assert(!once.contains("utm_source"), s"tracking param survived in <$once>")
    }
  }
}

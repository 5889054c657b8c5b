package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** WARC 1.0 container framing: multi-member gzip, Content-Length-bound
  * payloads (never content scanning), HTTP body split, truncation
  * recovery. */
class WarcIOSpec extends AnyFunSuite {

  private def shard(gzip: Boolean, pages: (String, String)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pages.foreach { case (uri, html) =>
      WarcIO.writeResponse(out, uri, html.getBytes(StandardCharsets.UTF_8),
        "2026-01-01T00:00:00Z", gzip)
    }
    out.toByteArray
  }

  test("gzip'd multi-member shard round-trips every record") {
    val bytes = shard(gzip = true,
      "https://a/1" -> "<p>one</p>", "https://a/2" -> "<p>two</p>",
      "https://a/3" -> "<p>drei</p>")
    val recs = WarcIO.records(bytes)
    assert(recs.map(_.targetUri) === Seq("https://a/1", "https://a/2", "https://a/3"))
    assert(recs.map(r => new String(r.httpBody, StandardCharsets.UTF_8)) ===
      Seq("<p>one</p>", "<p>two</p>", "<p>drei</p>"))
    assert(recs.forall(_.warcType == "response"))
  }

  test("plain (uncompressed) WARC parses identically") {
    val recs = WarcIO.records(shard(gzip = false, "https://b/1" -> "<p>x</p>"))
    assert(recs.map(r => new String(r.httpBody, StandardCharsets.UTF_8)) === Seq("<p>x</p>"))
  }

  test("payload containing 'WARC/1.0' does not split the record (length framing)") {
    val tricky = "<p>the string WARC/1.0\r\nWARC-Type: response\r\n\r\n is body text</p>"
    val recs = WarcIO.records(shard(gzip = true,
      "https://c/1" -> tricky, "https://c/2" -> "<p>after</p>"))
    assert(recs.size === 2)
    assert(new String(recs.head.httpBody, StandardCharsets.UTF_8) === tricky)
    assert(recs(1).targetUri === "https://c/2")
  }

  test("UTF-8 page bytes survive: Content-Length counts octets, not chars") {
    val page = "<p>umlauts äöü ſ »quoted«</p>"
    val recs = WarcIO.records(shard(gzip = true, "https://d/1" -> page))
    assert(new String(recs.head.httpBody, StandardCharsets.UTF_8) === page)
  }

  test("truncated gzip tail yields the complete prefix of records") {
    val bytes = shard(gzip = true,
      "https://e/1" -> "<p>keep</p>", "https://e/2" -> "<p>lost</p>")
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 9)
    val recs = WarcIO.records(truncated)
    assert(recs.nonEmpty && recs.head.targetUri === "https://e/1")
    assert(new String(recs.head.httpBody, StandardCharsets.UTF_8) === "<p>keep</p>")
  }

  test("garbage input and empty input yield no records, no exception") {
    assert(WarcIO.records("not a warc".getBytes(StandardCharsets.UTF_8)) === Seq.empty)
    assert(WarcIO.records(Array.emptyByteArray) === Seq.empty)
  }

  test("HTTP headers are split off the body; header lookup is case-insensitive") {
    val recs = WarcIO.records(shard(gzip = false, "https://f/1" -> "<p>b</p>"))
    val r = recs.head
    assert(r.header("warc-target-uri") === Some("https://f/1"))
    assert(r.header("WARC-DATE") === Some("2026-01-01T00:00:00Z"))
    // raw payload starts with the HTTP status line; body does not
    assert(new String(r.payload, StandardCharsets.ISO_8859_1).startsWith("HTTP/1.1 200 OK"))
    assert(new String(r.httpBody, StandardCharsets.UTF_8) === "<p>b</p>")
  }
}

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

  test("charset sniffing: Content-Type header wins, meta fallback, UTF-8 default, bogus name safe") {
    import java.nio.charset.Charset
    val latin1 = StandardCharsets.ISO_8859_1
    // 1. header declaration decodes a genuine Latin-1 page
    val pageL1 = "<p>Grüße aus Köln</p>"
    val out = new java.io.ByteArrayOutputStream()
    WarcIO.writeResponse(out, "https://g/1", pageL1.getBytes(latin1),
      "2026-01-01T00:00:00Z", gzip = false,
      contentType = "text/html; charset=iso-8859-1")
    val r1 = WarcIO.records(out.toByteArray).head
    assert(r1.htmlText === pageL1)
    // 2. no header charset: <meta charset> within the first 1024 bytes
    val metaPage = "<html><head><meta charset=\"windows-1252\"></head><body><p>d’accord — oui</p></body></html>"
    val out2 = new java.io.ByteArrayOutputStream()
    WarcIO.writeResponse(out2, "https://g/2",
      metaPage.getBytes(Charset.forName("windows-1252")),
      "2026-01-01T00:00:00Z", gzip = false, contentType = "text/html")
    assert(WarcIO.records(out2.toByteArray).head.htmlText === metaPage)
    // 3. http-equiv form
    val equivPage = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\"></head><body><p>naïve</p></body></html>"
    val out3 = new java.io.ByteArrayOutputStream()
    WarcIO.writeResponse(out3, "https://g/3", equivPage.getBytes(latin1),
      "2026-01-01T00:00:00Z", gzip = false, contentType = "text/html")
    assert(WarcIO.records(out3.toByteArray).head.htmlText === equivPage)
    // 4. no declaration anywhere -> UTF-8; bogus name -> UTF-8, no throw
    val utfPage = "<p>Grüße</p>"
    val out4 = new java.io.ByteArrayOutputStream()
    WarcIO.writeResponse(out4, "https://g/4", utfPage.getBytes(StandardCharsets.UTF_8),
      "2026-01-01T00:00:00Z", gzip = false, contentType = "text/html")
    assert(WarcIO.records(out4.toByteArray).head.htmlText === utfPage)
    val out5 = new java.io.ByteArrayOutputStream()
    WarcIO.writeResponse(out5, "https://g/5", utfPage.getBytes(StandardCharsets.UTF_8),
      "2026-01-01T00:00:00Z", gzip = false,
      contentType = "text/html; charset=no-such-charset!!")
    assert(WarcIO.records(out5.toByteArray).head.htmlText === utfPage)
  }

  test("WARC sink round trip: writeWarcShards -> docsFromWarc is the identity") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._
    val docs = graft.pipeline.DocGen.docs(spark, 24, seed = 91L, partitions = 3)
    val dir = java.nio.file.Files.createTempDirectory("warc-sink").toString
    WarcIO.writeWarcShards(docs, dir, uriPrefix = "https://graft.example/")
    // one shard per non-empty partition
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(shards.nonEmpty && shards.length <= 3)
    val back = WarcIO.docsFromWarc(spark, dir)
      .map(d => d.copy(doc_id = d.doc_id.stripPrefix("https://graft.example/")))
      .collect().sortBy(_.doc_id).toSeq
    val orig = docs.collect().sortBy(_.doc_id).toSeq
    assert(back.map(_.doc_id) == orig.map(_.doc_id))
    // identity on (text, media_ref, order); kind identity UP TO the
    // HTML taxonomy (kinds without an HTML element collapse to "media")
    def htmlKind(k: String): String = k match {
      case "text" | "image" | "video" | "audio" | "embed" => k
      case _ => "media"
    }
    back.zip(orig).foreach { case (b, o) =>
      assert(b.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        o.spans.map(s => (htmlKind(s.kind), s.text, s.media_ref, s.offset)), b.doc_id)
    }
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

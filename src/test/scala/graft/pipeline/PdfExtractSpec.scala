package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** PDF layout parse: writer→parser round trip, string escapes, reading
  * order from positions (not stream order), FlateDecode, recovery
  * behavior on damaged files. */
class PdfExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("write → parse round trip preserves the interleaved span sequence") {
    val items: Seq[Either[String, String]] = Seq(
      Left("first line of text"),
      Right("media://7/0"),
      Left("second line after the image"),
      Left("third line"),
      Right("media://7/1"))
    val spans = PdfExtract.extract(PdfGen.pdf(items))
    assert(spans.map(s => (s.kind, s.text, s.media_ref)) === Seq(
      ("text", "first line of text", ""),
      ("image", "", "media://7/0"),
      ("text", "second line after the image", ""),
      ("text", "third line", ""),
      ("image", "", "media://7/1")))
    assert(spans.map(_.offset) === spans.indices)
  }

  test("string escapes round-trip: parens, backslash, octal-prone bytes, UTF-8") {
    val nasty = Seq(
      "balanced (parens) and \\ backslash",
      ")( unbalanced-looking",
      "umlauts äöü ß and ſ long-s and » guillemet",
      "tab\tand newline are plain chars here")
    val spans = PdfExtract.extract(PdfGen.pdf(nasty.map(Left(_))))
    assert(spans.map(_.text) === nasty)
  }

  test("TJ arrays concatenate shown strings, kerning numbers ignored") {
    // PdfGen writes odd-indexed lines via TJ split at the first space
    val spans = PdfExtract.extract(PdfGen.pdf(Seq(
      Left("even line via Tj"), Left("odd line via TJ with kerning"))))
    assert(spans.map(_.text) ===
      Seq("even line via Tj", "odd line via TJ with kerning"))
  }

  test("reading order is positional (top-to-bottom), not stream order") {
    // hand-written content: second line painted FIRST in the stream but
    // positioned LOWER on the page; uncompressed stream, no xref
    val content = "BT /F1 12 Tf 72 700 Td (below) Tj ET\n" +
      "BT /F1 12 Tf 72 760 Td (above) Tj ET\n"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfExtract.extract(pdf).map(_.text) === Seq("above", "below"))
  }

  test("T* and ' advance by the leading; TD sets it") {
    val content = "BT /F1 12 Tf 14 TL 72 760 Td (l1) Tj T* (l2) Tj (l3) ' ET\n"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfExtract.extract(pdf).map(_.text) === Seq("l1", "l2", "l3"))
  }

  test("recovery parse works without xref/trailer (truncated crawl dump)") {
    val whole = PdfGen.pdf(Seq(Left("alpha"), Right("media://x/0"), Left("beta")))
    val view = new String(whole, StandardCharsets.ISO_8859_1)
    val cut = view.indexOf("xref")
    assert(cut > 0)
    val truncated = java.util.Arrays.copyOfRange(whole, 0, cut)
    assert(PdfExtract.extract(truncated).map(s => (s.kind, s.text, s.media_ref)) ===
      Seq(("text", "alpha", ""), ("image", "", "media://x/0"), ("text", "beta", "")))
  }

  test("garbage bytes yield empty spans, not an exception") {
    assert(PdfExtract.extract("not a pdf at all".getBytes(StandardCharsets.UTF_8)) === Seq.empty)
    assert(PdfExtract.extract(Array.emptyByteArray) === Seq.empty)
  }

  test("content stream is actually FlateDecode-compressed and inflates back") {
    val pdf = PdfGen.pdf(Seq(Left("compressed payload line")))
    val view = new String(pdf, StandardCharsets.ISO_8859_1)
    assert(view.contains("/Filter /FlateDecode"))
    // the plaintext must NOT appear raw in the file
    assert(!view.contains("compressed payload line"))
    assert(PdfExtract.extract(pdf).map(_.text) === Seq("compressed payload line"))
  }

  test("docsFromPdf is a shuffle-free typed map over (doc_id, bytes)") {
    import spark.implicits._
    val raw = Seq(
      ("d0", PdfGen.pdf(Seq(Left("doc zero line"), Right("media://d0/0")))),
      ("d1", PdfGen.pdf(Seq(Left("doc one line"))))).toDS()
    val docs = PdfExtract.docsFromPdf(raw).collect().sortBy(_.doc_id)
    assert(docs(0).spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ===
      Seq(("text", "doc zero line", "", 0), ("image", "", "media://d0/0", 1)))
    assert(docs(1).spans === Seq(Span("text", "doc one line", "", 0)))
    val plan = PdfExtract.docsFromPdf(raw).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }
}

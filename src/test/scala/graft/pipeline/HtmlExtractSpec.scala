package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Raw-HTML → interleaved-span extraction: block segmentation, raw-text
  * elements, boilerplate-subtree strip, entity decode, media spans,
  * whitespace collapse — the adversarial cases the round-trip oracle's
  * clean synthetic corpus cannot exercise. */
class HtmlExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def texts(spans: Seq[Span]): Seq[String] =
    spans.filter(_.kind == "text").map(_.text)

  test("block tags segment text; inline tags do not") {
    val spans = HtmlExtract.extract(
      "<body><p>one <b>bold</b> run</p><p>two</p><div>three <a href='/x'>link</a></div></body>")
    assert(texts(spans) === Seq("one bold run", "two", "three link"))
  }

  test("script/style content is opaque — '<' and tags inside are not markup") {
    val spans = HtmlExtract.extract(
      "<body><script>if (a < b) { x = '<p>not text</p>'; }</script>" +
        "<style>p > span { color: red }</style><p>real</p></body>")
    assert(texts(spans) === Seq("real"))
  }

  test("head/nav/header/footer/aside subtrees are stripped (incl. nesting)") {
    val html = "<html><head><title>T</title><meta charset='utf-8'></head><body>" +
      "<header><h1>Site</h1><nav><ul><li>Home</li></ul></nav></header>" +
      "<article><p>main content</p></article>" +
      "<aside>related</aside><footer>© 2026</footer></body></html>"
    assert(texts(HtmlExtract.extract(html)) === Seq("main content"))
    // stripBoilerplate=false keeps nav/header/footer/aside but still drops head
    assert(texts(HtmlExtract.extract(html, stripBoilerplate = false)) ===
      Seq("Site", "Home", "main content", "related", "© 2026"))
  }

  test("media elements become media spans in document order, src preserved") {
    val spans = HtmlExtract.extract(
      "<body><p>before</p><img src=\"media://1/0\" alt=\"x\">" +
        "<p>after</p><video src='media://1/1'></video><iframe src=media://1/2></iframe></body>")
    assert(spans.map(s => (s.kind, s.text, s.media_ref)) === Seq(
      ("text", "before", ""), ("image", "", "media://1/0"),
      ("text", "after", ""), ("video", "", "media://1/1"),
      ("embed", "", "media://1/2")))
    assert(spans.map(_.offset) === spans.indices)
  }

  test("media inside a stripped subtree is dropped; media splits a text block") {
    val spans = HtmlExtract.extract(
      "<body><nav><img src='media://nav/logo'></nav><p>a <img src='m'> b</p></body>")
    assert(spans.map(s => (s.kind, s.text, s.media_ref)) === Seq(
      ("text", "a", ""), ("image", "", "m"), ("text", "b", "")))
  }

  test("entities decode: named, decimal, hex; bad references stay literal") {
    val spans = HtmlExtract.extract(
      "<p>a &amp; b &lt;c&gt; &#228; &#x00DF; &nosuch; &broken &amp</p>")
    assert(texts(spans) === Seq("a & b <c> ä ß &nosuch; &broken &amp"))
  }

  test("whitespace runs collapse; NBSP survives") {
    val spans = HtmlExtract.extract("<p>  a \n\t b&nbsp;&nbsp;c  </p>")
    assert(texts(spans) === Seq("a b  c"))
  }

  test("comments, doctype and PIs are skipped; stray '<' is literal text") {
    val spans = HtmlExtract.extract(
      "<!DOCTYPE html><?xml version='1.0'?><p>x <!-- <p>no</p> --> y</p><p>1 < 2</p>")
    assert(texts(spans) === Seq("x y", "1 < 2"))
  }

  test("attribute values containing '>' do not terminate the tag") {
    val spans = HtmlExtract.extract("<p title=\"a > b\">body</p>")
    assert(texts(spans) === Seq("body"))
  }

  test("unclosed raw-text element swallows the remainder (tokenizer EOF rule)") {
    assert(texts(HtmlExtract.extract("<p>kept</p><script>var x = 1;")) === Seq("kept"))
  }

  test("br and tr segment blocks; empty segments emit no span") {
    val spans = HtmlExtract.extract(
      "<p>l1<br>l2</p><table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr></table>")
    assert(texts(spans) === Seq("l1", "l2", "c1", "c2", "c3"))
  }

  test("docsFromHtml is a shuffle-free typed map over (doc_id, html)") {
    import spark.implicits._
    val raw = Seq(
      ("d0", "<body><nav>Home</nav><p>alpha</p><img src='media://d0/0'><p>beta</p></body>"),
      ("d1", "<body><p>gamma</p></body>")).toDS()
    val docs = HtmlExtract.docsFromHtml(raw).collect().sortBy(_.doc_id)
    assert(docs(0).spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) === Seq(
      ("text", "alpha", "", 0), ("image", "", "media://d0/0", 1), ("text", "beta", "", 2)))
    assert(docs(1).spans === Seq(Span("text", "gamma", "", 0)))
    val plan = HtmlExtract.docsFromHtml(raw).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }

  test("links: document order, quoted and unquoted href, &amp; decoded, empty href dropped") {
    val html = "<body><a href=\"https://a.example/x?p=1&amp;q=2\">one</a>" +
      "<a href='https://b.example/y'>two</a><a href=/rel/z>three</a>" +
      "<a href=\"\">empty</a><a name=anchor>no href</a></body>"
    assert(HtmlExtract.links(html) ===
      Seq("https://a.example/x?p=1&q=2", "https://b.example/y", "/rel/z"))
  }

  test("links: raw-text content and comments are not link sources; nav links ARE") {
    val html = "<head><script>var s = '<a href=\"https://evil.example/x\">';</script></head>" +
      "<body><!-- <a href=\"https://commented.example/\"> -->" +
      "<nav><a href=\"https://nav.example/\">home</a></nav>" +
      "<p>text with a literal &lt;a href&gt; entity</p></body>"
    assert(HtmlExtract.links(html) === Seq("https://nav.example/"))
  }

  test("links: closing </a> and a '>' inside a quoted attribute do not confuse the scan") {
    val html = "<a href=\"https://h.example/a\" title=\"x > y\">t</a></a>" +
      "<a href=\"https://h.example/b\">u</a>"
    assert(HtmlExtract.links(html) ===
      Seq("https://h.example/a", "https://h.example/b"))
  }

  test("anchors: inner text decoded, nested tags separate, decoys skipped") {
    val html = "<head><script>var s = '<a href=\"https://evil.example/\">decoy</a>';</script></head>" +
      "<body><a href=\"https://a.example/1\">Read <b>more</b></a>" +
      "<a href='https://a.example/2'>the f&uuml;ll &#82;est &amp; co</a>" +
      "<a href='https://a.example/3'>\n  spaced \t  out </a>" +
      "<a name=\"x\">no href collects nothing</a>" +
      "<a href='https://a.example/4'>implied close" + // new <a implies </a>
      "<a href='https://a.example/5'>unterminated at EOF"
    assert(HtmlExtract.anchors(html) === Seq(
      ("https://a.example/1", "Read more"),
      ("https://a.example/2", "the füll Rest & co"),
      ("https://a.example/3", "spaced out"),
      ("https://a.example/4", "implied close"),
      ("https://a.example/5", "unterminated at EOF")))
  }

  test("anchors: line breaks via tags collapse; href entity decode matches links()") {
    val html = "<a href=\"https://h.example/?a=1&amp;b=2\">one<br>two</a>"
    assert(HtmlExtract.anchors(html) ===
      Seq(("https://h.example/?a=1&b=2", "one two")))
    assert(HtmlExtract.links(html) === HtmlExtract.anchors(html).map(_._1))
  }

  test("extraction composes with the cross-doc boilerplate strip") {
    import spark.implicits._
    val page = (id: Int) =>
      s"<body><p>shared promo banner</p><p>unique body $id</p></body>"
    val raw = (0 until 4).map(i => (s"d$i", page(i))).toDS()
    val res = Boilerplate.strip(HtmlExtract.docsFromHtml(raw), minDf = 2)
    val kept = res.docs.collect().flatMap(_.spans.map(_.text)).toSet
    assert(!kept.contains("shared promo banner"))
    assert(kept === (0 until 4).map(i => s"unique body $i").toSet)
  }
}

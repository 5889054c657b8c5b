package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class PageXmlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"

  private def page(lines: Seq[(String, Seq[String])]): String = {
    val body = lines.map { case (id, words) =>
      val ws = words.zipWithIndex.map { case (w, i) =>
        s"""<Word id="${id}_w$i"><TextEquiv><Unicode>$w</Unicode></TextEquiv></Word>"""
      }.mkString
      s"""<TextLine id="$id">$ws</TextLine>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PcGts xmlns="$NS"><Page><TextRegion id="r0">$body</TextRegion></Page></PcGts>""".stripMargin
  }

  test("A9 read: one row per TextLine, words' first TextEquiv joined by spaces") {
    val dir = Files.createTempDirectory("pagexml").toString
    Files.writeString(Paths.get(s"$dir/p1.xml"),
      page(Seq("l1" -> Seq("ih", "niht"), "l2" -> Seq("zu", "bringen"))))
    Files.writeString(Paths.get(s"$dir/p2.xml"),
      page(Seq("l1" -> Seq("andere", "seite"))))
    val df = PageXml.loadPageXmlDir(spark, dir)
    val rows = df.collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1), r.getString(2)))
      .sorted
    assert(rows.toSeq == Seq(
      ("p1.xml", "l1", "ih niht"), ("p1.xml", "l2", "zu bringen"),
      ("p2.xml", "l1", "andere seite")))
  }

  test("A9 read: line without words falls back to the line's own TextEquiv") {
    val xml =
      s"""<?xml version="1.0"?><PcGts xmlns="$NS"><Page>
         |<TextLine id="solo"><TextEquiv><Unicode>ganze zeile</Unicode></TextEquiv></TextLine>
         |</Page></PcGts>""".stripMargin
    assert(PageXml.linesOf(xml) == Seq(("solo", "ganze zeile")))
  }

  test("A9 write-back preserves original basenames with spaces (URI decode)") {
    import spark.implicits._
    val src = Files.createTempDirectory("pagexml-sp").toString
    val out = Files.createTempDirectory("pagexml-sp-out").toString
    Files.writeString(Paths.get(s"$src/seite 1.xml"),
      page(Seq("l1" -> Seq("wort"))))
    val loaded = PageXml.loadPageXmlDir(spark, src)
    val corr = loaded.selectExpr("file", "line_id", "'korrigiert' AS text")
    PageXml.savePageXmlDir(spark, src, out, corr)
    assert(Files.exists(Paths.get(s"$out/seite 1.xml")),
      "output must keep the decoded basename, not the percent-encoded URI form")
    assert(!Files.exists(Paths.get(s"$out/seite%201.xml")))
  }

  test("A9 word-level write-back: word equivs rewritten, line+region folds match") {
    val xml = page(Seq("l1" -> Seq("ih", "niht"), "l2" -> Seq("zu", "bringen")))
    val out = PageXml.applyCorrections(xml, Map("l1" -> "ich nicht"))
    // the WORD equivs themselves carry the corrected pieces
    assert(out.contains("<Unicode>ich</Unicode>"))
    assert(out.contains("<Unicode>nicht</Unicode>"))
    // word -> line fold
    assert(PageXml.linesOf(out) == Seq(("l1", "ich nicht"), ("l2", "zu bringen")))
    // line -> region fold (page_update_higher_textequiv_levels)
    assert(out.contains("ich nicht\nzu bringen"))
  }

  test("A9 multi-region write-back: region folds stay per-region, page fold joins regions") {
    val mk = (id: String, lines: String) => s"""<TextRegion id="$id">$lines</TextRegion>"""
    val line = (id: String, words: Seq[String]) => {
      val ws = words.zipWithIndex.map { case (w, i) =>
        s"""<Word id="${id}_w$i"><TextEquiv><Unicode>$w</Unicode></TextEquiv></Word>"""
      }.mkString
      s"""<TextLine id="$id">$ws</TextLine>"""
    }
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?><PcGts xmlns="$NS"><Page>
         |${mk("r0", line("l1", Seq("ih", "niht")) + line("l2", Seq("zu", "bringen")))}
         |${mk("r1", line("l3", Seq("andere", "seite")))}
         |${mk("r2", line("l4", Seq("dritte", "region")))}
         |</Page></PcGts>""".stripMargin
    val out = PageXml.applyCorrections(xml,
      Map("l1" -> "ich nicht", "l3" -> "zweite seite"))
    // per-region folds: each region joins ITS OWN lines only
    assert(out.contains("ich nicht\nzu bringen"))
    assert(out.contains("zweite seite"))
    // untouched region keeps no forced refold, but contributes to the
    // page fold via its lines' text
    assert(PageXml.linesOf(out) == Seq(("l1", "ich nicht"),
      ("l2", "zu bringen"), ("l3", "zweite seite"), ("l4", "dritte region")))
    // region -> page concatenation (the fold one level above the
    // reference's region stop): regions joined by '\n' in order;
    // r2 was never touched and has no region equiv -> contributes ''
    assert(out.contains("ich nicht\nzu bringen\nzweite seite\n"))
  }

  test("A9 word-level write-back: merged-away words are removed") {
    val xml = page(Seq("l1" -> Seq("zu", "bringen")))
    val out = PageXml.applyCorrections(xml, Map("l1" -> "zubringen"))
    assert(PageXml.linesOf(out) == Seq(("l1", "zubringen")))
    // the first word merged into the second: one Word element remains
    assert("<Word ".r.findAllIn(out).length == 1)
  }

  test("A9 write-back: line corrected to EMPTY updates the line equiv (words removed)") {
    val xml = page(Seq("l1" -> Seq("weg", "damit"), "l2" -> Seq("zu", "bringen")))
    val out = PageXml.applyCorrections(xml, Map("l1" -> ""))
    // every word of l1 merged away AND the line-level text is cleared —
    // a word-fold guard over the now-empty word list would silently keep
    // the stale OCR text
    assert(PageXml.linesOf(out) == Seq(("l1", ""), ("l2", "zu bringen")))
    assert(!out.contains("weg") && !out.contains("damit"))
  }

  test("A9 write-back: untouched line with its own equiv stays verbatim (no phantom refold)") {
    val xml =
      s"""<?xml version="1.0"?><PcGts xmlns="$NS"><Page><TextRegion id="r0">
         |<TextLine id="l1"><Word id="w0"><TextEquiv><Unicode>ih</Unicode></TextEquiv></Word></TextLine>
         |<TextLine id="l2"><Word id="w1"><TextEquiv><Unicode>a</Unicode></TextEquiv></Word><Word id="w2"/>
         |<TextEquiv><Unicode>a</Unicode></TextEquiv></TextLine>
         |</TextRegion></Page></PcGts>""".stripMargin
    val out = PageXml.applyCorrections(xml, Map("l1" -> "ich"))
    // l2 has a word WITHOUT a TextEquiv: refolding it from words would
    // inject a phantom empty token ("a " / "a  b"); its existing line
    // equiv must survive byte-identical
    assert(PageXml.linesOf(out) == Seq(("l1", "ich"), ("l2", "a")))
    assert(out.contains("ich\na"))
    assert(!out.contains("<Unicode>a </Unicode>"))
  }

  test("distributeWords: split, merge, and identity cases") {
    assert(PageXml.distributeWords(Seq("ihniht"), "ih niht") == Seq("ih niht"))
    assert(PageXml.distributeWords(Seq("zu", "bringen"), "zubringen")
      == Seq("", "zubringen"))
    assert(PageXml.distributeWords(Seq("a", "b", "c"), "a b c")
      == Seq("a", "b", "c"))
    assert(PageXml.distributeWords(Seq("wort"), "") == Seq(""))
  }

  test("A9 read honors the file's declared (non-UTF-8) encoding") {
    val dir = Files.createTempDirectory("pagexml-enc").toString
    val xml =
      s"""<?xml version="1.0" encoding="ISO-8859-1"?>
         |<PcGts xmlns="$NS"><Page><TextRegion id="r0">
         |<TextLine id="l1"><Word id="w0"><TextEquiv><Unicode>für</Unicode></TextEquiv></Word></TextLine>
         |</TextRegion></Page></PcGts>""".stripMargin
    Files.write(Paths.get(s"$dir/latin.xml"),
      xml.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val rows = PageXml.loadPageXmlDir(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getString(2) == "für")
  }

  test("A9 unparsable files are skipped on read, copied through on write") {
    import spark.implicits._
    val src = Files.createTempDirectory("pagexml-bad").toString
    val out = Files.createTempDirectory("pagexml-bad-out").toString
    Files.writeString(Paths.get(s"$src/good.xml"),
      page(Seq("l1" -> Seq("wort"))))
    Files.writeString(Paths.get(s"$src/broken.xml"), "this is <not> xml <")
    val loaded = PageXml.loadPageXmlDir(spark, src)
    assert(loaded.count() == 1) // broken file skipped, job did not fail
    val corr = loaded.selectExpr("file", "line_id", "'neu' AS text")
    PageXml.savePageXmlDir(spark, src, out, corr)
    // broken input copied through byte-identical; good one corrected
    assert(Files.readString(Paths.get(s"$out/broken.xml")) == "this is <not> xml <")
    val back = PageXml.loadPageXmlDir(spark, out).collect()
    assert(back.length == 1 && back(0).getString(2) == "neu")
  }

  test("A9 round trip: corrections written back, reread gives corrected text") {
    import spark.implicits._
    val src = Files.createTempDirectory("pagexml-src").toString
    val out = Files.createTempDirectory("pagexml-out").toString
    Files.writeString(Paths.get(s"$src/doc.xml"),
      page(Seq("l1" -> Seq("ih", "niht"), "l2" -> Seq("bleibt", "so"))))
    val loaded = PageXml.loadPageXmlDir(spark, src)
    // "correct" line l1 only
    val corrections = loaded.where($"line_id" === "l1")
      .selectExpr("file", "line_id", "'ich nicht' AS text")
    PageXml.savePageXmlDir(spark, src, out, corrections)
    val back = PageXml.loadPageXmlDir(spark, out).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    // l1: word equivs dropped -> the line-level corrected equiv is read
    assert(back("l1") == "ich nicht")
    // l2 untouched: original word tokens still there
    assert(back("l2") == "bleibt so")
  }
}

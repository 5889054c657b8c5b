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

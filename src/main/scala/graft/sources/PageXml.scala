package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.{Document, Element}
import java.io.{ByteArrayInputStream, StringWriter}
import java.nio.charset.StandardCharsets
import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.transform.TransformerFactory
import javax.xml.transform.dom.DOMSource
import javax.xml.transform.stream.StreamResult

/** A9: PAGE-XML line source/sink (the OCR-D wrapper's data model,
  * wrapper/decode.py:162-173 `_line_to_tokens` + :281-311
  * `page_update_higher_textequiv_levels`).
  *
  * Read: one row per TextLine — `(file, line_id, text)` where text is
  * the line's Word elements' FIRST TextEquiv/Unicode values joined
  * with spaces (exactly `' '.join(_line_to_tokens(line))`); a line
  * without words falls back to its own TextEquiv (decode.py warns and
  * skips — we surface the line-level text so the caller can still
  * correct it), else empty.
  *
  * Write-back: set each corrected TextLine's first TextEquiv/Unicode
  * to the corrected string and DROP its Word children's TextEquivs'
  * granularity conflict by removing Word elements' TextEquiv texts —
  * the line-level analogue of update_higher_textequiv_levels (the
  * reference rewrites word-level equivs from the best path and then
  * folds them upward; our span table corrects whole lines).
  *
  * Scale shape: files parse ON EXECUTORS (wholetext read keyed by
  * input_file_name — one task per file, no driver XML work); the
  * write-back groups corrections per file (one shuffle on file path)
  * and each task rewrites only its own files. */
object PageXml {

  private def parse(xml: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // harden against XXE — corpus XML is untrusted at scale
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
  }

  private def children(e: Element, local: String): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case c: Element if c.getLocalName == local => out += c
        case _ =>
      }
      n = n.getNextSibling
    }
    out.toSeq
  }

  /** First TextEquiv/Unicode text directly under `e`, if any. */
  private def firstEquivText(e: Element): Option[String] =
    children(e, "TextEquiv").headOption
      .flatMap(te => children(te, "Unicode").headOption)
      .map(_.getTextContent)

  /** Extract (line_id, text) pairs from one PAGE-XML document string. */
  def linesOf(xml: String): Seq[(String, String)] = {
    val doc = parse(xml)
    val nodes = doc.getElementsByTagNameNS("*", "TextLine")
    (0 until nodes.getLength).map { i =>
      val line = nodes.item(i).asInstanceOf[Element]
      val words = children(line, "Word")
      val tokens = words.flatMap(firstEquivText) // decode.py:168-170
      val text =
        if (tokens.nonEmpty) tokens.mkString(" ")
        else firstEquivText(line).getOrElse("")
      (line.getAttribute("id"), text)
    }
  }

  /** Streaming-friendly read: every `*.xml` under `dir`, one row per
    * TextLine: (file, line_id, text). */
  def loadPageXmlDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(s"$dir/*.xml")
      .select(org.apache.spark.sql.functions.input_file_name().as("file"),
        $"value")
      .as[(String, String)]
      .flatMap { case (file, xml) =>
        linesOf(xml).map { case (id, text) => (file, id, text) }
      }
      .toDF("file", "line_id", "text")
  }

  /** Apply per-line corrections back into a PAGE-XML document string:
    * corrected lines get their TextEquiv/Unicode replaced (created if
    * absent) and their Words' stale TextEquivs removed. */
  def applyCorrections(xml: String, corrections: Map[String, String]): String = {
    val doc = parse(xml)
    val nodes = doc.getElementsByTagNameNS("*", "TextLine")
    val ns = Option(doc.getDocumentElement.getNamespaceURI).orNull
    (0 until nodes.getLength).foreach { i =>
      val line = nodes.item(i).asInstanceOf[Element]
      corrections.get(line.getAttribute("id")).foreach { corrected =>
        // drop stale word-level equivs (overwritten from the best path
        // in the reference; line-granular here)
        children(line, "Word").foreach { w =>
          children(w, "TextEquiv").foreach(w.removeChild)
        }
        val te = children(line, "TextEquiv").headOption.getOrElse {
          val e = doc.createElementNS(ns, "TextEquiv")
          line.appendChild(e); e
        }
        val uni = children(te, "Unicode").headOption.getOrElse {
          val e = doc.createElementNS(ns, "Unicode")
          te.appendChild(e); e
        }
        uni.setTextContent(corrected)
      }
    }
    val tf = TransformerFactory.newInstance().newTransformer()
    val sw = new StringWriter()
    tf.transform(new DOMSource(doc), new StreamResult(sw))
    sw.toString
  }

  /** Distributed write-back: join per-line corrections (file, line_id,
    * text) to their source files and rewrite each file once under
    * `outDir` (same basename). One shuffle on the file path; each task
    * parses + rewrites only its own files. */
  def savePageXmlDir(spark: SparkSession, srcDir: String, outDir: String,
      corrections: DataFrame): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val out = outDir
    val byFile = corrections.select("file", "line_id", "text")
      .as[(String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        (file, it.map(r => r._2 -> r._3).toMap)
      }
    val src = spark.read.option("wholetext", "true").text(s"$srcDir/*.xml")
      .select(org.apache.spark.sql.functions.input_file_name().as("file"),
        $"value").as[(String, String)]
    src.joinWith(byFile, src("file") === byFile("_1"), "left")
      .map { case ((file, xml), corr) =>
        val fixed = Option(corr).map(c => applyCorrections(xml, c._2))
          .getOrElse(xml)
        (file, fixed)
      }
      .foreachPartition { (it: Iterator[(String, String)]) =>
        it.foreach { case (file, xml) =>
          // input_file_name() returns a percent-encoded URI
          // ("seite%201.xml" for "seite 1.xml") — decode via URI so
          // the output keeps the ORIGINAL basename (METS fileGrp
          // entries reference pages by filename; URLDecoder would
          // additionally corrupt '+' to space)
          val path =
            try new java.net.URI(file).getPath
            catch { case _: java.net.URISyntaxException => file }
          val name = path.substring(path.lastIndexOf('/') + 1)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(out, name), xml)
        }
      }
  }
}

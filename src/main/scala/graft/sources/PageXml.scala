package graft.sources

import graft.align.SequenceMatcher
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.{Document, Element}
import java.io.{ByteArrayInputStream, StringWriter}
import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.transform.{OutputKeys, TransformerFactory}
import javax.xml.transform.dom.DOMSource
import javax.xml.transform.stream.StreamResult

/** A9: PAGE-XML source/sink (the OCR-D wrapper's data model,
  * wrapper/decode.py:162-173 `_line_to_tokens` + :279-341
  * `page_update_higher_textequiv_levels` / `_line_update_from_path`).
  *
  * Read: one row per TextLine — `(file, line_id, text)` where text is
  * the line's Word elements' FIRST TextEquiv/Unicode values joined
  * with spaces (exactly `' '.join(_line_to_tokens(line))`); a line
  * without words falls back to its own TextEquiv (decode.py warns and
  * skips — we surface the line-level text so the caller can still
  * correct it), else empty. Files are read as BINARY and parsed from
  * raw bytes, so the XML parser honors each file's declared encoding;
  * an unparsable file is logged and skipped (the reference wrapper
  * warns and continues), never failing the whole job.
  *
  * Write-back: WORD-granular, like the reference. The corrected line
  * string is distributed across the line's Word elements via the
  * difflib alignment (each corrected token goes to the original word
  * its aligned midpoint falls in; merged-away words are removed —
  * decode.py:319-331 rebuilds the Word list from the best path the
  * same way), then TextEquivs fold upward word → line → region per
  * `page_update_higher_textequiv_levels('word')` (decode.py:279-316):
  * line text = ' '.join(word equivs), region text = '\n'.join(line
  * equivs). Word-less lines keep their (corrected) line equiv instead
  * of being clobbered to '' — the one divergence from the reference
  * fold, which assumes every line has words.
  *
  * Scale shape: files parse ON EXECUTORS (binaryFile read — one task
  * per file, no driver XML work); the write-back groups corrections
  * per file (one shuffle on file path) and each task rewrites only its
  * own files through the Hadoop FileSystem API resolved from the
  * output URI — file:/, hdfs://, s3a:// alike — so per-file output
  * lands on SHARED storage on a real cluster, not executor-local
  * disks. */
object PageXml {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  private def parse(xml: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // harden against XXE — corpus XML is untrusted at scale
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    // parse from raw bytes: the parser reads the BOM / <?xml encoding?>
    // declaration itself (a wholetext UTF-8 decode would mojibake
    // Latin-1 pages before the parser ever saw the declaration)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
  }

  /** Parse, or None with a warning — a corrupt page file must not fail
    * a million-file job (the reference wrapper warns and skips too). */
  private def parseOrSkip(file: String, xml: Array[Byte]): Option[Document] =
    try Some(parse(xml))
    catch {
      case e: Exception =>
        log.warn(s"skipping unparsable PAGE-XML file $file: ${e.getMessage}")
        None
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

  /** Replace ALL of `e`'s TextEquiv children with one TextEquiv/Unicode
    * holding `text` (the reference's `set_TextEquiv([one])`). */
  private def setEquivText(doc: Document, e: Element, text: String): Unit = {
    children(e, "TextEquiv").foreach(e.removeChild)
    val ns = Option(doc.getDocumentElement.getNamespaceURI).orNull
    val te = doc.createElementNS(ns, "TextEquiv")
    val uni = doc.createElementNS(ns, "Unicode")
    uni.setTextContent(text)
    te.appendChild(uni)
    e.appendChild(te)
  }

  private def linesIn(doc: Document): Seq[Element] = {
    val nodes = doc.getElementsByTagNameNS("*", "TextLine")
    (0 until nodes.getLength).map(nodes.item(_).asInstanceOf[Element])
  }

  /** Extract (line_id, text) pairs from one parsed PAGE-XML document. */
  private def linesOf(doc: Document): Seq[(String, String)] =
    linesIn(doc).map { line =>
      val tokens = children(line, "Word").flatMap(firstEquivText) // decode.py:168-170
      val text =
        if (tokens.nonEmpty) tokens.mkString(" ")
        else firstEquivText(line).getOrElse("")
      (line.getAttribute("id"), text)
    }

  /** String-input convenience (tests / single-doc callers). */
  def linesOf(xml: String): Seq[(String, String)] =
    linesOf(parse(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Streaming-friendly read: every `*.xml` under `dir`, one row per
    * TextLine: (file, line_id, text). Binary read + executor-side
    * parse; unparsable files are logged and skipped. */
  def loadPageXmlDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.xml")
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, xml) =>
        parseOrSkip(file, xml).toSeq.flatMap(linesOf)
          .map { case (id, text) => (file, id, text) }
      }
      .toDF("file", "line_id", "text")
  }

  /** Distribute a corrected line across the original word tokens: split
    * `corrected` into its own tokens, align corrected↔original at the
    * code-point level (the same difflib matcher the error model
    * trains with), and assign each corrected token to the original
    * word index its midpoint maps back into. Returns one (possibly
    * empty) piece per original token; the non-empty pieces joined with
    * ' ' reconstruct `corrected` exactly, so the word→line fold is
    * byte-identical to the lattice output. */
  def distributeWords(origTokens: Seq[String], corrected: String): Seq[String] = {
    val orig = origTokens.mkString(" ")
    val a = graft.align.Aligner.cps(corrected) // corrected side
    val b = graft.align.Aligner.cps(orig)      // original side
    // wordOf(origCpIdx): which token index covers this position
    // (separator spaces belong to the preceding token)
    val wordOf = new Array[Int](math.max(b.length, 1))
    var w = 0; var pos = 0
    origTokens.foreach { t =>
      val len = t.codePointCount(0, t.length)
      var k = 0
      while (k <= len && pos < b.length) { // token cps + its trailing space
        wordOf(pos) = w; pos += 1; k += 1
      }
      w += 1
    }
    while (pos < b.length) { wordOf(pos) = math.max(w - 1, 0); pos += 1 }
    // monotone corrected→original index map from the matcher opcodes
    val ops = new SequenceMatcher(a, b).opcodes
    def mapToOrig(ci: Int): Int = {
      ops.find { case (_, i1, i2, _, _) => i1 <= ci && ci < i2 } match {
        case Some(("equal", i1, _, j1, _)) => j1 + (ci - i1)
        case Some((_, i1, _, j1, j2)) => math.min(j1 + (ci - i1), math.max(j2 - 1, j1))
        case None => math.max(b.length - 1, 0)
      }
    }
    val pieces = Array.fill(origTokens.length)(List.empty[String])
    if (origTokens.nonEmpty && b.nonEmpty) {
      // corrected tokens with their cp start offsets
      var cs = 0
      corrected.split(" ").foreach { ct =>
        val len = ct.codePointCount(0, ct.length)
        if (ct.nonEmpty) {
          val mid = cs + (len - 1) / 2
          val wi = wordOf(math.min(mapToOrig(mid), b.length - 1))
          pieces(wi) = ct :: pieces(wi)
        }
        cs += len + 1 // the split-away space
      }
    }
    pieces.map(_.reverse.mkString(" ")).toSeq
  }

  /** Apply per-line corrections into a parsed PAGE-XML document:
    * word-granular rewrite + upward fold (see object Scaladoc). */
  private def applyCorrections(doc: Document,
      corrections: Map[String, String]): Unit = {
    val touched = scala.collection.mutable.Set.empty[Element]
    linesIn(doc).foreach { line =>
      corrections.get(line.getAttribute("id")).foreach { corrected =>
        val words = children(line, "Word")
        val tokens = words.map(w => firstEquivText(w).getOrElse(""))
        if (words.nonEmpty) {
          // distribute the corrected string across the original words;
          // a word whose every token merged away is REMOVED (the
          // reference rebuilds the Word list from the path the same
          // way, decode.py:319-331)
          val pieces = distributeWords(tokens, corrected)
          words.zip(pieces).foreach { case (wEl, piece) =>
            if (piece.isEmpty) line.removeChild(wEl)
            else setEquivText(doc, wEl, piece)
          }
        }
        // line equiv ALWAYS reflects the correction — the ' '.join of
        // the surviving word pieces is the corrected string itself, and
        // setting it directly also covers word-less lines and lines
        // corrected to the empty string (every word removed), which a
        // word-fold guard would silently skip
        setEquivText(doc, line, corrected)
        touched += line
      }
    }
    // region-level upward fold (decode.py:279-316): region =
    // '\n'.join(lines), built from each line's (now current) equiv.
    // Untouched lines keep an EXISTING equiv verbatim — refolding them
    // from word equivs would not be a no-op (a word without a TextEquiv
    // would inject a phantom empty token the read path's flatMap never
    // sees). A line with word-level-only annotation gets its equiv
    // filled in with the read path's exact join semantics.
    val regions = doc.getElementsByTagNameNS("*", "TextRegion")
    val regionEls =
      (0 until regions.getLength).map(regions.item(_).asInstanceOf[Element])
    val touchedRegions = regionEls.filter { region =>
      val lines = children(region, "TextLine")
      if (lines.nonEmpty && lines.exists(touched.contains)) {
        val lineTexts = lines.map { l =>
          firstEquivText(l).getOrElse {
            val t = children(l, "Word").flatMap(firstEquivText).mkString(" ")
            setEquivText(doc, l, t)
            t
          }
        }
        setEquivText(doc, region, lineTexts.mkString("\n"))
        true
      } else false
    }
    // region -> page concatenation for multi-region documents: the same
    // first-TextEquiv join rules one level up (the reference's fold,
    // decode.py:279-316, stops at region — its PAGE bindings carry no
    // page TextEquiv; ours completes G9 at every granularity for the
    // interleaved-document table). Untouched regions contribute an
    // EXISTING equiv verbatim (refold semantics as for lines); regions
    // with no equiv at all contribute '' like the reference's
    // `else u''` arms.
    if (touchedRegions.nonEmpty) {
      val pages = doc.getElementsByTagNameNS("*", "Page")
      (0 until pages.getLength).map(pages.item(_).asInstanceOf[Element])
        .foreach { page =>
          val pageRegions = regionEls.filter(r => isAncestor(page, r))
          if (pageRegions.exists(touchedRegions.contains)) {
            val regionTexts = pageRegions.map(firstEquivText(_).getOrElse(""))
            setEquivText(doc, page, regionTexts.mkString("\n"))
          }
        }
    }
  }

  private def isAncestor(anc: Element, el: Element): Boolean = {
    var p = el.getParentNode
    while (p != null) {
      if (p eq anc) return true
      p = p.getParentNode
    }
    false
  }

  /** String-in/string-out form (tests / single-doc callers). */
  def applyCorrections(xml: String, corrections: Map[String, String]): String = {
    val doc = parse(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    applyCorrections(doc, corrections)
    serialize(doc)
  }

  private def serialize(doc: Document): String = {
    val tf = TransformerFactory.newInstance().newTransformer()
    // the output is always UTF-8 regardless of the input's declared
    // encoding — keep the declaration honest
    tf.setOutputProperty(OutputKeys.ENCODING, "UTF-8")
    val sw = new StringWriter()
    tf.transform(new DOMSource(doc), new StreamResult(sw))
    sw.toString
  }

  /** Distributed write-back: join per-line corrections (file, line_id,
    * text) to their source files and rewrite each file once under
    * `outDir` (same basename). One shuffle on the file path; each task
    * parses + rewrites only its own files, writing through the Hadoop
    * FileSystem of the resolved output URI (shared storage on a real
    * cluster). Unparsable inputs and null-text corrections pass
    * through/are dropped with a warning instead of failing the job. */
  def savePageXmlDir(spark: SparkSession, srcDir: String, outDir: String,
      corrections: DataFrame): Unit = {
    import spark.implicits._
    val confSer = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(confSer.value).mkdirs(outPath) // driver-side
    val out = outDir
    val byFile = corrections.select("file", "line_id", "text")
      .as[(String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        (file, it.collect { case (_, id, text) if text != null => id -> text }
          .toMap)
      }
    val src = spark.read.format("binaryFile").load(s"$srcDir/*.xml")
      .select($"path", $"content").as[(String, Array[Byte])]
    src.joinWith(byFile, src("path") === byFile("_1"), "left")
      .map { case ((file, xml), corr) =>
        val fixed = Option(corr) match {
          case None => xml // no corrections: copy through byte-identical
          case Some((_, cmap)) => parseOrSkip(file, xml) match {
            case Some(doc) =>
              applyCorrections(doc, cmap)
              serialize(doc).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case None => xml // unparsable: copy through untouched
          }
        }
        (file, fixed)
      }
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        val base = new org.apache.hadoop.fs.Path(out)
        // newInstance, NOT the cached get(): the checksum flag below
        // must not leak to every other writer sharing the JVM's cached
        // FileSystem (see Sources.savePairsToDir)
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          base.toUri, confSer.value)
        try {
          // the contract is exactly one file per entry — no .crc
          // sidecars from the checksummed local FS (no-op on HDFS/S3A)
          fs.setWriteChecksum(false)
          it.foreach { case (file, xml) =>
            // the source path is a percent-encoded URI ("seite%201.xml"
            // for "seite 1.xml") — decode via URI so the output keeps the
            // ORIGINAL basename (METS fileGrp entries reference pages by
            // filename; URLDecoder would additionally corrupt '+')
            val path =
              try new java.net.URI(file).getPath
              catch { case _: java.net.URISyntaxException => file }
            val name = path.substring(path.lastIndexOf('/') + 1)
            val os = fs.create(new org.apache.hadoop.fs.Path(base, name), true)
            try os.write(xml) finally os.close()
          }
        } finally fs.close()
      }
  }
}

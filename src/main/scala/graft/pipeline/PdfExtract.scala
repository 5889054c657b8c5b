package graft.pipeline

import org.apache.spark.sql.Dataset

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** From-scratch minimal PDF **layout parse** — the north rule's
  * "PDF/layout parse" clause, pure JVM (FlateDecode via
  * `java.util.zip`; no external PDF library):
  *
  *   - the file is scanned for `N 0 obj … endobj` bodies (xref-free
  *     recovery parse — robust to a truncated/absent xref, which is
  *     exactly what a damaged web-crawled PDF looks like);
  *   - object dictionaries are parsed by a small recursive-descent
  *     reader (names, numbers, strings, arrays, nested dicts, `N 0 R`
  *     refs); `/FlateDecode` streams are inflated;
  *   - page content streams are tokenized (`BT ET Tf Td TD TL Tm T*
  *     Tj ' TJ q Q cm Do`), tracking the text-line position the way a
  *     layout engine does: `Td/TD` translate, `Tm` sets, `T*`/`'`
  *     advance by the leading, `cm` positions image XObjects;
  *   - every shown string (`Tj`/`'`/`TJ` with kerning numbers ignored)
  *     becomes a positioned text run; every `Do` of an
  *     `/Subtype /Image` XObject becomes a positioned media run whose
  *     `media_ref` is the XObject's `/GraftRef` (or the resource name);
  *   - runs are sorted into READING ORDER — top-to-bottom (descending
  *     y), then left-to-right (x), then stream order — and emitted as
  *     the interleaved (kind, text, media_ref, order) span sequence,
  *     pages in document order.
  *
  * String decoding: literal strings honor the PDF escapes (`\( \) \\
  * \n \r \t \b \f`, octal `\ddd`, line continuation); hex strings
  * `<…>` are supported; bytes are decoded as UTF-8. (A conforming
  * viewer maps bytes through the font's encoding/CMap; carrying UTF-8
  * in the string bytes round-trips all text exactly and is the
  * documented divergence — the same call real extractors make when a
  * font has no /ToUnicode.) [[PdfGen]] below writes that dialect, so
  * write→parse is an identity on span sequences (oracled in
  * q_pdf_extract as a round-trip against expected output computed
  * directly from the source table).
  *
  * Scale shape: strictly per-row (one document = one PDF blob = one
  * parse) — `docsFromPdf` is a single typed map with NO shuffle, like
  * [[HtmlExtract.docsFromHtml]]. */
object PdfExtract {

  // ---------------------------------------------------------------- model

  sealed trait PdfVal
  final case class PNum(v: Double) extends PdfVal
  final case class PName(v: String) extends PdfVal
  final case class PStr(bytes: Array[Byte]) extends PdfVal
  final case class PArr(v: Vector[PdfVal]) extends PdfVal
  final case class PDict(v: Map[String, PdfVal]) extends PdfVal
  final case class PRef(num: Int) extends PdfVal
  final case class POp(name: String) extends PdfVal // content-stream operator
  case object PNull extends PdfVal

  private final case class PdfObject(num: Int, dict: PDict, stream: Option[Array[Byte]])

  /** One positioned run before reading-order sort. */
  private final case class Run(page: Int, y: Double, x: Double, seq: Int,
      kind: String, text: String, ref: String)

  // ---------------------------------------------------------------- lexer

  /** Structure bytes are Latin-1-viewed (PDF syntax is byte-oriented);
    * string CONTENT keeps raw bytes for UTF-8 decoding. */
  private final class Lexer(s: Array[Byte], var i: Int, val end: Int) {
    def this(s: Array[Byte]) = this(s, 0, s.length)

    private def ws(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def delim(c: Byte): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

    def skipWs(): Unit = {
      while (i < end) {
        val c = s(i)
        if (ws(c)) i += 1
        else if (c == '%') { while (i < end && s(i) != '\n' && s(i) != '\r') i += 1 }
        else return
      }
    }

    def peekIs(str: String): Boolean = {
      skipWs()
      if (i + str.length > end) return false
      var k = 0
      while (k < str.length) {
        if (s(i + k) != str.charAt(k).toByte) return false
        k += 1
      }
      true
    }

    /** next token as a value; bare operators surface as POp. */
    def next(): PdfVal = {
      skipWs()
      if (i >= end) return PNull
      val c = s(i)
      if (c == '/') { // name
        i += 1
        val st = i
        while (i < end && !ws(s(i)) && !delim(s(i))) i += 1
        PName(new String(s, st, i - st, StandardCharsets.ISO_8859_1))
      } else if (c == '(') literalString()
      else if (c == '<' && i + 1 < end && s(i + 1) == '<') dict()
      else if (c == '<') hexString()
      else if (c == '[') {
        i += 1
        val b = Vector.newBuilder[PdfVal]
        while ({ skipWs(); i < end && s(i) != ']' }) b += next()
        if (i < end) i += 1
        PArr(b.result())
      } else if (c == '>' && i + 1 < end && s(i + 1) == '>') { i += 2; POp(">>") }
      else if (c == ']' || c == '}' || c == '{' || c == ')' || c == '>') { i += 1; POp(new String(Array(c), StandardCharsets.ISO_8859_1)) }
      else if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        val st = i
        i += 1
        while (i < end && ((s(i) >= '0' && s(i) <= '9') || s(i) == '.' || s(i) == '-' || s(i) == '+')) i += 1
        val txt = new String(s, st, i - st, StandardCharsets.ISO_8859_1)
        // "N 0 R" indirect reference lookahead
        val save = i
        skipWs()
        val st2 = i
        while (i < end && s(i) >= '0' && s(i) <= '9') i += 1
        if (i > st2) {
          val save2 = i
          skipWs()
          if (i < end && s(i) == 'R' && (i + 1 >= end || ws(s(i + 1)) || delim(s(i + 1)))) {
            i += 1
            return PRef(txt.toDouble.toInt)
          }
          i = save2
          i = save // not a ref: rewind fully
        } else i = save
        PNum(java.lang.Double.parseDouble(txt))
      } else { // bare keyword / operator
        val st = i
        while (i < end && !ws(s(i)) && !delim(s(i))) i += 1
        if (i == st) { i += 1; POp(new String(Array(c), StandardCharsets.ISO_8859_1)) }
        else POp(new String(s, st, i - st, StandardCharsets.ISO_8859_1))
      }
    }

    private def dict(): PdfVal = {
      i += 2 // <<
      val m = Map.newBuilder[String, PdfVal]
      while ({ skipWs(); !(i + 1 < end && s(i) == '>' && s(i + 1) == '>') && i < end }) {
        next() match {
          case PName(k) => m += k -> next()
          case _        => () // tolerate junk keys
        }
      }
      if (i + 1 < end) i += 2
      PDict(m.result())
    }

    private def literalString(): PdfVal = {
      i += 1 // (
      val out = new ByteArrayOutputStream(32)
      var depth = 1
      while (i < end && depth > 0) {
        val c = s(i)
        if (c == '\\' && i + 1 < end) {
          i += 1
          val e = s(i)
          e match {
            case 'n' => out.write('\n'); i += 1
            case 'r' => out.write('\r'); i += 1
            case 't' => out.write('\t'); i += 1
            case 'b' => out.write('\b'); i += 1
            case 'f' => out.write('\f'); i += 1
            case '(' => out.write('('); i += 1
            case ')' => out.write(')'); i += 1
            case '\\' => out.write('\\'); i += 1
            case '\r' => i += 1; if (i < end && s(i) == '\n') i += 1 // continuation
            case '\n' => i += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              while (k < 3 && i < end && s(i) >= '0' && s(i) <= '7') {
                v = v * 8 + (s(i) - '0'); i += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); i += 1
          }
        } else if (c == '(') { depth += 1; out.write(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); i += 1 }
        else { out.write(c); i += 1 }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PdfVal = {
      i += 1 // <
      val out = new ByteArrayOutputStream(32)
      var hi = -1
      while (i < end && s(i) != '>') {
        val d = Character.digit(s(i).toChar, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) out.write(hi * 16) // odd count: final digit padded with 0
      if (i < end) i += 1
      PStr(out.toByteArray)
    }
  }

  // ---------------------------------------------------------------- objects

  private val objRe = "(?s)(\\d+)\\s+\\d+\\s+obj".r

  /** Recovery scan: locate every `N g obj … endobj` body. Stream data
    * is bounded by /Length when the dict carries one (binary deflate
    * bytes may contain `endstream` or `N 0 obj` lookalikes — a /Length
    * bound never mis-splits); the `endstream` search is the fallback
    * for a corrupt /Length. Matches that fall INSIDE a previously
    * extracted stream's byte range are phantoms and skipped. */
  private def scanObjects(bytes: Array[Byte]): Map[Int, PdfObject] = {
    val view = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = Map.newBuilder[Int, PdfObject]
    val streamRanges = ArrayBuffer.empty[(Int, Int)]
    for (m <- objRe.findAllMatchIn(view)) {
      if (!streamRanges.exists(r => m.start >= r._1 && m.start < r._2)) {
        val num = m.group(1).toInt
        val bodyStart = m.end
        val lex = new Lexer(bytes, bodyStart, bytes.length)
        lex.next() match {
          case d: PDict =>
            var stream: Option[Array[Byte]] = None
            if (lex.peekIs("stream")) {
              var p = lex.i + "stream".length
              if (p < bytes.length && bytes(p) == '\r') p += 1
              if (p < bytes.length && bytes(p) == '\n') p += 1
              val declared = d.v.get("Length") match {
                case Some(PNum(len)) if len >= 0 && p + len.toInt <= bytes.length =>
                  val e = p + len.toInt
                  // sanity: `endstream` must follow (after optional EOL)
                  var q = e
                  if (q < bytes.length && bytes(q) == '\r') q += 1
                  if (q < bytes.length && bytes(q) == '\n') q += 1
                  if (view.startsWith("endstream", q)) Some(e) else None
                case _ => None
              }
              val end = declared.orElse {
                val sEnd = view.indexOf("endstream", p)
                if (sEnd < 0) None
                else {
                  var e = sEnd
                  // the EOL before `endstream` is not stream data
                  if (e > p && bytes(e - 1) == '\n') e -= 1
                  if (e > p && bytes(e - 1) == '\r') e -= 1
                  Some(e)
                }
              }
              end.foreach { e =>
                streamRanges += ((p, e))
                stream = Some(java.util.Arrays.copyOfRange(bytes, p, e))
              }
            }
            out += num -> PdfObject(num, d, stream)
          case _ => () // objects without a dict body are irrelevant here
        }
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val k = inf.inflate(buf)
      if (k == 0 && !inf.finished()) return out.toByteArray // corrupt: best effort
      out.write(buf, 0, k)
    }
    inf.end()
    out.toByteArray
  }

  // ---------------------------------------------------------------- extract

  /** Parse one PDF blob into the interleaved span sequence. */
  def extract(pdf: Array[Byte]): Seq[Span] = {
    val objs = scanObjects(pdf)

    def deref(v: PdfVal): PdfVal = v match {
      case PRef(n) => objs.get(n).map(o => o.dict: PdfVal).getOrElse(PNull)
      case other   => other
    }
    def streamOf(v: PdfVal): Option[(PDict, Array[Byte])] = v match {
      case PRef(n) =>
        objs.get(n).flatMap { o =>
          o.stream.map { raw =>
            val data = o.dict.v.get("Filter") match {
              case Some(PName("FlateDecode")) => inflate(raw)
              case Some(PArr(fs)) if fs.contains(PName("FlateDecode")) => inflate(raw)
              case _ => raw
            }
            (o.dict, data)
          }
        }
      case _ => None
    }

    // pages in document order: walk /Root → /Pages → /Kids (nested
    // page-tree nodes supported); recovery fallback = every /Type /Page
    // object in object-number order.
    val pageRefs: Seq[Int] = {
      val kids = ArrayBuffer.empty[Int]
      def walk(ref: Int): Unit = objs.get(ref).foreach { o =>
        o.dict.v.get("Type") match {
          case Some(PName("Page")) => kids += ref
          case Some(PName("Pages")) =>
            o.dict.v.get("Kids") match {
              case Some(PArr(ks)) => ks.foreach { case PRef(k) => walk(k); case _ => () }
              case _ => ()
            }
          case _ => ()
        }
      }
      val roots = objs.values.collect {
        case o if o.dict.v.get("Type").contains(PName("Catalog")) => o
      }.toSeq.sortBy(_.num)
      roots.headOption.flatMap(_.dict.v.get("Pages")) match {
        case Some(PRef(p)) => walk(p)
        case _ => ()
      }
      if (kids.nonEmpty) kids.toSeq
      else objs.values.filter(_.dict.v.get("Type").contains(PName("Page")))
        .map(_.num).toSeq.sorted
    }

    val runs = ArrayBuffer.empty[Run]
    var seq = 0

    pageRefs.zipWithIndex.foreach { case (pref, pageIdx) =>
      val page = objs(pref)
      // resources: /XObject name → (ref dict)
      val xobjects: Map[String, PDict] = deref(page.dict.v.getOrElse("Resources", PNull)) match {
        case PDict(res) => deref(res.getOrElse("XObject", PNull)) match {
          case PDict(xs) => xs.collect { case (k, PRef(n)) if objs.contains(n) => k -> objs(n).dict }
          case _ => Map.empty
        }
        case _ => Map.empty
      }
      val contents: Seq[Array[Byte]] = page.dict.v.get("Contents") match {
        case Some(r: PRef)  => streamOf(r).map(_._2).toSeq
        case Some(PArr(rs)) => rs.flatMap(r => streamOf(r).map(_._2))
        case _              => Seq.empty
      }

      contents.foreach { content =>
        val lex = new Lexer(content)
        val stack = ArrayBuffer.empty[PdfVal] // operand stack
        // text state: line origin (translation component only — our
        // layout model tracks position, not full 6-element multiplies)
        var tx = 0.0; var ty = 0.0; var leading = 0.0
        var cmX = 0.0; var cmY = 0.0
        val gsStack = ArrayBuffer.empty[(Double, Double)]
        def num(v: PdfVal): Double = v match { case PNum(d) => d; case _ => 0.0 }
        def popN(n: Int): Seq[PdfVal] = {
          val k = math.min(n, stack.length)
          val r = stack.takeRight(k).toSeq
          stack.remove(stack.length - k, k)
          r
        }
        def showText(bytes: Array[Byte]): Unit = {
          val s = new String(bytes, StandardCharsets.UTF_8)
          if (s.nonEmpty) {
            runs += Run(pageIdx, ty, tx, seq, "text", s, "")
            seq += 1
          }
        }
        var tok = lex.next()
        while (tok != PNull) {
          tok match {
            case POp(op) =>
              op match {
                case "BT" => tx = 0; ty = 0; stack.clear()
                case "ET" => stack.clear()
                case "Td" => val a = popN(2); tx += num(a(0)); ty += num(a(1))
                case "TD" => val a = popN(2); leading = -num(a(1)); tx += num(a(0)); ty += num(a(1))
                case "TL" => val a = popN(1); leading = num(a(0))
                case "Tm" => val a = popN(6); tx = num(a(4)); ty = num(a(5))
                case "T*" => ty -= leading
                case "Tj" => popN(1) match { case Seq(PStr(b)) => showText(b); case _ => () }
                case "'"  => ty -= leading
                  popN(1) match { case Seq(PStr(b)) => showText(b); case _ => () }
                case "\"" => val a = popN(3); ty -= leading
                  a.lastOption match { case Some(PStr(b)) => showText(b); case _ => () }
                case "TJ" => popN(1) match {
                  case Seq(PArr(parts)) =>
                    val sb = new ByteArrayOutputStream(32)
                    parts.foreach { case PStr(b) => sb.write(b, 0, b.length); case _ => () }
                    showText(sb.toByteArray)
                  case _ => ()
                }
                case "q"  => gsStack += ((cmX, cmY))
                case "Q"  => if (gsStack.nonEmpty) {
                  val t = gsStack.remove(gsStack.length - 1); cmX = t._1; cmY = t._2
                }
                case "cm" => val a = popN(6); cmX += num(a(4)); cmY += num(a(5))
                case "Do" => popN(1) match {
                  case Seq(PName(nm)) =>
                    xobjects.get(nm) match {
                      case Some(xd) if xd.v.get("Subtype").contains(PName("Image")) =>
                        val ref = xd.v.get("GraftRef") match {
                          case Some(PStr(b)) => new String(b, StandardCharsets.UTF_8)
                          case _             => nm
                        }
                        runs += Run(pageIdx, cmY, cmX, seq, "image", "", ref)
                        seq += 1
                      case _ => () // form XObjects / missing: ignored
                    }
                  case _ => ()
                }
                case _ => stack.clear() // unknown operator: drop its operands
              }
            case operand => stack += operand
          }
          tok = lex.next()
        }
      }
    }

    // reading order: page, then top-to-bottom, left-to-right, stream order
    runs.sortBy(r => (r.page, -r.y, r.x, r.seq)).zipWithIndex.map {
      case (r, ord) => Span(r.kind, r.text, r.ref, ord)
    }.toSeq
  }

  /** Typed extraction surface over a raw (doc_id, pdf bytes) table —
    * one map, NO shuffle (see scale note in the object doc). */
  def docsFromPdf(raw: Dataset[(String, Array[Byte])]): Dataset[Doc] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.map { case (id, pdf) => Doc(id, extract(pdf)) }
  }
}

/** Deterministic single-page PDF WRITER — the synthesis side of the
  * q_pdf_extract round-trip oracle (and of PdfExtractSpec): text lines
  * become `Tj`/`TJ` runs laid out top-to-bottom at a fixed leading,
  * media entries become `/Subtype /Image` XObjects painted via
  * `q cm /ImN Do Q` between the text lines, the content stream is
  * FlateDecode-compressed, and a valid xref/trailer is emitted (the
  * parser never needs it — recovery scan — but external tools do).
  * Strings carry UTF-8 bytes with `( ) \` escaped (see the encoding
  * note on [[PdfExtract]]). */
object PdfGen {

  private def esc(s: String): Array[Byte] = {
    val utf = s.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream(utf.length + 8)
    utf.foreach { b =>
      if (b == '(' || b == ')' || b == '\\') out.write('\\')
      out.write(b)
    }
    out.toByteArray
  }

  /** items: Left(textLine) | Right(mediaRef), in document order. */
  def pdf(items: Seq[Either[String, String]]): Array[Byte] = {
    val content = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = content.write(s.getBytes(StandardCharsets.ISO_8859_1))
    var y = 780.0
    var imgIdx = 0
    val imgRefs = ArrayBuffer.empty[String]
    items.zipWithIndex.foreach { case (item, i) =>
      item match {
        case Left(line) =>
          w(f"BT /F1 12 Tf 72 $y%.0f Td ")
          if (i % 2 == 0) { w("("); content.write(esc(line)); w(") Tj ET\n") }
          else { // exercise the TJ path too: split at the first space
            val sp = line.indexOf(' ')
            if (sp < 0) { w("[("); content.write(esc(line)); w(")] TJ ET\n") }
            else {
              w("[("); content.write(esc(line.substring(0, sp + 1)))
              w(") -12 ("); content.write(esc(line.substring(sp + 1)))
              w(")] TJ ET\n")
            }
          }
        case Right(ref) =>
          w(f"q 1 0 0 1 72 $y%.0f cm /Im$imgIdx%d Do Q\n")
          imgRefs += ref
          imgIdx += 1
      }
      y -= 14.0
    }
    val deflated = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      d.setInput(content.toByteArray); d.finish()
      val out = new ByteArrayOutputStream(content.size())
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }

    val doc = new ByteArrayOutputStream(2048)
    val offsets = ArrayBuffer.empty[Int]
    def wd(s: String): Unit = doc.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def obj(body: => Unit): Unit = {
      offsets += doc.size()
      wd(s"${offsets.length} 0 obj\n"); body; wd("endobj\n")
    }
    wd("%PDF-1.4\n%âãÏÓ\n")
    obj { wd("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj { wd("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n") }
    val xobjEntries = imgRefs.indices.map(k => s"/Im$k ${6 + k} 0 R").mkString(" ")
    val xobjDict = if (imgRefs.isEmpty) "" else s" /XObject << $xobjEntries >>"
    obj { wd("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 5 0 R >>$xobjDict >> /Contents 4 0 R >>\n") }
    obj {
      wd(s"<< /Length ${deflated.length} /Filter /FlateDecode >>\nstream\n")
      doc.write(deflated); wd("\nendstream\n")
    }
    obj { wd("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    imgRefs.foreach { ref =>
      obj {
        wd("<< /Type /XObject /Subtype /Image /Width 1 /Height 1 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8 /GraftRef (")
        doc.write(esc(ref))
        wd(") /Length 1 >>\nstream\n \nendstream\n")
      }
    }
    val xrefAt = doc.size()
    wd(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => wd(f"$o%010d 00000 n \n"))
    wd(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    doc.toByteArray
  }
}

package graft.pipeline

import org.apache.spark.sql.Dataset

import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML → interleaved-span extraction — the north rule's
  * "HTML boilerplate strip … DOM heuristics" clause applied to RAW
  * markup (the span-level CCNet strip in [[Boilerplate]] handles the
  * cross-document signal; this operator handles the structural one).
  * A single-pass tokenizer (no DOM allocation, no external parser):
  *
  *   - text content is segmented into spans at BLOCK-level tag
  *     boundaries (`p div h1..h6 li br tr section article …`), inline
  *     tags (`a b i span em …`) do not split a block;
  *   - `script` / `style` / `noscript` / `template` / `title` are
  *     RAW-TEXT elements — their content (which may contain `<`) is
  *     skipped by scanning for the matching close tag, like the HTML5
  *     tokenizer's RAWTEXT/script-data states;
  *   - structural boilerplate subtrees (`head nav header footer
  *     aside`) are dropped entirely when `stripBoilerplate` is on —
  *     the DOM-heuristic cut (readability's "not main content"
  *     containers);
  *   - media elements (`img video audio iframe embed source`) emit a
  *     media span carrying their `src` attribute, in document order,
  *     so the interleaved (kind, text, media_ref, order) invariant is
  *     established at parse time;
  *   - comments, doctype and processing instructions are skipped;
  *     character references (named + `&#NNN;` + `&#xHH;`) are decoded
  *     in text content; whitespace runs collapse to a single space
  *     (NBSP is NOT collapsed, matching browser text extraction).
  *
  * Scale shape: strictly per-row — `docsFromHtml` is one typed map
  * with NO shuffle, so extraction composes with any upstream
  * partitioning (e.g. the correction job's salted repartition) without
  * an exchange, and parallelizes embarrassingly at 10^12 documents.
  * Unclosed raw-text/boilerplate elements swallow the remainder of the
  * document (the tokenizer's EOF behavior); real-world tag soup
  * otherwise degrades gracefully because no tag balance is required
  * for text segmentation. */
object HtmlExtract {

  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "tr", "td", "th", "table", "thead", "tbody", "section",
    "article", "main", "blockquote", "pre", "figure", "figcaption",
    "hr", "dl", "dt", "dd", "form", "body", "html",
    "nav", "header", "footer", "aside", "head")

  /** HTML5 raw-text-ish elements: content scanned verbatim to the
    * matching close tag, never tokenized as markup. */
  private val rawTextTags: Set[String] = Set(
    "script", "style", "noscript", "template", "title", "textarea")

  /** Structural boilerplate containers (subtree dropped when
    * stripBoilerplate; `head` is dropped unconditionally — metadata,
    * never content). */
  private val boilerTags: Set[String] = Set("nav", "header", "footer", "aside")

  private val mediaKind: Map[String, String] = Map(
    "img" -> "image", "video" -> "video", "audio" -> "audio",
    "iframe" -> "embed", "embed" -> "embed", "source" -> "media")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "laquo" -> "«", "raquo" -> "»", "szlig" -> "ß",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü")

  /** Extract the interleaved span sequence from raw HTML. */
  def extract(html: String, stripBoilerplate: Boolean = true): Seq[Span] = {
    val n = html.length
    val out = ArrayBuffer.empty[Span]
    val text = new java.lang.StringBuilder(64)
    var lastWasSpace = true // leading whitespace never survives a flush
    // >0 ⇒ inside a dropped subtree; counts nesting of the SAME family
    // of skip tags so `<nav><nav></nav></nav>` needs two closes.
    var skipDepth = 0
    var i = 0

    def flush(): Unit = {
      // trailing space (if any) is a single collapsed ' '
      var len = text.length
      if (len > 0 && text.charAt(len - 1) == ' ') len -= 1
      if (len > 0) {
        out += Span("text", text.substring(0, len), "", out.length)
      }
      text.setLength(0)
      lastWasSpace = true
    }

    def appendDecoded(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastWasSpace) { text.append(' '); lastWasSpace = true }
      } else {
        text.append(c); lastWasSpace = false
      }
    }

    def appendString(s: String): Unit = {
      var j = 0
      while (j < s.length) { appendDecoded(s.charAt(j)); j += 1 }
    }

    // decode one character reference starting at html(i) == '&';
    // returns the index after the reference, appending the decoded
    // text (or the literal '&…' when it is not a valid reference).
    def entity(start: Int): Int = {
      var j = start + 1
      if (j < n && html.charAt(j) == '#') {
        j += 1
        var hex = false
        if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) { hex = true; j += 1 }
        val ds = j
        while (j < n && Character.digit(html.charAt(j), if (hex) 16 else 10) >= 0) j += 1
        if (j > ds && j < n && html.charAt(j) == ';') {
          try {
            val cp = java.lang.Integer.parseInt(html.substring(ds, j), if (hex) 16 else 10)
            if (Character.isValidCodePoint(cp) && cp != 0)
              appendString(new String(Character.toChars(cp)))
            else appendDecoded('�')
            return j + 1
          } catch { case _: NumberFormatException => () }
        }
      } else {
        val ds = j
        while (j < n && j - ds < 10 && Character.isLetterOrDigit(html.charAt(j))) j += 1
        if (j > ds && j < n && html.charAt(j) == ';') {
          namedEntities.get(html.substring(ds, j)) match {
            case Some(rep) => appendString(rep); return j + 1
            case None      => ()
          }
        }
      }
      appendDecoded('&')
      start + 1
    }

    // scan a tag starting at html(i) == '<'; returns index after '>'.
    // Emits media spans / adjusts skip state / flushes blocks.
    def tag(start: Int): Int = {
      var j = start + 1
      if (j >= n) { appendDecoded('<'); return j }
      val c = html.charAt(j)
      if (c == '!') {
        if (html.startsWith("<!--", start)) {
          val e = html.indexOf("-->", start + 4)
          return if (e < 0) n else e + 3
        }
        val e = html.indexOf('>', j) // doctype / CDATA-ish: skip to '>'
        return if (e < 0) n else e + 1
      }
      if (c == '?') { val e = html.indexOf('>', j); return if (e < 0) n else e + 1 }
      val closing = c == '/'
      if (closing) j += 1
      val ns = j
      while (j < n && (Character.isLetterOrDigit(html.charAt(j)) || html.charAt(j) == '-')) j += 1
      if (j == ns) { appendDecoded('<'); return start + 1 } // stray '<'
      val name = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
      // attributes: scan to '>' honoring quoted values (a '>' inside
      // quotes must not terminate the tag)
      val attrStart = j
      var quote = 0.toChar
      while (j < n && (quote != 0 || html.charAt(j) != '>')) {
        val ch = html.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        j += 1
      }
      val attrEnd = j
      val end = if (j < n) j + 1 else n
      val skippingHere = name == "head" || (stripBoilerplate && boilerTags.contains(name))

      if (blockTags.contains(name) && skipDepth == 0) flush()

      if (!closing) {
        if (skippingHere) {
          skipDepth += 1
        } else if (skipDepth == 0 && mediaKind.contains(name)) {
          flush()
          val src = attrValue(html, attrStart, attrEnd, "src")
          out += Span(mediaKind(name), "", src.getOrElse(""), out.length)
        } else if (rawTextTags.contains(name) &&
            !(attrEnd > attrStart && html.charAt(attrEnd - 1) == '/')) {
          // raw text: content is opaque until the matching close tag
          val close = "</" + name
          var e = indexOfIgnoreCase(html, close, end)
          if (e < 0) return n
          e = html.indexOf('>', e)
          return if (e < 0) n else e + 1
        }
      } else if (skippingHere && skipDepth > 0) {
        skipDepth -= 1
      }
      end
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') i = tag(i)
      else if (skipDepth > 0) i += 1
      else if (c == '&') i = entity(i)
      else { appendDecoded(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** All `<a href>` targets in document order — the link-extraction
    * half of crawl-graph construction. Raw-text element content
    * (script/style/…) and comments are skipped exactly like
    * [[extract]] (a URL-shaped string inside JavaScript is NOT a
    * link); boilerplate subtrees are NOT skipped — nav links are real
    * edges in a crawl graph. `&amp;` in the attribute value is decoded
    * (the entity URLs legally contain after HTML serialization). */
  def links(html: String): Seq[String] = {
    val n = html.length
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      if (html.charAt(i) != '<') i += 1
      else {
        var j = i + 1
        if (j < n && html.charAt(j) == '!') {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
          } else { val e = html.indexOf('>', j); i = if (e < 0) n else e + 1 }
        } else if (j < n && html.charAt(j) == '?') {
          val e = html.indexOf('>', j); i = if (e < 0) n else e + 1
        } else {
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)) || html.charAt(j) == '-')) j += 1
          if (j == ns) i += 1 // stray '<'
          else {
            val name = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
            val attrStart = j
            var quote = 0.toChar
            while (j < n && (quote != 0 || html.charAt(j) != '>')) {
              val ch = html.charAt(j)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              j += 1
            }
            val attrEnd = j
            val end = if (j < n) j + 1 else n
            if (!closing && name == "a")
              attrValue(html, attrStart, attrEnd, "href")
                .filter(_.nonEmpty)
                .foreach(h => out += h.replace("&amp;", "&"))
            if (!closing && rawTextTags.contains(name) &&
                !(attrEnd > attrStart && html.charAt(attrEnd - 1) == '/')) {
              val close = "</" + name
              var e = indexOfIgnoreCase(html, close, end)
              if (e < 0) i = n
              else { e = html.indexOf('>', e); i = if (e < 0) n else e + 1 }
            } else i = end
          }
        }
      }
    }
    out.toSeq
  }

  /** All `<a href>` anchors with their DECODED inner text, in document
    * order — the anchor-text half of crawl-graph enrichment (the href
    * half is [[links]]; search indexes famously rank targets by the
    * text of the links pointing AT them). Tag handling mirrors
    * [[links]]: comments/doctypes/PIs skipped, raw-text subtrees
    * (script/style/…) opaque — a decoy anchor inside JavaScript
    * contributes nothing — and `&amp;` in the href is decoded. Inner
    * text: every tag between the open and close acts as a whitespace
    * separator (so `a<br>b` → "a b" and `Read <b>more</b>` → "Read
    * more"), character references decode with [[extract]]'s
    * semantics, whitespace collapses to single spaces and is trimmed.
    * An `<a>` without a non-empty href collects nothing; a new `<a`
    * implies closing the previous one (HTML5 forbids nesting). */
  def anchors(html: String): Seq[(String, String)] = {
    val n = html.length
    val out = ArrayBuffer.empty[(String, String)]
    var href: String = null
    val sb = new StringBuilder
    var lastWs = true
    def append(c: Char): Unit =
      if (href != null) {
        if (Character.isWhitespace(c)) { if (!lastWs) { sb.append(' '); lastWs = true } }
        else { sb.append(c); lastWs = false }
      }
    def appendStr(s: String): Unit = {
      var j = 0
      while (j < s.length) { append(s.charAt(j)); j += 1 }
    }
    def emit(): Unit = {
      if (href != null) out += ((href, sb.toString.trim))
      href = null; sb.setLength(0); lastWs = true
    }
    // character-reference decode, [[extract]]'s entity semantics
    def entity(start: Int): Int = {
      var j = start + 1
      if (j < n && html.charAt(j) == '#') {
        j += 1
        var hex = false
        if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) { hex = true; j += 1 }
        val ds = j
        while (j < n && Character.digit(html.charAt(j), if (hex) 16 else 10) >= 0) j += 1
        if (j > ds && j < n && html.charAt(j) == ';') {
          try {
            val cp = java.lang.Integer.parseInt(html.substring(ds, j), if (hex) 16 else 10)
            if (Character.isValidCodePoint(cp) && cp != 0)
              appendStr(new String(Character.toChars(cp)))
            else append('�')
            return j + 1
          } catch { case _: NumberFormatException => () }
        }
      } else {
        val ds = j
        while (j < n && j - ds < 10 && Character.isLetterOrDigit(html.charAt(j))) j += 1
        if (j > ds && j < n && html.charAt(j) == ';') {
          namedEntities.get(html.substring(ds, j)) match {
            case Some(rep) => appendStr(rep); return j + 1
            case None      => ()
          }
        }
      }
      append('&')
      start + 1
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        var j = i + 1
        if (j < n && html.charAt(j) == '!') {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
          } else { val e = html.indexOf('>', j); i = if (e < 0) n else e + 1 }
        } else if (j < n && html.charAt(j) == '?') {
          val e = html.indexOf('>', j); i = if (e < 0) n else e + 1
        } else {
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)) || html.charAt(j) == '-')) j += 1
          if (j == ns) { append(c); i += 1 } // stray '<' is literal text
          else {
            val name = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
            val attrStart = j
            var quote = 0.toChar
            while (j < n && (quote != 0 || html.charAt(j) != '>')) {
              val ch = html.charAt(j)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              j += 1
            }
            val attrEnd = j
            val end = if (j < n) j + 1 else n
            if (!closing && name == "a") {
              emit() // implied close of any open anchor
              href = attrValue(html, attrStart, attrEnd, "href")
                .map(_.replace("&amp;", "&")).filter(_.nonEmpty).orNull
            } else if (closing && name == "a") emit()
            else append(' ') // any other tag separates words
            if (!closing && rawTextTags.contains(name) &&
                !(attrEnd > attrStart && html.charAt(attrEnd - 1) == '/')) {
              val close = "</" + name
              var e = indexOfIgnoreCase(html, close, end)
              if (e < 0) i = n
              else { e = html.indexOf('>', e); i = if (e < 0) n else e + 1 }
            } else i = end
          }
        }
      } else if (c == '&') i = entity(i)
      else { append(c); i += 1 }
    }
    emit()
    out.toSeq
  }

  /** Value of attribute `attr` inside the tag body [from, until). */
  private def attrValue(s: String, from: Int, until: Int, attr: String): Option[String] = {
    var i = from
    while (i < until) {
      // attribute name
      while (i < until && !isAttrNameChar(s.charAt(i))) i += 1
      val ns = i
      while (i < until && isAttrNameChar(s.charAt(i))) i += 1
      if (i == ns) return None
      val name = s.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
      while (i < until && Character.isWhitespace(s.charAt(i))) i += 1
      var value = ""
      if (i < until && s.charAt(i) == '=') {
        i += 1
        while (i < until && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < until && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i); i += 1
          val vs = i
          while (i < until && s.charAt(i) != q) i += 1
          value = s.substring(vs, i)
          if (i < until) i += 1
        } else {
          // HTML5: an unquoted value runs to whitespace or '>'; a '/'
          // is PART of the value (src=media://a/b parses whole)
          val vs = i
          while (i < until && !Character.isWhitespace(s.charAt(i))) i += 1
          value = s.substring(vs, i)
        }
      }
      if (name == attr) return Some(value)
    }
    None
  }

  private def isAttrNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '-' || c == '_' || c == ':'

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = from
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Typed extraction surface over a raw (doc_id, html) table — one
    * map, NO shuffle; composes with [[Boilerplate.strip]] (cross-doc
    * signal) and the correction job downstream. */
  def docsFromHtml(raw: Dataset[(String, String)],
      stripBoilerplate: Boolean = true): Dataset[Doc] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.map { case (id, html) => Doc(id, extract(html, stripBoilerplate)) }
  }
}

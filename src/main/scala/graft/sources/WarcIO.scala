package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import scala.collection.mutable.ArrayBuffer

/** From-scratch WARC 1.0 container reader/writer — the standard
  * web-crawl archive format (ISO 28500; what Common-Crawl-shaped
  * corpora arrive in), pure JVM. The extraction pipeline's raw input
  * at 100 TB is exactly this: a directory of ~1 GiB `.warc.gz` files,
  * each a CONCATENATION of per-record gzip members.
  *
  * Reader:
  *   - transparent multi-member gzip (Java's GZIPInputStream consumes
  *     concatenated members; plain uncompressed WARC also accepted);
  *   - records parsed by the WARC framing rules: version line, CRLF
  *     header block, `Content-Length` octets of payload, CRLF CRLF
  *     separator — NOT by scanning for "WARC/1.0" in content (payload
  *     bytes may contain it);
  *   - `response` records carry an HTTP message as payload — status
  *     line + headers are split off at the first CRLF CRLF and the
  *     body returned as bytes (charset decoding is the caller's call);
  *   - malformed trailing garbage ends the scan gracefully (a
  *     truncated crawl file yields its complete prefix of records).
  *
  * Scale shape: one WARC file = one independent byte blob — parsing is
  * strictly per-file (mapPartitions over a binaryFile scan in the
  * query layer), no shuffle, no cross-file state; a 1000-executor
  * cluster streams 100k files embarrassingly parallel. */
object WarcIO {

  /** One WARC record: headers (case-preserved names, first wins) and
    * raw payload octets. */
  final case class WarcRecord(headers: Map[String, String], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
    /** HTTP body of a response record: payload after the first
      * CRLF CRLF (the whole payload when no HTTP header block). */
    def httpBody: Array[Byte] = {
      val sep = indexOfCrlfCrlf(payload)
      if (sep < 0) payload
      else java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
    }
    /** HTTP header block of a response record ("" when none). */
    def httpHeaders: String = {
      val sep = indexOfCrlfCrlf(payload)
      if (sep < 0) ""
      else new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
    }
    /** Decoded HTML of a response record, honoring the declared
      * charset ([[WarcIO.sniffCharset]]). */
    def htmlText: String = {
      val body = httpBody
      new String(body, WarcIO.sniffCharset(httpHeaders, body))
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Parse every record of one WARC file (gzip'd or plain). */
  def records(file: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (!isGzip(file)) file
      else {
        val out = new ByteArrayOutputStream(file.length * 4)
        try {
          val in = new GZIPInputStream(new ByteArrayInputStream(file), 8192)
          val buf = new Array[Byte](8192)
          var k = in.read(buf)
          while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
        } catch { case _: java.io.IOException => () } // truncated member: keep prefix
        out.toByteArray
      }
    val out = ArrayBuffer.empty[WarcRecord]
    var i = 0
    while (i < bytes.length) {
      // version line
      val lineEnd = indexOf(bytes, "\r\n", i)
      if (lineEnd < 0) return out.toSeq
      val version = new String(bytes, i, lineEnd - i, StandardCharsets.ISO_8859_1)
      if (!version.startsWith("WARC/")) {
        // skip stray blank lines between records; anything else = garbage tail
        if (version.trim.isEmpty) { i = lineEnd + 2 }
        else return out.toSeq
      } else {
        val headEnd = indexOfCrlfCrlf(bytes, lineEnd)
        if (headEnd < 0) return out.toSeq
        val headerBlock = new String(bytes, lineEnd + 2,
          math.max(0, headEnd - lineEnd - 2), StandardCharsets.ISO_8859_1)
        val headers = headerBlock.split("\r\n").toSeq.flatMap { line =>
          val c = line.indexOf(':')
          if (c <= 0) None else Some(line.substring(0, c).trim -> line.substring(c + 1).trim)
        }
        val hmap = headers.foldLeft(Map.empty[String, String]) {
          case (m, (k, v)) => if (m.exists(_._1.equalsIgnoreCase(k))) m else m + (k -> v)
        }
        val len = hmap.collectFirst {
          case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toLong
        }.getOrElse(-1L)
        val payloadStart = headEnd + 4
        if (len < 0 || payloadStart + len > bytes.length) {
          // missing/overrunning length: the record is truncated — stop
          return out.toSeq
        }
        out += WarcRecord(hmap,
          java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len.toInt))
        i = payloadStart + len.toInt
        // per spec: two CRLFs terminate the record
        while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n') i += 2
      }
    }
    out.toSeq
  }

  private def indexOf(b: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = from
    while (i + n.length <= b.length) {
      var k = 0
      while (k < n.length && b(i + k) == n(k)) k += 1
      if (k == n.length) return i
      i += 1
    }
    -1
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Charset of an HTTP-delivered HTML page, WHATWG-style precedence:
    * 1. `charset=` in the Content-Type response header;
    * 2. `<meta charset="…">` or `<meta http-equiv=Content-Type
    *    content="…charset=…">` within the first 1024 body bytes
    *    (scanned as ASCII — charset names are ASCII by definition);
    * 3. UTF-8 (the modern web default — and a superset of ASCII, so
    *    undeclared legacy ASCII pages decode identically).
    * Unknown/unsupported charset names fall back to UTF-8 rather than
    * throwing — a crawl must never die on a bogus declaration. */
  def sniffCharset(httpHeaders: String, body: Array[Byte]): java.nio.charset.Charset = {
    def parse(name: String): Option[java.nio.charset.Charset] = {
      val n = name.trim.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'").trim
      if (n.isEmpty) None
      else try {
        if (java.nio.charset.Charset.isSupported(n))
          Some(java.nio.charset.Charset.forName(n))
        else None
      } catch { case _: java.nio.charset.IllegalCharsetNameException => None }
    }
    def charsetParam(s: String): Option[String] = {
      val i = indexOfIgnoreCaseStr(s, "charset=")
      if (i < 0) None
      else {
        val from = i + "charset=".length
        var j = from
        while (j < s.length && ";, \t\r\n\"'>".indexOf(s.charAt(j)) < 0) j += 1
        // quoted values: charset="utf-8"
        if (j == from && from < s.length && (s.charAt(from) == '"' || s.charAt(from) == '\'')) {
          val q = s.charAt(from)
          val e = s.indexOf(q, from + 1)
          if (e > from) Some(s.substring(from + 1, e)) else None
        } else Some(s.substring(from, j))
      }
    }
    val fromHeader = httpHeaders.linesIterator
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:"))
      .flatMap(charsetParam).flatMap(parse)
    fromHeader.getOrElse {
      val head = new String(body, 0, math.min(1024, body.length),
        StandardCharsets.US_ASCII)
      val metaCharset = {
        val i = indexOfIgnoreCaseStr(head, "<meta")
        if (i < 0) None
        else charsetParam(head) // covers <meta charset=…> AND http-equiv content=…charset=…
      }
      metaCharset.flatMap(parse).getOrElse(StandardCharsets.UTF_8)
    }
  }

  private def indexOfIgnoreCaseStr(s: String, needle: String): Int = {
    var i = 0
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** PRODUCTION source path at crawl scale: a directory of `.warc.gz`
    * shard files under Spark's `binaryFile` source (one row per file —
    * only the `content` column is read), each blob container-parsed and
    * every `response` page fed through the raw-HTML extractor, keyed by
    * WARC-Target-URI. ONE flatMap, NO shuffle — a 1000-executor cluster
    * streams 100k shards embarrassingly parallel, and the result
    * composes directly with [[graft.pipeline.Boilerplate.strip]] and
    * the correction job. (binaryFile caps files at 2 GiB — crawl shards
    * are conventionally ~1 GiB, under the cap by design.) */
  def docsFromWarc(spark: org.apache.spark.sql.SparkSession, path: String,
      stripBoilerplate: Boolean = true): org.apache.spark.sql.Dataset[graft.pipeline.Doc] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap { blob =>
        records(blob).iterator
          .filter(_.warcType == "response")
          .map { r =>
            graft.pipeline.Doc(r.targetUri,
              graft.pipeline.HtmlExtract.extract(r.htmlText, stripBoilerplate))
          }
      }
  }

  /** Render a Doc back to an HTML page — the INVERSE of
    * [[graft.pipeline.HtmlExtract.extract]] on content spans: text
    * spans become escaped `<p>` blocks, media spans the element whose
    * kind the extractor maps back (image→img, video/audio→themselves,
    * embed→iframe, anything else→source). render∘extract is the
    * identity on (text, media_ref, order) and on kind UP TO the HTML
    * taxonomy: kinds HTML has no element for (e.g. formula, table
    * refs) serialize as `<source>` and re-extract as "media" — the
    * documented, inherent collapse of exporting through HTML. */
  def renderHtml(doc: graft.pipeline.Doc): String = {
    val sb = new StringBuilder(256)
    sb ++= "<html><body>"
    doc.spans.foreach { sp =>
      if (sp.kind == "text") {
        sb ++= "<p>"
        sb ++= sp.text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        sb ++= "</p>"
      } else {
        val tag = sp.kind match {
          case "image" => "img"
          case "video" => "video"
          case "audio" => "audio"
          case "embed" => "iframe"
          case _       => "source"
        }
        sb ++= s"""<$tag src="${sp.media_ref}">"""
      }
    }
    sb ++= "</body></html>"
    sb.toString
  }

  /** SINK: write a Dataset[Doc] as `.warc.gz` crawl shards — the
    * reverse of [[docsFromWarc]], one shard file per partition, one
    * gzip member per document, each page rendered via [[renderHtml]]
    * and keyed by `uriPrefix + doc_id`. All IO goes through the Hadoop
    * FileSystem resolved from the target URI (file:/HDFS/S3A alike);
    * shard count = upstream partitioning, so the caller controls shard
    * size with a repartition — the ~1 GiB crawl-shard convention at
    * scale. Returns nothing; determinism of CONTENT is per-record
    * (shard membership follows partitioning). */
  def writeWarcShards(docs: org.apache.spark.sql.Dataset[graft.pipeline.Doc],
      dir: String, uriPrefix: String = "https://graft.example/",
      date: String = "2026-01-01T00:00:00Z"): Unit = {
    val confSer = new SerializableHadoopConf(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(confSer.value).mkdirs(dirPath)
    val (d, pfx, dt) = (dir, uriPrefix, date)
    docs.foreachPartition { (it: Iterator[graft.pipeline.Doc]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val buf = new ByteArrayOutputStream(1 << 16)
        it.foreach { doc =>
          writeResponse(buf, uri = pfx + doc.doc_id,
            html = renderHtml(doc).getBytes(StandardCharsets.UTF_8),
            date = dt, gzip = true)
        }
        val base = new org.apache.hadoop.fs.Path(d)
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          base.toUri, confSer.value)
        try {
          fs.setWriteChecksum(false)
          val out = fs.create(
            new org.apache.hadoop.fs.Path(base, f"shard-$pid%05d.warc.gz"), true)
          try buf.writeTo(out) finally out.close()
        } finally fs.close()
      }
    }
  }

  /** Write one WARC `response` record (HTTP 200, text/html payload),
    * per-record gzip member when `gzip` is set — the Common Crawl
    * convention, so any single record of a 1 GiB file is independently
    * decompressible. `date` is caller-provided (determinism: no wall
    * clock in synthesis paths). */
  def writeResponse(out: ByteArrayOutputStream, uri: String, html: Array[Byte],
      date: String, gzip: Boolean,
      contentType: String = "text/html; charset=utf-8"): Unit = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
    val payload = new Array[Byte](http.length + html.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(html, 0, payload, http.length, html.length)
    val rec = new ByteArrayOutputStream(payload.length + 256)
    rec.write(("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1))
    rec.write(payload)
    rec.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    if (!gzip) rec.writeTo(out)
    else {
      val gz = new GZIPOutputStream(out, 8192)
      rec.writeTo(gz)
      gz.close() // finishes the member (BAOS close is a no-op); the
                 // caller appends the next member right after
    }
  }
}

package graft.ops

/** From-scratch URL canonicalization — the first step of crawl-scale
  * URL deduplication (every CC-style pipeline dedups fetch lists and
  * dedups documents by canonical URL before any content hashing).
  * RFC 3986 §6 syntax-based normalization plus the de-facto crawl
  * conventions:
  *
  *   - scheme and host lowercased; trailing host dot and userinfo
  *     dropped; default ports (http:80, https:443) removed;
  *   - fragment dropped (never sent to the server);
  *   - percent-escapes of UNRESERVED characters decoded (%41 -> A),
  *     all remaining escapes uppercased (%2f -> %2F);
  *   - path: duplicate slashes collapsed, `.` / `..` segments resolved
  *     (".." clamps at root), trailing slash dropped, empty path -> "/";
  *   - query: tracking parameters removed (utm_*, fbclid, gclid, ...),
  *     survivors sorted by (key, value) so parameter order never splits
  *     a canonical identity, empty query -> no "?".
  *
  * Pure per-row function — in the query layer it runs inside one typed
  * projection (scan -> map -> hash agg), so URL dedup at 10^12 fetch
  * records costs exactly one count-style aggregation exchange. */
object UrlOps {

  private val trackingKeys: Set[String] = Set(
    "fbclid", "gclid", "msclkid", "dclid", "igshid", "ref", "ref_src",
    "mc_cid", "mc_eid", "s_kwcid", "mkt_tok", "oly_enc_id", "oly_anon_id")

  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase
    k.startsWith("utm_") || trackingKeys(k)
  }

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved percent-escapes; uppercase the rest; pass
    * malformed escapes through verbatim. */
  private[ops] def normalizeEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb += v.toChar
        else { sb += '%'; sb += Character.toUpperCase(s.charAt(i + 1))
               sb += Character.toUpperCase(s.charAt(i + 2)) }
        i += 3
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Canonical form of an absolute http(s)-style URL; non-absolute
    * input (no "://") is returned fragment-stripped but otherwise
    * untouched — the caller decides how to treat relative refs. */
  def canonicalize(url: String): String = {
    val noFrag = { val h = url.indexOf('#'); if (h >= 0) url.substring(0, h) else url }
    val si = noFrag.indexOf("://")
    if (si < 0) return noFrag
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val pathStart = {
      val i = rest.indexWhere(c => c == '/' || c == '?')
      if (i < 0) rest.length else i
    }
    var authority = rest.substring(0, pathStart)
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    val (rawHost, port) = {
      val c = authority.lastIndexOf(':')
      if (c >= 0 && c + 1 <= authority.length &&
          authority.substring(c + 1).forall(_.isDigit))
        (authority.substring(0, c), authority.substring(c + 1))
      else (authority, "")
    }
    val host = {
      val h = rawHost.toLowerCase
      if (h.endsWith(".")) h.dropRight(1) else h
    }
    val defaultPort = port.isEmpty ||
      (scheme == "http" && port == "80") || (scheme == "https" && port == "443")
    val portPart = if (defaultPort) "" else ":" + port

    val pq = rest.substring(pathStart)
    val qi = pq.indexOf('?')
    val rawPath = if (qi >= 0) pq.substring(0, qi) else pq
    val rawQuery = if (qi >= 0) pq.substring(qi + 1) else ""

    val resolved = normalizeEscapes(rawPath).split("/", -1)
      .foldLeft(List.empty[String]) {
        case (acc, "")   => acc // collapses // and drops the trailing slash
        case (acc, ".")  => acc
        case (acc, "..") => if (acc.isEmpty) acc else acc.init
        case (acc, seg)  => acc :+ seg
      }
    val path = if (resolved.isEmpty) "/" else resolved.mkString("/", "/", "")

    val params = rawQuery.split("&").iterator.filter(_.nonEmpty)
      .map { p =>
        val e = p.indexOf('=')
        if (e < 0) (normalizeEscapes(p), "", false) // bare key, no '='
        else (normalizeEscapes(p.substring(0, e)),
              normalizeEscapes(p.substring(e + 1)), true)
      }
      .filterNot { case (k, _, _) => isTracking(k) }
      .toSeq.sortBy { case (k, v, _) => (k, v) }
    val query =
      if (params.isEmpty) ""
      else params.map { case (k, v, hadEq) => if (hadEq) s"$k=$v" else k }
        .mkString("?", "&", "")

    scheme + "://" + host + portPart + path + query
  }
}

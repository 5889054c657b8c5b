package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic text/vector primitives for the training-data-pipeline
  * operators (dedup, similarity, language ID). Pure functions — run
  * inside typed maps on executors. */
object TextOps {

  /** Word-or-number-or-punct token pattern (BPE-ish pre-tokenizer);
    * identical literal in Java regex and RE2. */
  final val BpeishRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  private def md5Bytes(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))

  /** 64-bit SimHash over whitespace tokens: bit i of the hash votes
    * +1/-1 weighted by token frequency. Separator set = RE2/DuckDB \s
    * ([ \t\n\f\r], no VT) — must match SimHash64Expression.isSep and
    * the DuckDB oracle's regexp_split_to_array(text, '\s+'). */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    text.split("[ \t\n\f\r]+").filter(_.nonEmpty).foreach { tok =>
      val h = md5Bytes(tok)
      var i = 0
      while (i < 64) {
        val bit = (h(i / 8) >> (i % 8)) & 1
        votes(i) += (if (bit == 1) 1 else -1)
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Hyperplane h's component for dimension d: +-1 from a splitmix-style
    * bit mix of (h, d) — deterministic, seedless, no stored planes. */
  def lshPlaneSign(h: Int, d: Int): Double = {
    var x = (h.toLong << 32 | d.toLong) + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    if (((x ^ (x >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  /** The hyperplanes as literal sign vectors (for embedding SQL
    * expressions identically in Spark and the DuckDB oracle). 16 bits
    * for the ANN query signature; qDedupEmbed widens to 32 (the same
    * plane family — plane h is identical at every width). */
  def lshPlanes(dim: Int, bits: Int = 16): IndexedSeq[Array[Double]] =
    (0 until bits).map(h => Array.tabulate(dim)(d => lshPlaneSign(h, d)))

  /** 16-bit random-hyperplane LSH signature. */
  def lshSignature(v: Array[Float]): Int = {
    var sig = 0
    var h = 0
    while (h < 16) {
      var dot = 0.0
      var d = 0
      while (d < v.length) {
        dot += lshPlaneSign(h, d) * v(d)
        d += 1
      }
      if (dot > 0) sig |= (1 << h)
      h += 1
    }
    sig
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Char-trigram-profile language ID over a tiny built-in profile set
    * (n-gram heuristic; the reference corpus is German — 'de' profiles
    * include the historic ſ/uͤ forms). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("ch ", "ein", "ich", "der", "die", "und", "sch", "en ", "cht",
      "ſch", "daß", "uͤb"),
    "en" -> Seq("the", " th", "ing", "and", "ion", " of", "ed ", "is "),
    "fr" -> Seq("les", " de", "de ", "ent", "que", "une", "est", "é"),
    "es" -> Seq(" de", "los", "ión", "que", "ado", "la ", "es "),
    "nl" -> Seq("een", "het", "aar", "ij", "de "))

  def langId(text: String): String = {
    val t = text.toLowerCase
    val scores = langProfiles.map { case (lang, grams) =>
      lang -> grams.map { g =>
        // non-overlapping occurrences (greedy left-to-right) — the same
        // count as the replace-based SQL formula in langScoreSql, so the
        // typed path and the oracled expression path agree exactly
        var c = 0; var idx = t.indexOf(g)
        while (idx >= 0) { c += 1; idx = t.indexOf(g, idx + g.length) }
        c
      }.sum
    }
    val best = scores.maxBy { case (l, c) => (c, l) } // deterministic tie-break
    if (best._2 == 0) "unk" else best._1
  }

  // ------------------------------------------------- shared SQL fragments
  // (identical strings run as Spark `expr` and as DuckDB oracle SQL, so
  // both engines compute the same formula by construction)

  /** Per-language profile score: non-overlapping occurrence counts via
    * the replace-length trick, summed over the profile grams. */
  def langScoreSql(col: String, grams: Seq[String]): String =
    grams.map { g =>
      val n = g.codePointCount(0, g.length)
      s"(length($col) - length(replace($col, '$g', ''))) / $n"
    }.mkString("(", " + ", ")")

  /** Pick the best language from s_<lang> columns: max score, ties to the
    * lexicographically LARGEST lang (= langId's maxBy on (count, lang)),
    * 'unk' when every score is 0. */
  def langChooseSql: String = {
    val langs = langProfiles.keys.toSeq.sorted
    val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val whens = langs.sorted(Ordering[String].reverse).dropRight(1)
      .map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
    s"CASE WHEN $g = 0 THEN 'unk' $whens ELSE '${langs.min}' END"
  }

  /** 16-bit LSH signature of an array column, as a SQL expression over
    * literal hyperplane sign vectors (Spark dialect: zip_with/aggregate).
    * Bit h = (dot(embedding, plane_h) > 0) — identical to lshSignature. */
  def lshSigSparkSql(col: String, dim: Int, bits: Int = 16): String =
    lshPlanes(dim, bits).zipWithIndex.map { case (p, h) =>
      val lit = p.mkString("array(", ",", ")")
      s"""(CASE WHEN aggregate(zip_with($col, slice($lit, 1, size($col)),
         |(x, p) -> CAST(x AS DOUBLE) * p), 0D, (acc, v) -> acc + v) > 0
         |THEN ${1L << h}L ELSE 0L END)""".stripMargin.replace('\n', ' ')
    }.mkString("(", " + ", ")")

  /** Same signature in DuckDB dialect (list_dot_product over literal
    * sliced plane lists). */
  def lshSigDuckSql(col: String, dim: Int, bits: Int = 16): String =
    lshPlanes(dim, bits).zipWithIndex.map { case (p, h) =>
      val lit = p.mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($col, ($lit)[1:len($col)]) > 0 THEN CAST(${1L << h} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** C4 line-keep rule (Raffel et al. 2020, §2.2 heuristics): a line
    * survives iff it ends in terminal punctuation (. ! ? "), has at
    * least 3 words, contains no curly brace (code), and mentions
    * neither "lorem ipsum" nor "javascript" (boilerplate/warning
    * text). Pure per-line predicate — the doc-level rewrite (drop
    * failing lines, then drop docs with too few survivors) happens in
    * the query layer. */
  def c4KeepLine(line: String): Boolean = {
    val t = line.trim
    if (t.isEmpty) return false
    val last = t.charAt(t.length - 1)
    (last == '.' || last == '!' || last == '?' || last == '"') &&
      t.split("\\s+").length >= 3 &&
      t.indexOf('{') < 0 && t.indexOf('}') < 0 && {
        val lo = t.toLowerCase(java.util.Locale.ROOT)
        !lo.contains("lorem ipsum") && !lo.contains("javascript")
      }
  }

  /** Windows-1252 printable characters at byte positions 0x80–0x9F
    * (where ISO-8859-1 has C1 controls) → their byte value. Mojibake
    * produced by "UTF-8 bytes decoded as cp1252" surfaces these chars;
    * the inverse map recovers the original bytes. */
  private val cp1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** Mojibake repair (the ftfy core case): text whose characters are
    * really UTF-8 BYTES mis-decoded as Latin-1 OR Windows-1252
    * ("GrÃ¼ÃŸe" → "Grüße", "â€™" → "’"). Every char must map back to
    * a byte — chars < 0x100 by code point (covers the Latin-1 path,
    * incl. C1 controls), cp1252 printables via [[cp1252Inverse]] (the
    * cp1252 path) — and the byte sequence must STRICT-decode as UTF-8;
    * otherwise the text is returned untouched (a real "café" is not
    * valid UTF-8 bytes, so legitimate Latin-1 text never false-fixes;
    * pure ASCII round-trips to itself). One pass, no heuristics —
    * the deterministic subset of ftfy suitable for an oracle gate. */
  def fixMojibake(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    var sawHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c < 0x100) c.toInt
        else cp1252Inverse.getOrElse(c, -1)
      if (b < 0) return s // unmappable char: not mojibake
      if (b >= 0x80) sawHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!sawHigh) return s // pure ASCII: nothing to repair
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => s }
  }
}

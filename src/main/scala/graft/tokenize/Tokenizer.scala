package graft.tokenize

import scala.collection.mutable

/** Rule-based tokenizer replacing the reference's spacy 'de' pipeline
  * (lib/lexicon.py:33-64), which is unavailable and non-deterministic
  * across model versions. Documented divergence (SURVEY.md §7.4 hard
  * part 2): every punctuation character is a singleton token; maximal
  * runs of other non-space characters are word tokens. This keeps the
  * reference's infix rules for '—' and '/' (lib/lexicon.py:41-45) and is
  * expressible as a single regex, so the DuckDB oracle can reproduce it
  * exactly (see SparkEntry.oracleSql).
  */
object Tokenizer {

  /** Exact set of singleton punctuation code points. Mirrors ASCII
    * punctuation plus the historic quotes/dashes listed in
    * lib/lexicon.py:46-56 comments. Backslash intentionally excluded
    * (keeps the class portable across Java regex and RE2). */
  final val PunctChars: Set[Int] =
    ("""!"#$%&'()*+,./:;<=>?@[]^_`{|}~""" + "-«»„“”‘’‚‛–—…¡¿·").map(_.toInt).toSet

  /** Java-regex alternation equivalent to `tokenize`; the same literal
    * works in RE2 (DuckDB). Group 0 = the token. */
  final val TokenRegex: String =
    """[!-/:-@\[-`{-~«»„“”‘’‚‛–—…¡¿·]|[^!-/:-@\[-`{-~«»„“”‘’‚‛–—…¡¿·\s]+"""

  def tokenize(line: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.result(); cur.clear() } }
    var i = 0
    while (i < line.length) {
      val cp = line.codePointAt(i)
      val cc = Character.charCount(cp)
      if (Character.isWhitespace(cp)) flush()
      else if (PunctChars.contains(cp)) {
        flush(); out += new String(Character.toChars(cp))
      } else cur.appendAll(Character.toChars(cp))
      i += cc
    }
    flush()
    out.toSeq
  }

  /** Plain whitespace split, Python str.split() semantics: any
    * whitespace run, no empty tokens (lib/latticegen.py:24-26). */
  def splitInputString(line: String): Array[String] =
    line.split("\\s+").filterNot(_.isEmpty)
}

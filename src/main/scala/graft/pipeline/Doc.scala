package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** The interleaved text+media document schema — the authoritative input
  * shape per BASELINE.json input_hint:
  * docs(doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>).
  * `kind='text'` spans are corrected in place; media spans pass through
  * untouched, order preserved (span-sequence equality invariant). */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)
final case class Doc(doc_id: String, spans: Seq[Span])

/** Deterministic synthetic Doc-table generator (FIXTURES.md §4): no wall
  * clock, no external data — a seeded per-doc splitmix keyed by doc index,
  * so content is independent of partitioning. Text spans are GT lines
  * from the reference README examples (README.md:88-92) perturbed with
  * the classic confusions (ch→h, ck→>, i→1, N→M, t→f, space drops);
  * ~20% media spans; Zipf-ish span counts to exercise skew salting. */
object DocGen {

  /** GT lines (reference README worked examples). */
  val gtLines: IndexedSeq[String] = IndexedSeq(
    "»Vergebt mir, daß ich nicht weiß, wie",
    "aus dem Geiſte aller Nationen Nahrung",
    "Kannſt Du mir die rechte Bahn nicht zeigen?",
    "trag zu bringen. —",
    "ſie ins irdiſche Leben hinein. Mit leichtem,",
    "ich denke. Aber was die ſelige Frau Geheimräthin",
    "„Das kann ich nicht, c'est absolument impos-",
    "rend. In dem Augenblick war ihr nicht wohl zu",
    "für die ſie ſich ſchlugen.“",
    "ſollte. Nur über die Familien, wo man ſie einführen")

  private val confusions: IndexedSeq[(String, String)] = IndexedSeq(
    ("ch", "h"), ("ck", ">"), ("i", "1"), ("N", "M"), ("t", "f"),
    ("u", "n"), ("ſ", "f"))

  /** splitmix64 step — cheap, high-quality, allocation-free PRNG. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Perturb a GT line into an OCR-looking line, deterministically.
    * Besides the classic confusions, injects char-level noise at random
    * positions — this models the unbounded novel-token tail of a
    * web-scale corpus (cache-adversarial: most windows are distinct). */
  def perturb(line: String, seed: Long): String = {
    var s = line
    var r = mix(seed)
    val nEdits = 1 + (((r >>> 33) % 3).toInt)
    var k = 0
    while (k < nEdits) {
      r = mix(r)
      val (from, to) = confusions((((r >>> 13) % confusions.length).toInt + confusions.length) % confusions.length)
      val idx = s.indexOf(from)
      if (idx >= 0) s = s.substring(0, idx) + to + s.substring(idx + from.length)
      k += 1
    }
    // novel-token noise: ~75% of lines get 1-2 random char substitutions
    var noise = (((r >>> 9) % 4) + 4) % 4 // 0..3
    while (noise > 1 && s.nonEmpty) {
      r = mix(r)
      val pos = (((r >>> 17) % s.length).toInt + s.length) % s.length
      if (!Character.isWhitespace(s.charAt(pos))) {
        val c = ('a' + (((r >>> 37) % 26).toInt + 26) % 26).toChar
        s = s.substring(0, pos) + c + s.substring(pos + 1)
      }
      noise -= 1
    }
    s
  }

  /** Spans of one document. Zipf-ish length: most docs are short, a few
    * are ~50x longer (the long-document skew case of the north rule). */
  def spansFor(docIdx: Long, seed: Long): Seq[Span] = {
    var r = mix(seed ^ docIdx)
    val mag = ((r >>> 48) & 0xff).toInt
    val nSpans =
      if (mag < 3) 150 + (mag * 50)      // ~1% mega-docs
      else 2 + (((r >>> 16) % 8).toInt)  // 2..9 spans
    (0 until nSpans).map { i =>
      r = mix(r)
      val isMedia = ((r >>> 7) % 5) == 0 // ~20%
      if (isMedia) {
        val kinds = Seq("image", "table", "formula")
        Span(kinds((((r >>> 21) % 3).toInt + 3) % 3), "",
          f"media://$docIdx%d/$i%d", i)
      } else {
        val gt = gtLines((((r >>> 11) % gtLines.length).toInt + gtLines.length) % gtLines.length)
        Span("text", perturb(gt, r), "", i)
      }
    }
  }

  def doc(docIdx: Long, seed: Long): Doc =
    Doc(f"doc-$docIdx%08d", spansFor(docIdx, seed))

  /** Vocabulary pool of the GT lines (whitespace tokens). */
  private lazy val vocab: IndexedSeq[String] =
    gtLines.flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct

  /** High-diversity line: 6-10 tokens sampled uniformly from the GT
    * vocabulary, ~40% of tokens carrying a random char substitution —
    * the window space is effectively unbounded, so per-window work is
    * cache-miss-dominated. This models the novel-vocabulary tail of a
    * 10^12-document corpus and is what the scaling bench runs on. */
  def diverseLine(seed: Long): String = {
    var r = mix(seed)
    val n = 6 + (((r >>> 23) % 5).toInt + 5) % 5
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      r = mix(r)
      var tok = vocab((((r >>> 11) % vocab.length).toInt + vocab.length) % vocab.length)
      if (((r >>> 5) % 5) < 2 && tok.length > 1) { // ~40%: 1 char substituted
        val pos = (((r >>> 29) % tok.length).toInt + tok.length) % tok.length
        val c = ('a' + (((r >>> 41) % 26).toInt + 26) % 26).toChar
        tok = tok.substring(0, pos) + c + tok.substring(pos + 1)
      }
      if (k > 0) sb.append(' ')
      sb.append(tok)
      k += 1
    }
    sb.result()
  }

  def diverseDoc(docIdx: Long, seed: Long): Doc = {
    var r = mix(seed ^ docIdx)
    val nSpans = 2 + (((r >>> 16) % 6).toInt + 6) % 6
    val spans = (0 until nSpans).map { i =>
      r = mix(r)
      Span("text", diverseLine(r), "", i)
    }
    Doc(f"doc-$docIdx%08d", spans)
  }

  def docsDiverse(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0L, nDocs, 1L, partitions).map(i => diverseDoc(i, seed))
  }

  /** Distributed generation: content depends only on (seed, doc index). */
  def docs(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0L, nDocs, 1L, partitions).map(i => doc(i, seed))
  }
}

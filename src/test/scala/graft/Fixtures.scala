package graft

/** Shared deterministic fixtures per FIXTURES.md §1-3 (verbatim README
  * worked examples of the reference, README.md:60-66,79-92). */
object Fixtures {
  /** (ocr, gt) training pairs — README.md:61-65. */
  val trainingPairs: Seq[(String, String)] = Seq(
    ("» Bergebt mir, daß ih niht weiß, wie",
      "»Vergebt mir, daß ich nicht weiß, wie"),
    ("aus dem (Geiſte aller Nationen Mahrunq",
      "aus dem Geiſte aller Nationen Nahrung"),
    ("Kannſt Du mir die re<hée Bahn niché zeigen ?",
      "Kannſt Du mir die rechte Bahn nicht zeigen?"),
    ("frag zu bringen. —", "trag zu bringen. —"),
    ("ſie ins irdij<he Leben hinein, Mit leichtem,",
      "ſie ins irdiſche Leben hinein. Mit leichtem,"))

  /** Keyed OCR lines — README.md:81-85. */
  val keyedOcr: Seq[(String, String)] = Seq(
    ("alexis_ruhe01_1852_0018_022", "ih denke. Aber was die ſelige Frau Geheimräth1n"),
    ("alexis_ruhe01_1852_0035_019", "„Das fann ich niht, c'esl absolument impos-"),
    ("alexis_ruhe01_1852_0087_027", "rend. In dem Augenbli> war 1hr niht wohl zu"),
    ("alexis_ruhe01_1852_0099_012", "ür die fle ſich ſchlugen.“"),
    ("alexis_ruhe01_1852_0147_009", "ſollte. Nur Über die Familien, wo man ſie einführen"))

  /** Wordlist per FIXTURES.md §3 — GT vocabulary + distractors, all
    * frequencies above the pruning rule. */
  val wordlist: Map[String, Long] = Map(
    "nicht" -> 500L, "ich" -> 800L, "denke" -> 40L, "rechte" -> 30L,
    "Nahrung" -> 25L, "Geiſte" -> 20L, "weiß" -> 35L, "wie" -> 90L,
    "mir" -> 60L, "daß" -> 120L, "aus" -> 70L, "dem" -> 110L,
    "aller" -> 45L, "Nationen" -> 15L, "Kannſt" -> 8L, "Du" -> 55L,
    "die" -> 200L, "Bahn" -> 12L, "zeigen" -> 18L, "trag" -> 6L,
    "zu" -> 150L, "bringen" -> 22L, "ſie" -> 95L, "ins" -> 28L,
    "irdiſche" -> 5L, "Leben" -> 33L, "hinein" -> 14L, "Mit" -> 48L,
    "leichtem" -> 7L, "wohl" -> 26L, "war" -> 85L, "Frau" -> 38L,
    "denken" -> 21L, "recht" -> 19L, "Über" -> 16L, "Familien" -> 9L,
    "man" -> 75L, "einführen" -> 4L, "ſollte" -> 11L, "Nur" -> 29L)
}

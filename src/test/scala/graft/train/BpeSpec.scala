package graft.train

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC").getOrCreate()

  test("applyMerge is left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), ("a", "a")) == Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "b", "a", "b"), ("a", "b")) == Vector("ab", "ab"))
    assert(Bpe.applyMerge(Vector("x"), ("a", "b")) == Vector("x"))
  }

  test("trainLocal on the classic low/lower/newest corpus picks frequency-ordered merges") {
    // Sennrich's worked example shape: 'lo' (freq 7) must merge before
    // anything appearing only in the 2 'lower' or 3 'newest' words.
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 3L)
    val merges = Bpe.trainLocal(wc, 3)
    assert(merges.head == ("l", "o")) // 7 occurrences, the top pair
    assert(merges(1) == ("lo", "w"))  // after merging, 'lo w' has 7 too
    // encode must reproduce training-time segmentation
    assert(Bpe.encode("low", merges).mkString(" ") == "low" ||
      Bpe.encode("low", merges).size < 3)
  }

  test("trainLocal stops when no pairs remain (all words single-symbol)") {
    val merges = Bpe.trainLocal(Map("ab" -> 1L), 10)
    assert(merges == Seq(("a", "b"))) // then 'ab' is one symbol; no pairs left
  }

  test("trainSpark == trainLocal on fixture docs (20 merges, incl. tie-breaks)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val local = {
      val wc = docs.select("text").as[String].collect()
        .flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      Bpe.trainLocal(wc, 20)
    }
    val dist = Bpe.trainSpark(spark, docs, "text", 20)
    assert(dist == local)
  }

  test("q_bpe_encode's pinned merge list IS trainLocal over the sf0.001 alpha vocab") {
    // provenance pin: the constant in Queries cannot drift from the
    // trainer — re-derive it from the same corpus + scope rule
    import spark.implicits._
    val wc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(Bpe.trainLocal(wc, 16) == graft.queries.Queries.BpeFixtureMerges)
  }

  test("encode cascades merges in training order (multi-char symbols, repeats)") {
    val merges = Seq("a" -> "a", "aa" -> "b", "c" -> "aab")
    // greedy left-to-right: aaab → [aa, a, b]; (aa,b) needs adjacency → no-op
    assert(Bpe.encode("aaab", merges) == Vector("aa", "a", "b"))
    // full cascade: caab → [c, aa, b] → [c, aab] → [caab]
    assert(Bpe.encode("caab", merges) == Vector("caab"))
  }
}

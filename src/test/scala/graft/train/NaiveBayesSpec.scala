package graft.train

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC").getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("trainWeights equals a local recompute (counts + smoothed llr)") {
    import spark.implicits._
    val d = docs(
      0L -> "shiny clean prose here",
      1L -> "spam spam buy now",
      2L -> "clean prose again clean",
      3L -> "buy spam now now")
    val w = NaiveBayes.trainWeights(d, $"doc_id" % 2 === 0)
      .orderBy($"term")
      .as[(String, Long, Long, Double)].collect()

    // local recompute
    val toks = Seq(
      (true, "shiny clean prose here"), (false, "spam spam buy now"),
      (true, "clean prose again clean"), (false, "buy spam now now"))
      .flatMap { case (g, t) => t.split(" ").filter(_.nonEmpty).map((g, _)) }
    val cnt = toks.groupBy(_._2).view.mapValues { xs =>
      (xs.count(_._1).toLong, xs.count(!_._1).toLong)
    }.toMap
    val tp = cnt.values.map(_._1).sum
    val tn = cnt.values.map(_._2).sum
    val v = cnt.size.toLong
    w.foreach { case (term, cp, cn, weight) =>
      val (ecp, ecn) = cnt(term)
      assert((cp, cn) == (ecp, ecn), term)
      val expW = BigDecimal(
        math.log((ecp + 1).toDouble / (tp + v)) -
        math.log((ecn + 1).toDouble / (tn + v)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(weight - expW) < 1e-9, term)
    }
    assert(w.map(_._1).toSet == cnt.keySet)
  }

  test("trained classifier separates a separable corpus (recovers labels)") {
    import spark.implicits._
    // positive docs speak 'clean prose', negatives 'spam buy' — with a
    // shared neutral token in every doc. NB must recover every label.
    val d = docs(
      0L -> "clean prose the",
      1L -> "spam buy the",
      2L -> "prose clean clean the",
      3L -> "buy spam spam the",
      4L -> "clean prose prose the",
      5L -> "spam buy buy the")
    val w = NaiveBayes.trainWeights(d, $"doc_id" % 2 === 0)
    val scored = NaiveBayes.score(d, w)
      .orderBy($"doc_id").as[(Long, Long, Boolean)].collect()
    scored.foreach { case (id, score, keep) =>
      assert(keep == (id % 2 == 0), s"doc $id score $score")
    }
  }

  test("score: OOV terms contribute 0; tokenless docs survive at score 0") {
    import spark.implicits._
    val train = docs(0L -> "alpha beta", 1L -> "gamma delta")
    val w = NaiveBayes.trainWeights(train, $"doc_id" % 2 === 0)
    val apply = docs(7L -> "unseen words only", 8L -> "")
    val scored = NaiveBayes.score(apply, w)
      .orderBy($"doc_id").as[(Long, Long, Boolean)].collect()
    assert(scored.toSeq == Seq((7L, 0L, false), (8L, 0L, false)))
  }

  test("fixed-point scoring equals local double-free recompute on fixture docs") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val w = NaiveBayes.trainWeights(d, $"doc_id" % 2 === 0)
    val wMap = w.as[(String, Long, Long, Double)].collect()
      .map { case (t, _, _, wt) => t -> math.round(wt * 1e6) }.toMap
    val expected = d.as[(Long, String)].collect().map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty)
        .map(t => wMap.getOrElse(t, 0L)).sum
    }.toMap
    val scored = NaiveBayes.score(d, w)
      .as[(Long, Long, Boolean)].collect()
    assert(scored.length == expected.size)
    scored.foreach { case (id, score, keep) =>
      assert(score == expected(id), s"doc $id")
      assert(keep == (score > 0))
    }
  }
}

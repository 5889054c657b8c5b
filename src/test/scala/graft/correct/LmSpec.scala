package graft.correct

import graft.Fixtures
import graft.pipeline.{Doc, Span}
import org.scalatest.funsuite.AnyFunSuite

class LmSpec extends AnyFunSuite {

  lazy val model: CompiledModel =
    CompiledModel.train(Fixtures.trainingPairs, Fixtures.wordlist)
  lazy val lm: CharNgramLm =
    CharNgramLm.train(Fixtures.trainingPairs.map(_._2), n = 4)

  test("char ngram LM scores seen text cheaper than unseen") {
    val (_, seen) = lm.advance(lm.initialState, "nicht")
    val (_, unseen) = lm.advance(lm.initialState, "zqxvw")
    assert(seen < unseen)
  }

  test("beam decode with lmWeight=0 agrees with the FST-only viterbi") {
    for (line <- Seq("ih niht weiß", "frag zu bringen. —", "zzqx zu")) {
      val lat = Corrector.latticeFromString(line, model)
      val vit = Corrector.viterbi(lat)
      val (lmOut, _) = LmDecoder.decode(lat, lm)(lm.initialState, lmWeight = 0.0)
      assert(lmOut == vit, s"line <$line>")
    }
  }

  test("beam clustering collapses near-identical histories (hand-computed)") {
    // LM trained on "ax c": continuing " c" is cheap after "x", dear
    // after "b". FST weights make "ab" the cheaper hypothesis AT the
    // intermediate node, but "ax c" the globally best path.
    val clm = CharNgramLm.train(Seq("ax c"), n = 2)
    val lat = Lattice(2, Map(
      (0, 1) -> Seq(Alt("ab", 0.0), Alt("ax", 0.9)),
      (1, 2) -> Seq(Alt("c", 0.0))))
    // hand-computed per-hypothesis costs (add-one smoothing, V=4):
    //   node 1: "ab" = 0.0 + [-ln(2/5) - ln(1/5)] = 2.525
    //           "ax" = 0.9 + [-ln(2/5) - ln(2/5)] = 1.833 + 0.9 = 2.733
    //   node 2: "ab c" = 2.525 + [-ln(1/4) - ln(2/5)] = 4.827
    //           "ax c" = 2.733 + [-ln(2/5) - ln(2/5)] = 4.566  <- best
    val (noCluster, _) =
      LmDecoder.decode(lat, clm)(clm.initialState, lmWeight = 1.0)
    assert(noCluster.contains("ax c"))
    // states "b" and "x" are edit-distance 1 apart: clustering at
    // dist 1 keeps only the node-1-cheaper "ab" history, CHANGING the
    // survivor set — the globally-best "ax c" path is pruned
    val (clustered, _) = LmDecoder.decode(lat, clm)(clm.initialState,
      lmWeight = 1.0, beamClusteringDist = 1.0)
    assert(clustered.contains("ab c"))
    // dist 0 disables clustering (BEAM_CLUSTERING_ENABLE=False path)
    val (disabled, _) = LmDecoder.decode(lat, clm)(clm.initialState,
      lmWeight = 1.0, beamClusteringDist = 0.0)
    assert(disabled == noCluster)
  }

  test("LM rescoring still corrects known confusions") {
    val (out, _) = LmDecoder.correctLineLm("ih niht weiß", model, lm)(
      lm.initialState, lmWeight = 0.5, beamWidth = 100)
    assert(out == "ich nicht weiß")
  }

  test("document fold threads LM state and passes media through") {
    val doc = Doc("d1", Seq(
      Span("text", "ih niht weiß", "", 0),
      Span("image", "", "media://1", 1),
      Span("text", "niht zu bringen", "", 2)))
    val out = LmDecoder.correctDocLm(doc, model, lm)
    assert(out.spans(1) == doc.spans(1))
    assert(out.spans(0).text == "ich nicht weiß")
    assert(out.spans(2).text.contains("nicht"))
    // deterministic
    assert(LmDecoder.correctDocLm(doc, model, lm) == out)
  }

  test("trainSpark equals driver-side train (counts, contexts, vocab)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._
    val lines = Fixtures.trainingPairs.map(_._2)
    val local = CharNgramLm.train(lines, n = 4)
    val dist = CharNgramLm.trainSpark(spark, lines.toDS().repartition(3), n = 4)
    assert(dist.counts == local.counts)
    assert(dist.contextCounts == local.contextCounts)
    assert(dist.vocabSize == local.vocabSize)
    // behavioral equality on a mixed seen/unseen string
    val (sa, ca) = local.advance(local.initialState, "nicht zqx weiß")
    val (sb, cb) = dist.advance(dist.initialState, "nicht zqx weiß")
    assert(sa == sb && math.abs(ca - cb) < 1e-12)
  }

  test("G10 context from identifier: decade parse per decode.py:254-262") {
    assert(LmDecoder.contextFromIdentifier("OCR-D-GT/grenzboten_1841") == Seq(185))
    assert(LmDecoder.contextFromIdentifier("grenzboten_1841/") == Seq(0)) // trailing sep: Python '' token
    assert(LmDecoder.contextFromIdentifier("1841_") == Seq(0))
    assert(LmDecoder.contextFromIdentifier("band_1900") == Seq(190))
    assert(LmDecoder.contextFromIdentifier("a/b/c_1905") == Seq(191)) // ceil
    assert(LmDecoder.contextFromIdentifier("no_year_here") == Seq(0))
    assert(LmDecoder.contextFromIdentifier("") == Seq(0))
    assert(LmDecoder.contextFromIdentifier(null) == Seq(0))
  }

  test("G10 contextual LM selection picks the decade model, falls back otherwise") {
    val decadeLm = CharNgramLm.train(Seq("ich nicht weiß"), n = 4)
    val byCtx = Map(185 -> (decadeLm: LmScorer))
    assert(LmDecoder.scorerFor(byCtx, lm, "x/doc_1843") eq decadeLm)
    assert(LmDecoder.scorerFor(byCtx, lm, "x/doc_1999") eq lm)
    assert(LmDecoder.scorerFor(byCtx, lm, "undatiert") eq lm)
    val doc = Doc("sammlung_1847", Seq(Span("text", "ih niht weiß", "", 0)))
    val out = LmDecoder.correctDocLmContextual(doc, model, byCtx, lm)
    assert(out.spans(0).text == "ich nicht weiß")
  }
}

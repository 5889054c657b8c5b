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
}

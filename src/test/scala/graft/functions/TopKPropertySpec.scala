package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants for the bounded top-k heap (pure JVM — the
  * Spark-side plan/merge behavior is covered in FunctionsSpec).
  * Deterministic sampling, same hand-rolled forAll as WfstPropertySpec
  * (the scalatestplus bridge is not in the offline cache). */
class TopKPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 120): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  val valuesGen: Gen[(List[Long], Int)] = for {
    n <- Gen.chooseNum(0, 200)
    vs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    k <- Gen.chooseNum(1, 25)
  } yield (vs, k)

  test("heap == sorted.take(k) for arbitrary inserts (dupes, extremes, under/over k)") {
    samples(valuesGen).foreach { case (vs, k) =>
      val h = new TopKMinLongs.Heap(k)
      vs.foreach(h.insert)
      assert(h.sortedAscending.toSeq == vs.sorted.take(k),
        s"k=$k values=$vs")
    }
  }

  test("merge of any split == single heap over the concatenation (partial-agg soundness)") {
    samples(valuesGen).foreach { case (vs, k) =>
      val cut = if (vs.isEmpty) 0 else math.abs(vs.head.toInt) % (vs.size + 1)
      val (l, r) = vs.splitAt(cut)
      val h1 = new TopKMinLongs.Heap(k); l.foreach(h1.insert)
      val h2 = new TopKMinLongs.Heap(k); r.foreach(h2.insert)
      var i = 0
      while (i < h2.size) { h1.insert(h2.slots(i)); i += 1 }
      val whole = new TopKMinLongs.Heap(k); vs.foreach(whole.insert)
      assert(h1.sortedAscending.toSeq == whole.sortedAscending.toSeq)
    }
  }

  test("insertion order never changes the result (commutativity)") {
    samples(valuesGen).foreach { case (vs, k) =>
      val a = new TopKMinLongs.Heap(k); vs.foreach(a.insert)
      val b = new TopKMinLongs.Heap(k); vs.reverse.foreach(b.insert)
      assert(a.sortedAscending.toSeq == b.sortedAscending.toSeq)
    }
  }
}

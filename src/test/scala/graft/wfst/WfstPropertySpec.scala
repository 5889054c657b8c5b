package graft.wfst

import graft.align.{Aligner, Distance}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2). Deterministic sampling
  * (fixed seeds) — the scalatestplus bridge is not in the offline cache,
  * so forAll is hand-rolled over ScalaCheck generators. */
class WfstPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 80): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7777L + i)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g).foreach(f)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => f(a, b) }

  val smallString: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  val weighted: Gen[(String, Double)] = for {
    s <- smallString
    w <- Gen.chooseNum(0.0, 5.0)
  } yield (s, math.rint(w * 16) / 16) // dyadic weights: exact addition

  val stringMapGen: Gen[Map[String, Double]] =
    Gen.mapOfN(4, weighted).map(m => if (m.isEmpty) Map("a" -> 1.0) else m)

  test("compose of two acceptors = weighted intersection of path sets") {
    forAll(stringMapGen, stringMapGen) { (m1, m2) =>
      val f1 = Wfst.fromStrings(m1)
      val f2 = Wfst.fromStrings(m2).arcSort
      val got = f1.compose(f2).paths().map(p => (p._2, p._3)).toMap
      val expected = for {
        (s, w1) <- m1
        w2 <- m2.get(s)
      } yield s -> (w1 + w2)
      assert(got.keySet == expected.keySet)
      expected.foreach { case (s, w) => assert(math.abs(got(s) - w) < 1e-9) }
    }
  }

  test("shortestPath = min over enumerated paths") {
    forAll(stringMapGen) { m =>
      val f = Wfst.fromStrings(m)
      val best = f.shortestPath.get._3
      assert(math.abs(best - m.values.min) < 1e-9)
    }
  }

  test("prune keeps exactly the paths <= best + threshold") {
    forAll(stringMapGen, Gen.chooseNum(0.0, 4.0)) { (m, th) =>
      val f = Wfst.fromStrings(m)
      val best = m.values.min
      val kept = f.prune(th).paths().map(p => (p._2, p._3)).toMap
      val expected = m.filter(_._2 <= best + th + 1e-9)
      assert(kept.keySet == expected.keySet)
    }
  }

  test("union/concat path algebra") {
    forAll(stringMapGen, stringMapGen) { (m1, m2) =>
      val u = Wfst.fromStrings(m1).union(Wfst.fromStrings(m2))
      val uPaths = u.distinctOutputs().toMap
      val expectedU = (m1.keySet ++ m2.keySet).map { s =>
        s -> math.min(m1.getOrElse(s, Double.PositiveInfinity),
          m2.getOrElse(s, Double.PositiveInfinity))
      }.toMap
      assert(uPaths.keySet == expectedU.keySet)
      expectedU.foreach { case (s, w) => assert(math.abs(uPaths(s) - w) < 1e-9) }

      val c = Wfst.fromStrings(m1).concat(Wfst.fromStrings(m2))
      val cBest = c.shortestPath.get._3
      assert(math.abs(cBest - (m1.values.min + m2.values.min)) < 1e-9)
    }
  }

  test("rmEpsilon preserves distinct-output path sets") {
    forAll(stringMapGen, stringMapGen) { (m1, m2) =>
      val f = Wfst.fromStrings(m1).concat(Wfst.fromStrings(m2))
      val a = f.distinctOutputs().toMap
      val b = f.rmEpsilon.distinctOutputs().toMap
      assert(a.keySet == b.keySet)
      a.foreach { case (s, w) => assert(math.abs(b(s) - w) < 1e-9) }
    }
  }

  val anyString: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ', 'ſ', 'ä')))

  test("fused composePruned == compose.projectOutput.prune (and the bounded form)") {
    forAll(stringMapGen, stringMapGen) { (m1, m2) =>
      val left = Wfst.fromStrings(m1)
      val right = Wfst.fromStrings(m2).arcSort
      for (th <- Seq(0.5, 2.0, 10.0)) {
        val unfused = left.compose(right, trim = false)
          .projectOutput.prune(th)
          .distinctOutputs().toSeq
        val fused = left.composePruned(right, th)
          .distinctOutputs().toSeq
        assert(fused == unfused, s"th=$th m1=$m1 m2=$m2")
        val unfusedB = left.composeBounded(right, 6.0, trim = false)
          .projectOutput.prune(th)
          .distinctOutputs().toSeq
        val fusedB = left.composeBoundedPruned(right, 6.0, th)
          .distinctOutputs().toSeq
        assert(fusedB == unfusedB, s"bounded th=$th m1=$m1 m2=$m2")
      }
    }
  }

  test("scratch isolation: 16 threads composing/pruning concurrently agree with serial") {
    // the hot path reuses ThreadLocal scratch buffers (Wfst.Scratch);
    // this hammers compose/prune/rmEpsilon from many threads at once and
    // asserts bit-identical results vs the serial run — any cross-call
    // aliasing of scratch into results, or stale-prefix reads, diverges
    val maps = samples(stringMapGen, 48)
    val rights = samples(stringMapGen, 48).map(m => Wfst.fromStrings(m).arcSort)
    def run(i: Int): Seq[(String, String, Double)] = {
      val f = Wfst.fromStrings(maps(i))
      f.compose(rights(i)).projectOutput.prune(2.0).rmEpsilon
        .paths().sortBy(p => (p._1, p._2, p._3))
    }
    val serial = (0 until 48).map(run)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (0 until 48).flatMap(i => (0 until 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[(Int, Seq[(String, String, Double)])] {
          def call() = (i, run(i))
        })
      })
      futures.foreach { fu =>
        val (i, got) = fu.get()
        assert(got == serial(i), s"case $i diverged under concurrency")
      }
    } finally pool.shutdown()
  }

  test("aligner: projections reproduce inputs; gap-free positions equal chars") {
    forAll(anyString, anyString) { (a, b) =>
      val al = Aligner.align(a, b)
      assert(al.map(_._1).filter(_ != Aligner.Gap).toSeq == Aligner.cps(a).toSeq)
      assert(al.map(_._2).filter(_ != Aligner.Gap).toSeq == Aligner.cps(b).toSeq)
      // no position aligns gap to gap
      assert(!al.exists(p => p._1 == Aligner.Gap && p._2 == Aligner.Gap))
    }
  }

  test("levenshtein: triangle vs aligner mismatch count upper bound") {
    forAll(anyString, anyString) { (a, b) =>
      val lev = Distance.levenshtein(a, b)
      val mismatches = Aligner.align(a, b).count(p => p._1 != p._2)
      // difflib's alignment is a valid (not necessarily optimal) edit
      // script, so its mismatch count bounds Levenshtein from above
      assert(lev <= mismatches)
      assert(lev >= math.abs(a.codePointCount(0, a.length) - b.codePointCount(0, b.length)))
    }
  }
}

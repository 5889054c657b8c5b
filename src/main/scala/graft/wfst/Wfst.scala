package graft.wfst

import scala.collection.mutable

/** Labels are Unicode code points. 0 = epsilon; -1 = SIGMA (identity
  * wildcard, matches any non-epsilon symbol — used only inside compiled
  * error models, cf. the universal acceptor over the merged symbol table
  * in the reference, lib/error_simp.py:264-271; we use a wildcard arc
  * instead of enumerating the alphabet, same semantics over any input).
  */
object Label {
  final val Eps = 0
  final val Sigma = -1
}

/** One transition: input label, output label, tropical weight, target. */
final case class Arc(ilabel: Int, olabel: Int, weight: Double, dst: Int)

/** Immutable weighted finite-state transducer over the tropical semiring
  * (plus = min, times = +), the semiring of the reference's OpenFst
  * models (weights are -ln(relative_frequency), lib/helper.py:135).
  *
  * This is a from-scratch pure-Scala library (no Spark deps) compiled on
  * the driver and broadcast to executors; per-line FST work happens
  * inside `mapPartitions` closures (SURVEY.md §1 row 1.7).
  */
final class Wfst(
    val start: Int,
    val finals: Map[Int, Double],
    val arcs: Array[Array[Arc]]
) extends Serializable {

  def numStates: Int = arcs.length
  def numArcs: Int = arcs.iterator.map(_.length).sum
  def isEmptyLanguage: Boolean = finals.isEmpty || numStates == 0

  // ---------------------------------------------------------------- rational ops

  /** Union (pynini `union`): new start with eps arcs to both operands. */
  def union(that: Wfst): Wfst = {
    val off1 = 1
    val off2 = 1 + this.numStates
    val n = 1 + this.numStates + that.numStates
    val out = Array.fill(n)(mutable.ArrayBuffer.empty[Arc])
    out(0) += Arc(Label.Eps, Label.Eps, 0.0, off1 + this.start)
    out(0) += Arc(Label.Eps, Label.Eps, 0.0, off2 + that.start)
    copyInto(this, off1, out); copyInto(that, off2, out)
    val fin = this.finals.map { case (s, w) => (s + off1, w) } ++
      that.finals.map { case (s, w) => (s + off2, w) }
    new Wfst(0, fin, out.map(_.toArray))
  }

  /** Concatenation: eps arcs from this's finals (carrying the final
    * weight) to that's start. */
  def concat(that: Wfst): Wfst = {
    val off = this.numStates
    val n = this.numStates + that.numStates
    val out = Array.fill(n)(mutable.ArrayBuffer.empty[Arc])
    copyInto(this, 0, out); copyInto(that, off, out)
    this.finals.foreach { case (s, w) =>
      out(s) += Arc(Label.Eps, Label.Eps, w, off + that.start)
    }
    val fin = that.finals.map { case (s, w) => (s + off, w) }
    new Wfst(this.start, fin, out.map(_.toArray))
  }

  /** 0-or-1 repetition (pynini `.ques`, lib/lexicon.py:179-184). */
  def ques: Wfst = Wfst.epsilonFst.union(this)

  /** Bounded closure accepting `lo` to `hi` repetitions (pynini
    * `closure(lo, hi)`, lib/latticegen.py:137, lib/error_simp.py:298). */
  def closure(lo: Int, hi: Int): Wfst = {
    require(hi >= lo && lo >= 0, s"bad closure bounds ($lo,$hi)")
    var r: Wfst = Wfst.epsilonFst
    var i = 0
    while (i < lo) { r = r.concat(this); i += 1 }
    while (i < hi) { r = r.concat(this.ques); i += 1 }
    r
  }

  /** Copy output labels onto the input tape (pynini
    * `project(project_output=True)`, lib/latticegen.py:49). */
  def projectOutput: Wfst =
    new Wfst(start, finals,
      arcs.map(_.map(a => Arc(a.olabel, a.olabel, a.weight, a.dst))))

  /** Swap tapes (pynini `invert`, lib/error_st.py:276). */
  def invert: Wfst =
    new Wfst(start, finals,
      arcs.map(_.map(a => Arc(a.olabel, a.ilabel, a.weight, a.dst))))

  // ---------------------------------------------------------------- cleanup ops

  /** Remove eps:eps arcs by tropical eps-closure (part of pynini
    * `optimize()`; det/min are perf-only — SURVEY.md §4). Arcs with eps
    * on only one tape are preserved (they transduce). */
  def rmEpsilon: Wfst = {
    if (numStates == 0) return this
    // fast path: nothing to remove
    if (!arcs.exists(_.exists(a =>
      a.ilabel == Label.Eps && a.olabel == Label.Eps))) return this
    val n = numStates
    // per-state eps-closure shortest distances (Dijkstra, weights >= 0)
    val out = Array.fill(n)(mutable.ArrayBuffer.empty[Arc])
    val fin = mutable.HashMap.empty[Int, Double]
    finals.foreach { case (s, w) => fin(s) = w }
    var s = 0
    while (s < n) {
      val dist = mutable.HashMap.empty[Int, Double]
      val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      dist(s) = 0.0; pq.enqueue((0.0, s))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u) + 1e-15) {
          for (a <- arcs(u)) {
            if (a.ilabel == Label.Eps && a.olabel == Label.Eps) {
              val nd = d + a.weight
              if (nd < dist.getOrElse(a.dst, Double.PositiveInfinity) - 1e-15) {
                dist(a.dst) = nd; pq.enqueue((nd, a.dst))
              }
            }
          }
        }
      }
      dist.foreach { case (t, d) =>
        for (a <- arcs(t)) {
          if (!(a.ilabel == Label.Eps && a.olabel == Label.Eps))
            out(s) += Arc(a.ilabel, a.olabel, d + a.weight, a.dst)
        }
        finals.get(t).foreach { wf =>
          val cand = d + wf
          if (cand < fin.getOrElse(s, Double.PositiveInfinity)) fin(s) = cand
        }
      }
      s += 1
    }
    new Wfst(start, fin.toMap, out.map(_.toArray)).connect
  }

  /** Trim states not reachable from start or not co-reachable to a final
    * (pynini `connect`). Renumbers states. */
  def connect: Wfst = {
    if (numStates == 0) return this
    val n = numStates
    // forward reachability (array stack, no boxing)
    val fwd = new Array[Boolean](n)
    val stack = new Array[Int](n)
    var sp = 0
    fwd(start) = true; stack(sp) = start; sp += 1
    while (sp > 0) {
      sp -= 1; val u = stack(sp)
      val as = arcs(u)
      var i = 0
      while (i < as.length) {
        val d = as(i).dst
        if (!fwd(d)) { fwd(d) = true; stack(sp) = d; sp += 1 }
        i += 1
      }
    }
    // backward reachability over a CSR-style reverse adjacency
    val revCnt = new Array[Int](n)
    var u = 0
    while (u < n) {
      val as = arcs(u); var i = 0
      while (i < as.length) { revCnt(as(i).dst) += 1; i += 1 }
      u += 1
    }
    val revOff = new Array[Int](n + 1)
    u = 0
    while (u < n) { revOff(u + 1) = revOff(u) + revCnt(u); u += 1 }
    val revSrc = new Array[Int](revOff(n))
    val fill = revOff.clone()
    u = 0
    while (u < n) {
      val as = arcs(u); var i = 0
      while (i < as.length) {
        val d = as(i).dst; revSrc(fill(d)) = u; fill(d) += 1; i += 1
      }
      u += 1
    }
    val bwd = new Array[Boolean](n)
    sp = 0
    finals.keysIterator.foreach { f =>
      if (fwd(f) && !bwd(f)) { bwd(f) = true; stack(sp) = f; sp += 1 }
    }
    while (sp > 0) {
      sp -= 1; val v = stack(sp)
      var i = revOff(v)
      while (i < revOff(v + 1)) {
        val p = revSrc(i)
        if (!bwd(p)) { bwd(p) = true; stack(sp) = p; sp += 1 }
        i += 1
      }
    }
    if (!(fwd(start) && bwd(start))) return Wfst.emptyFst
    val remap = new Array[Int](n)
    var kept = 0
    u = 0
    while (u < n) {
      if (fwd(u) && bwd(u)) { remap(u) = kept; kept += 1 } else remap(u) = -1
      u += 1
    }
    if (kept == n) return this // already trim
    val out = new Array[Array[Arc]](kept)
    u = 0
    while (u < n) {
      if (remap(u) >= 0) {
        val as = arcs(u)
        val buf = new mutable.ArrayBuffer[Arc](as.length)
        var i = 0
        while (i < as.length) {
          val a = as(i)
          if (remap(a.dst) >= 0)
            buf += Arc(a.ilabel, a.olabel, a.weight, remap(a.dst))
          i += 1
        }
        out(remap(u)) = buf.toArray
      }
      u += 1
    }
    val fin = finals.collect { case (s, w) if remap(s) >= 0 => (remap(s), w) }
    new Wfst(remap(start), fin, out)
  }

  /** Topological order if acyclic (Kahn), else None. The per-window
    * machines of the correction cascade are all DAGs — distance
    * computations use linear DP there and fall back to Dijkstra on
    * cyclic machines (e.g. compiled error models with sigma loops). */
  def topoOrder: Option[Array[Int]] = {
    val n = numStates
    val indeg = new Array[Int](n)
    var u = 0
    while (u < n) { for (a <- arcs(u)) indeg(a.dst) += 1; u += 1 }
    val order = new Array[Int](n)
    var head = 0; var tail = 0
    u = 0
    while (u < n) { if (indeg(u) == 0) { order(tail) = u; tail += 1 }; u += 1 }
    while (head < tail) {
      val v = order(head); head += 1
      for (a <- arcs(v)) {
        indeg(a.dst) -= 1
        if (indeg(a.dst) == 0) { order(tail) = a.dst; tail += 1 }
      }
    }
    if (tail == n) Some(order) else None
  }

  /** Shortest distance from start to every state (tropical; topo DP on
    * DAGs, Dijkstra otherwise — all weights are -ln(p) >= 0 here). */
  def shortestDistances: Array[Double] = shortestDistances(topoOrder)

  private def shortestDistances(topo: Option[Array[Int]]): Array[Double] = {
    val dist = Array.fill(numStates)(Double.PositiveInfinity)
    if (numStates == 0) return dist
    dist(start) = 0.0
    topo match {
      case Some(order) =>
        var i = 0
        while (i < order.length) {
          val u = order(i)
          val d = dist(u)
          if (!d.isInfinity) {
            for (a <- arcs(u)) {
              val nd = d + a.weight
              if (nd < dist(a.dst)) dist(a.dst) = nd
            }
          }
          i += 1
        }
      case None =>
        val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
        pq.enqueue((0.0, start))
        while (pq.nonEmpty) {
          val (d, u) = pq.dequeue()
          if (d <= dist(u) + 1e-15) {
            for (a <- arcs(u)) {
              val nd = d + a.weight
              if (nd < dist(a.dst) - 1e-15) { dist(a.dst) = nd; pq.enqueue((nd, a.dst)) }
            }
          }
        }
    }
    dist
  }

  /** Shortest distance from every state to a final (incl. final weight). */
  def reverseDistances: Array[Double] = reverseDistances(topoOrder)

  private def reverseDistances(topo: Option[Array[Int]]): Array[Double] = {
    val n = numStates
    val dist = Array.fill(n)(Double.PositiveInfinity)
    if (n == 0) return dist
    finals.foreach { case (s, w) => dist(s) = w }
    topo match {
      case Some(order) =>
        var i = order.length - 1
        while (i >= 0) {
          val u = order(i)
          for (a <- arcs(u)) {
            val nd = a.weight + dist(a.dst)
            if (nd < dist(u)) dist(u) = nd
          }
          i -= 1
        }
      case None =>
        val rev = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, Double)])
        var u = 0
        while (u < n) { for (a <- arcs(u)) rev(a.dst) += ((u, a.weight)); u += 1 }
        val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
        finals.foreach { case (s, w) => pq.enqueue((w, s)) }
        while (pq.nonEmpty) {
          val (d, v) = pq.dequeue()
          if (d <= dist(v) + 1e-15) {
            for ((p, w) <- rev(v)) {
              val nd = d + w
              if (nd < dist(p) - 1e-15) { dist(p) = nd; pq.enqueue((nd, p)) }
            }
          }
        }
    }
    dist
  }

  /** Beam prune (OpenFst/pynini `prune(weight=th)`, lib/latticegen.py:50):
    * keep only states/arcs on some accepting path of weight <= best + th.
    */
  def prune(th: Double): Wfst = {
    if (numStates == 0) return this
    val topo = topoOrder
    val fwd = shortestDistances(topo)
    val bwd = reverseDistances(topo)
    val best = bwd(start) // = min over finals of fwd + final weight
    if (best.isInfinity) return Wfst.emptyFst
    val lim = best + th + 1e-9
    val out = arcs.zipWithIndex.map { case (as, s) =>
      if (fwd(s) + bwd(s) > lim) Array.empty[Arc]
      else as.filter(a => fwd(s) + a.weight + bwd(a.dst) <= lim)
    }
    val fin = finals.filter { case (s, w) => fwd(s) + w <= lim }
    new Wfst(start, fin, out).connect
  }

  // ---------------------------------------------------------------- compose

  /** Presort arcs by ilabel (pynini `arcsort`, lib/latticegen.py:205) so
    * compose can range-scan matches. Sigma (-1) sorts first. */
  def arcSort: Wfst = {
    val out = arcs.map { as =>
      val c = as.clone(); java.util.Arrays.sort(c, Ordering.by[Arc, Int](_.ilabel)); c
    }
    new Wfst(start, finals, out)
  }

  /** Composition with the trivial epsilon filter: joint moves on equal
    * non-eps symbols (Sigma on the right matches any symbol, identity),
    * left-alone moves on eps-output arcs, right-alone moves on eps-input
    * arcs. Duplicate-free as long as at most one side carries eps on the
    * shared tape — true everywhere in this pipeline (left inputs are
    * rmEpsilon'd first, cf. SURVEY.md §2 row B5). `that` must be arcSort'd.
    */
  def compose(that: Wfst): Wfst = {
    if (this.numStates == 0 || that.numStates == 0) return Wfst.emptyFst
    val stateIds = new LongIntMap(64)
    val statePairs = mutable.ArrayBuffer.empty[Long]
    val out = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Arc]]
    def id(p: Int, q: Int): Int = {
      val k = p.toLong << 32 | (q.toLong & 0xffffffffL)
      val existing = stateIds.getOrElse(k, -1)
      if (existing >= 0) existing
      else {
        statePairs += k; out += new mutable.ArrayBuffer[Arc](4)
        val nid = statePairs.length - 1
        stateIds.put(k, nid)
        nid
      }
    }
    val s0 = id(this.start, that.start)
    var head = 0
    while (head < statePairs.length) {
      val k = statePairs(head)
      val p = (k >> 32).toInt; val q = k.toInt
      val buf = out(head)
      val bArcs = that.arcs(q)
      // right-alone: eps-input arcs of `that` (and collect sigma arcs)
      var sigmaEnd = 0
      var bi = 0
      while (bi < bArcs.length && bArcs(bi).ilabel < Label.Eps) { sigmaEnd = bi + 1; bi += 1 }
      var be = sigmaEnd
      while (be < bArcs.length && bArcs(be).ilabel == Label.Eps) {
        val b = bArcs(be)
        buf += Arc(Label.Eps, b.olabel, b.weight, id(p, b.dst))
        be += 1
      }
      for (a <- this.arcs(p)) {
        if (a.olabel == Label.Eps) {
          // left-alone move
          buf += Arc(a.ilabel, Label.Eps, a.weight, id(a.dst, q))
        } else {
          // binary search the sorted block of matching ilabels
          var lo = be; var hi = bArcs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (bArcs(mid).ilabel < a.olabel) lo = mid + 1 else hi = mid
          }
          var j = lo
          while (j < bArcs.length && bArcs(j).ilabel == a.olabel) {
            val b = bArcs(j)
            buf += Arc(a.ilabel, b.olabel, a.weight + b.weight, id(a.dst, b.dst))
            j += 1
          }
          // sigma arcs match any non-eps symbol as identity
          var si = 0
          while (si < sigmaEnd) {
            val b = bArcs(si)
            val ol = if (b.olabel == Label.Sigma) a.olabel else b.olabel
            buf += Arc(a.ilabel, ol, a.weight + b.weight, id(a.dst, b.dst))
            si += 1
          }
        }
      }
      head += 1
    }
    val fin = mutable.HashMap.empty[Int, Double]
    var i = 0
    while (i < statePairs.length) {
      val k = statePairs(i)
      val p = (k >> 32).toInt; val q = k.toInt
      (this.finals.get(p), that.finals.get(q)) match {
        case (Some(w1), Some(w2)) => fin(i) = w1 + w2
        case _                    =>
      }
      i += 1
    }
    new Wfst(s0, fin.toMap, out.map(_.toArray).toArray).connect
  }

  // ---------------------------------------------------------------- decoding

  /** Single shortest path, tropical Viterbi (pynini `shortestpath`,
    * lib/latticegen.py:142-147). Returns (input, output, weight) of the
    * best accepting path, or None if the language is empty. */
  def shortestPath: Option[(String, String, Double)] = {
    if (numStates == 0 || finals.isEmpty) return None
    val dist = Array.fill(numStates)(Double.PositiveInfinity)
    val fromState = Array.fill(numStates)(-1)
    val fromArc = Array.fill(numStates)(null: Arc)
    dist(start) = 0.0
    val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
    pq.enqueue((0.0, start))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d <= dist(u) + 1e-15) {
        for (a <- arcs(u)) {
          val nd = d + a.weight
          if (nd < dist(a.dst) - 1e-15) {
            dist(a.dst) = nd; fromState(a.dst) = u; fromArc(a.dst) = a
            pq.enqueue((nd, a.dst))
          }
        }
      }
    }
    val bestFinal = finals.iterator
      .map { case (s, w) => (s, dist(s) + w) }
      .filter(!_._2.isInfinity)
      .minByOption(_._2)
    bestFinal.map { case (fs, total) =>
      var rev = List.empty[Arc]
      var cur = fs
      while (cur != start) {
        rev ::= fromArc(cur)
        cur = fromState(cur)
      }
      val in = new StringBuilder; val outb = new StringBuilder
      rev.foreach { arc =>
        if (arc.ilabel > 0) in.appendAll(Character.toChars(arc.ilabel))
        if (arc.olabel > 0) outb.appendAll(Character.toChars(arc.olabel))
      }
      (in.result(), outb.result(), total)
    }
  }

  /** Enumerate all accepting paths (pynini `paths()`, used on pruned
    * acyclic window FSTs, lib/latticegen.py:150-181). Requires an acyclic
    * machine; guarded by a path budget. */
  def paths(maxPaths: Int = 100000): Seq[(String, String, Double)] = {
    if (numStates == 0 || finals.isEmpty) return Seq.empty
    val acc = mutable.ArrayBuffer.empty[(String, String, Double)]
    val inb = new mutable.ArrayBuffer[Int]; val outb = new mutable.ArrayBuffer[Int]
    val onStack = new Array[Boolean](numStates)
    def dfs(s: Int, w: Double): Unit = {
      if (acc.length >= maxPaths)
        throw new IllegalStateException(s"paths() budget exceeded ($maxPaths)")
      if (onStack(s))
        throw new IllegalStateException("paths() on a cyclic FST")
      finals.get(s).foreach { wf =>
        acc += ((cps(inb), cps(outb), w + wf))
      }
      onStack(s) = true
      for (a <- arcs(s)) {
        if (a.ilabel > 0) inb += a.ilabel
        if (a.olabel > 0) outb += a.olabel
        dfs(a.dst, w + a.weight)
        if (a.ilabel > 0) inb.remove(inb.length - 1)
        if (a.olabel > 0) outb.remove(outb.length - 1)
      }
      onStack(s) = false
    }
    dfs(start, 0.0)
    acc.toSeq
  }

  /** Hypothesis set with determinization semantics: distinct output
    * strings, each with its min path weight (what pynini's
    * `optimize()`-then-`paths()` yields on the output projection —
    * SURVEY.md §2 row B9). Sorted by (weight, string). */
  def distinctOutputs(maxPaths: Int = 100000): Seq[(String, Double)] = {
    val m = mutable.HashMap.empty[String, Double]
    paths(maxPaths).foreach { case (_, o, w) =>
      if (w < m.getOrElse(o, Double.PositiveInfinity)) m(o) = w
    }
    m.toSeq.sortBy { case (s, w) => (w, s) }
  }

  private def cps(b: mutable.ArrayBuffer[Int]): String = {
    val sb = new StringBuilder
    b.foreach(cp => sb.appendAll(Character.toChars(cp)))
    sb.result()
  }

  private def copyInto(src: Wfst, off: Int,
      out: Array[mutable.ArrayBuffer[Arc]]): Unit = {
    var s = 0
    while (s < src.numStates) {
      for (a <- src.arcs(s))
        out(s + off) += Arc(a.ilabel, a.olabel, a.weight, a.dst + off)
      s += 1
    }
  }
}

object Wfst {
  /** The empty-language machine. */
  val emptyFst: Wfst = new Wfst(0, Map.empty, Array(Array.empty[Arc]))

  /** Accepts only the empty string with weight 0. */
  def epsilonFst: Wfst = new Wfst(0, Map(0 -> 0.0), Array(Array.empty[Arc]))

  /** Linear-chain identity acceptor of `s` with final weight `w`
    * (pynini `acceptor`, lib/latticegen.py:29-35). */
  def acceptor(s: String, w: Double = 0.0): Wfst = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val arcs = Array.tabulate(n + 1) { i =>
      if (i < n) Array(Arc(cps(i), cps(i), 0.0, i + 1)) else Array.empty[Arc]
    }
    new Wfst(0, Map(n -> w), arcs)
  }

  /** Weighted union of identity acceptors, trie-shared (pynini
    * `string_map` over a {string: weight} dict — transducer_from_dict,
    * lib/helper.py:139-148). */
  def fromStrings(items: Iterable[(String, Double)]): Wfst = {
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val fin = mutable.HashMap.empty[Int, Double]
    for ((s, w) <- items) {
      var cur = 0
      s.codePoints().forEach { cp =>
        cur = children(cur).getOrElseUpdate(cp, {
          children += mutable.HashMap.empty[Int, Int]
          children.length - 1
        })
      }
      if (w < fin.getOrElse(cur, Double.PositiveInfinity)) fin(cur) = w
    }
    val arcs = children.map { m =>
      m.iterator.map { case (cp, dst) => Arc(cp, cp, 0.0, dst) }
        .toArray.sortBy(_.ilabel)
    }.toArray
    new Wfst(0, fin.toMap, arcs)
  }

  /** Weighted union of string-pair transducers (pynini `string_map` over
    * (input, output, weight) triples — transducer_from_list,
    * lib/error_simp.py:183-202). Shorter side padded with eps. */
  def fromMappings(items: Iterable[(String, String, Double)]): Wfst = {
    val states = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Arc])
    val fin = mutable.HashMap.empty[Int, Double]
    for ((is, os, w) <- items) {
      val icps = is.codePoints().toArray
      val ocps = os.codePoints().toArray
      val len = math.max(icps.length, ocps.length)
      var cur = 0
      var k = 0
      while (k < len) {
        val il = if (k < icps.length) icps(k) else Label.Eps
        val ol = if (k < ocps.length) ocps(k) else Label.Eps
        states += mutable.ArrayBuffer.empty[Arc]
        val nxt = states.length - 1
        states(cur) += Arc(il, ol, 0.0, nxt)
        cur = nxt
        k += 1
      }
      if (w < fin.getOrElse(cur, Double.PositiveInfinity)) fin(cur) = w
    }
    new Wfst(0, fin.toMap, states.map(_.toArray).toArray)
  }

  /** Sigma-star: accepts any string with weight 0 (the universal acceptor
    * of combine_error_transducers, lib/error_simp.py:264-271, realized as
    * one wildcard self-loop instead of per-symbol loops). */
  def sigmaStar: Wfst =
    new Wfst(0, Map(0 -> 0.0),
      Array(Array(Arc(Label.Sigma, Label.Sigma, 0.0, 0))))
}

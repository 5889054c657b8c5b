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

/** One transition (object view; the machine stores arcs in CSR primitive
  * arrays — this class exists for construction and tests). */
final case class Arc(ilabel: Int, olabel: Int, weight: Double, dst: Int)

/** Per-thread reusable buffers for the compose/prune/connect hot path.
  * The correction cascade runs millions of windows per task and the
  * miss path was measured allocation-bound at >8 threads (GC + memory
  * bandwidth shared across the whole JVM): fresh hash maps, queues, CSR
  * temporaries and distance arrays per window were the dominant traffic.
  * One Scratch per thread (ThreadLocal in `Wfst`), growable, never
  * shrunk; returned machines NEVER alias scratch — final CSR arrays are
  * always freshly sized exact copies. */
private[wfst] final class Scratch {
  val map = new LongIntMap(1 << 12)
  val sink = new ArcSink(1 << 12)
  // product-state-indexed (compose/composeBounded)
  var pairA = new Array[Int](1 << 10)
  var pairB = new Array[Int](1 << 10)
  var dist = new Array[Double](1 << 10)
  var rangeStart = new Array[Int](1 << 10)
  var rangeLen = new Array[Int](1 << 10)
  var flags = new Array[Boolean](1 << 10) // SPFA in-queue (false at state creation)
  var queue = new Array[Int](1 << 11)
  // reachability / trim / prune temporaries
  var mark = new Array[Boolean](1 << 10)
  var stack = new Array[Int](1 << 10)
  var indeg = new Array[Int](1 << 10)
  var order = new Array[Int](1 << 10)
  var revOff = new Array[Int](1 << 10)
  var revSrc = new Array[Int](1 << 12)
  var revW = new Array[Double](1 << 12) // reverse-arc weights (fused prune)
  var remap = new Array[Int](1 << 10)
  var fwd = new Array[Double](1 << 10)
  var bwd = new Array[Double](1 << 10)
  // rmEpsilon closure FIFO (SPFA relaxation; scala PriorityQueue was
  // tried first — it routes every enqueue through Seq+addAll+iterator
  // and boxes tuples — then a primitive heap, but closures are tiny
  // glue chains and plain FIFO relaxation beat both)
  var heapS = new Array[Int](256)
  // dense product-state id table (compose fast path when
  // leftN * rightN <= Scratch.DenseMax): one array read replaces the
  // hash probe chain (JFR: LongIntMap.idx was 13.5% of flagship
  // self-time — three dependent cache misses per lookup). Stamp array
  // gives O(1) clear, same trick as LongIntMap's epoch.
  var denseId = new Array[Int](0)
  var denseStamp = new Array[Int](0)
  var denseEpoch = 0
  def ensureDense(n: Int): Unit = {
    if (n > denseId.length) {
      denseId = new Array[Int](n)
      denseStamp = new Array[Int](n)
      denseEpoch = 0
    }
    if (denseEpoch == Int.MaxValue) {
      java.util.Arrays.fill(denseStamp, 0)
      denseEpoch = 0
    }
    denseEpoch += 1
  }

  def growStates(n: Int): Unit = if (n > pairA.length) {
    val c = math.max(pairA.length << 1, n)
    pairA = java.util.Arrays.copyOf(pairA, c)
    pairB = java.util.Arrays.copyOf(pairB, c)
    dist = java.util.Arrays.copyOf(dist, c)
    rangeStart = java.util.Arrays.copyOf(rangeStart, c)
    rangeLen = java.util.Arrays.copyOf(rangeLen, c)
    flags = java.util.Arrays.copyOf(flags, c)
  }
}

private[wfst] object Scratch {
  /** Max product-space size for the dense compose id table: 1M entries
    * = 8 MB of per-thread scratch worst-case (grown lazily to the max
    * actually used — the cascade's error-model step needs ~20k). Above
    * this the hash map takes over (the lexicon windowFst compose). */
  val DenseMax = 1 << 20

  def ensureInt(a: Array[Int], n: Int): Array[Int] =
    if (a.length >= n) a else new Array[Int](math.max(a.length << 1, n))
  def ensureBool(a: Array[Boolean], n: Int): Array[Boolean] =
    if (a.length >= n) a else new Array[Boolean](math.max(a.length << 1, n))
  def ensureDouble(a: Array[Double], n: Int): Array[Double] =
    if (a.length >= n) a else new Array[Double](math.max(a.length << 1, n))
}

/** Growable primitive arc store used by all builders. */
private[wfst] final class ArcSink(cap0: Int = 64) {
  var il = new Array[Int](cap0)
  var ol = new Array[Int](cap0)
  var wt = new Array[Double](cap0)
  var ds = new Array[Int](cap0)
  var n = 0
  def add(i: Int, o: Int, w: Double, d: Int): Unit = {
    if (n == il.length) {
      val c = n << 1
      il = java.util.Arrays.copyOf(il, c); ol = java.util.Arrays.copyOf(ol, c)
      wt = java.util.Arrays.copyOf(wt, c); ds = java.util.Arrays.copyOf(ds, c)
    }
    il(n) = i; ol(n) = o; wt(n) = w; ds(n) = d; n += 1
  }
}

/** Immutable weighted finite-state transducer over the tropical semiring
  * (plus = min, times = +), the semiring of the reference's OpenFst
  * models (weights are -ln(relative_frequency), lib/helper.py:135).
  *
  * Storage is CSR (compressed sparse row): per-state arc ranges
  * [off(s), off(s+1)) over four parallel primitive arrays. This keeps the
  * per-window cascade cache-friendly and allocation-light — the engine
  * runs 32+ threads per executor and the pointer-chasing object layout
  * was measured to halve per-thread throughput beyond 8 threads.
  *
  * From-scratch pure-Scala library (no Spark deps) compiled on the
  * driver and broadcast; per-line work happens inside `mapPartitions`
  * closures (SURVEY.md §1 row 1.7).
  */
@SerialVersionUID(1L) // pinned: ModelIO artifacts must survive method additions
final class Wfst private (
    val start: Int,
    val numStates: Int,
    val off: Array[Int],      // length numStates+1
    val il: Array[Int],
    val ol: Array[Int],
    val wt: Array[Double],
    val ds: Array[Int],
    val finState: Array[Int], // ascending
    val finWt: Array[Double]
) extends Serializable {

  def numArcs: Int = off(numStates)
  def isEmptyLanguage: Boolean = finState.isEmpty || numStates == 0

  def finalWeight(s: Int): Double = {
    val i = java.util.Arrays.binarySearch(finState, s)
    if (i >= 0) finWt(i) else Double.PositiveInfinity
  }
  def isFinal(s: Int): Boolean =
    java.util.Arrays.binarySearch(finState, s) >= 0

  /** Dense final-weight table (+inf = non-final), built lazily once per
    * machine instance (once per executor for broadcast models) — turns
    * the per-product-state finalWeight binarySearch in the compose hot
    * path into an array read. The build race is idempotent, but the
    * publication must be SAFE: a plain var would let another executor
    * thread observe the array reference before its element stores on
    * weakly-ordered CPUs (ARM), reading 0.0 "final weights" for
    * arbitrary states. @volatile orders the fill before the reference
    * store (one volatile read per call — in the noise vs the array
    * reads it replaces). */
  @transient @volatile private var finDense0: Array[Double] = _
  private[wfst] def finalWeightDense: Array[Double] = {
    var d = finDense0
    if (d == null) {
      d = new Array[Double](math.max(numStates, 1))
      java.util.Arrays.fill(d, Double.PositiveInfinity)
      var i = 0
      while (i < finState.length) { d(finState(i)) = finWt(i); i += 1 }
      finDense0 = d
    }
    d
  }

  /** Compatibility views (tests, debugging; not on the hot path). */
  def finals: Map[Int, Double] =
    finState.indices.map(i => finState(i) -> finWt(i)).toMap
  def arcs: Array[Array[Arc]] =
    Array.tabulate(numStates) { s =>
      (off(s) until off(s + 1)).map(a => Arc(il(a), ol(a), wt(a), ds(a))).toArray
    }

  // ---------------------------------------------------------------- rational ops

  /** Union (pynini `union`): new start with eps arcs to both operands. */
  def union(that: Wfst): Wfst = {
    val b = new WfstBuilder(1 + this.numStates + that.numStates)
    b.addArc(0, Label.Eps, Label.Eps, 0.0, 1 + this.start)
    b.addArc(0, Label.Eps, Label.Eps, 0.0, 1 + this.numStates + that.start)
    b.copyMachine(this, 1)
    b.copyMachine(that, 1 + this.numStates)
    var i = 0
    while (i < this.finState.length) {
      b.setFinal(this.finState(i) + 1, this.finWt(i)); i += 1
    }
    i = 0
    while (i < that.finState.length) {
      b.setFinal(that.finState(i) + 1 + this.numStates, that.finWt(i)); i += 1
    }
    b.result(0)
  }

  /** Concatenation: eps arcs from this's finals (carrying the final
    * weight) to that's start. */
  def concat(that: Wfst): Wfst = {
    val o = this.numStates
    val b = new WfstBuilder(o + that.numStates)
    b.copyMachine(this, 0)
    b.copyMachine(that, o)
    var i = 0
    while (i < this.finState.length) {
      b.addArc(this.finState(i), Label.Eps, Label.Eps, this.finWt(i), o + that.start)
      i += 1
    }
    i = 0
    while (i < that.finState.length) {
      b.setFinal(that.finState(i) + o, that.finWt(i)); i += 1
    }
    b.result(this.start)
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
    new Wfst(start, numStates, off, ol, ol, wt, ds, finState, finWt)

  /** Swap tapes (pynini `invert`, lib/error_st.py:276). */
  def invert: Wfst =
    new Wfst(start, numStates, off, ol, il, wt, ds, finState, finWt)

  // ---------------------------------------------------------------- cleanup ops

  /** Remove eps:eps arcs by tropical eps-closure (part of pynini
    * `optimize()`; det/min are perf-only — SURVEY.md §4). Arcs with eps
    * on only one tape are preserved (they transduce). */
  def rmEpsilon: Wfst = rmEpsilon(trim = true)

  /** `trim = false` skips the final connect: inside the per-window
    * cascade the result feeds a compose or a path enumeration, both of
    * which explore only from the start state, so the eps-bypassed
    * (now unreachable) states are never visited and the trim is pure
    * overhead; public callers keep the trimmed default. */
  def rmEpsilon(trim: Boolean): Wfst = {
    if (numStates == 0) return this
    val n = numStates
    // states with eps:eps out-arcs
    var anyEps = false
    var a = 0
    val total = numArcs
    while (a < total && !anyEps) {
      if (il(a) == Label.Eps && ol(a) == Label.Eps) anyEps = true
      a += 1
    }
    if (!anyEps) return this
    val sc = Wfst.scratch.get()
    val b = new WfstBuilder(n)
    val finW = finalWeightDense
    // scratch: dist/seen are stamp-guarded (fwd/indeg are free here;
    // connect at the end uses indeg only after the loop is done)
    sc.fwd = Scratch.ensureDouble(sc.fwd, n)
    sc.indeg = Scratch.ensureInt(sc.indeg, n)
    val dist = sc.fwd
    val seen = sc.indeg // stamp per source state
    java.util.Arrays.fill(seen, 0, n, -1)
    val members = new IntList(16)
    // FIFO relaxation over each eps-closure (SPFA). Closures here are
    // tiny glue chains; a Dijkstra heap's sift traffic dominated the
    // profile, while SPFA converges in one or two passes and needs no
    // ordering structure. Weights >= 0 and the machine is finite, so
    // relaxation terminates.
    var qh = 0
    var qt = 0
    def qpush(t: Int): Unit = {
      if (qt == sc.heapS.length)
        sc.heapS = java.util.Arrays.copyOf(sc.heapS, qt << 1)
      sc.heapS(qt) = t; qt += 1
    }
    var s = 0
    while (s < n) {
      // fast path: no eps:eps out-arcs => the closure is {s} alone; copy
      // arcs and final verbatim (the overwhelmingly common case — only
      // glue states carry eps:eps)
      var hasEps = false
      var k0 = off(s)
      val k0Hi = off(s + 1)
      while (k0 < k0Hi && !hasEps) {
        if (il(k0) == Label.Eps && ol(k0) == Label.Eps) hasEps = true
        k0 += 1
      }
      if (!hasEps) {
        k0 = off(s)
        while (k0 < k0Hi) { b.addArc(s, il(k0), ol(k0), wt(k0), ds(k0)); k0 += 1 }
        if (finW(s) != Double.PositiveInfinity) b.setFinal(s, finW(s))
        s += 1
      } else {
      // eps-closure from s (FIFO relaxation over eps:eps arcs)
      qh = 0; qt = 0; members.n = 0
      dist(s) = 0.0; seen(s) = s; members.add(s)
      qpush(s)
      while (qh < qt) {
        val u = sc.heapS(qh); qh += 1
        val d = dist(u)
        var k = off(u)
        while (k < off(u + 1)) {
          if (il(k) == Label.Eps && ol(k) == Label.Eps) {
            val nd = d + wt(k)
            val t = ds(k)
            if (seen(t) != s) {
              seen(t) = s; dist(t) = nd; members.add(t); qpush(t)
            } else if (nd < dist(t) - 1e-15) {
              dist(t) = nd; qpush(t)
            }
          }
          k += 1
        }
      }
      // closure final weight from the converged distances
      var newFin = Double.PositiveInfinity
      var mi0 = 0
      while (mi0 < members.n) {
        val t = members.a(mi0)
        if (finW(t) != Double.PositiveInfinity && dist(t) + finW(t) < newFin)
          newFin = dist(t) + finW(t)
        mi0 += 1
      }
      // emit non-eps arcs of every closure member, weighted by distance
      var mi = 0
      while (mi < members.n) {
        val t = members.a(mi)
        val d = dist(t)
        var k = off(t)
        while (k < off(t + 1)) {
          if (!(il(k) == Label.Eps && ol(k) == Label.Eps))
            b.addArc(s, il(k), ol(k), d + wt(k), ds(k))
          k += 1
        }
        mi += 1
      }
      if (newFin != Double.PositiveInfinity) b.setFinal(s, newFin)
      s += 1
      }
    }
    if (trim) b.result(start).connect else b.result(start)
  }

  /** Trim states not reachable from start or not co-reachable to a final
    * (pynini `connect`). Renumbers states. */
  def connect: Wfst = {
    if (numStates == 0) return this
    val n = numStates
    val sc = Wfst.scratch.get()
    sc.mark = Scratch.ensureBool(sc.mark, n)   // forward-reachable
    sc.stack = Scratch.ensureInt(sc.stack, n)
    val fwd = sc.mark; java.util.Arrays.fill(fwd, 0, n, false)
    val stack = sc.stack
    var sp = 0
    fwd(start) = true; stack(sp) = start; sp += 1
    while (sp > 0) {
      sp -= 1; val u = stack(sp)
      var k = off(u)
      while (k < off(u + 1)) {
        val d = ds(k)
        if (!fwd(d)) { fwd(d) = true; stack(sp) = d; sp += 1 }
        k += 1
      }
    }
    // reverse CSR (scratch; sc.indeg doubles as counters then cursors)
    val total = numArcs
    sc.indeg = Scratch.ensureInt(sc.indeg, n)
    java.util.Arrays.fill(sc.indeg, 0, n, 0)
    var k = 0
    while (k < total) { sc.indeg(ds(k)) += 1; k += 1 }
    sc.revOff = Scratch.ensureInt(sc.revOff, n + 1)
    val revOff = sc.revOff
    revOff(0) = 0
    var u = 0
    while (u < n) { revOff(u + 1) = revOff(u) + sc.indeg(u); u += 1 }
    sc.revSrc = Scratch.ensureInt(sc.revSrc, math.max(total, 1))
    val revSrc = sc.revSrc
    u = 0
    while (u < n) { sc.indeg(u) = revOff(u); u += 1 }
    u = 0
    while (u < n) {
      k = off(u)
      while (k < off(u + 1)) {
        val d = ds(k); revSrc(sc.indeg(d)) = u; sc.indeg(d) += 1; k += 1
      }
      u += 1
    }
    // co-reachable (sc.flags is safe scratch here: composeBounded
    // re-initializes its in-queue flags at state creation)
    sc.flags = Scratch.ensureBool(sc.flags, n)
    val bwd = sc.flags; java.util.Arrays.fill(bwd, 0, n, false)
    sp = 0
    var i = 0
    while (i < finState.length) {
      val f = finState(i)
      if (fwd(f) && !bwd(f)) { bwd(f) = true; stack(sp) = f; sp += 1 }
      i += 1
    }
    while (sp > 0) {
      sp -= 1; val v = stack(sp)
      var r = revOff(v)
      while (r < revOff(v + 1)) {
        val p = revSrc(r)
        if (!bwd(p)) { bwd(p) = true; stack(sp) = p; sp += 1 }
        r += 1
      }
    }
    if (!(fwd(start) && bwd(start))) return Wfst.emptyFst
    sc.remap = Scratch.ensureInt(sc.remap, n)
    val remap = sc.remap
    var kept = 0
    u = 0
    while (u < n) {
      if (fwd(u) && bwd(u)) { remap(u) = kept; kept += 1 } else remap(u) = -1
      u += 1
    }
    if (kept == n) return this
    // rebuild CSR directly
    val nOff = new Array[Int](kept + 1)
    u = 0
    while (u < n) {
      if (remap(u) >= 0) {
        var c = 0
        k = off(u)
        while (k < off(u + 1)) { if (remap(ds(k)) >= 0) c += 1; k += 1 }
        nOff(remap(u) + 1) = c
      }
      u += 1
    }
    var t = 0
    while (t < kept) { nOff(t + 1) += nOff(t); t += 1 }
    val m = nOff(kept)
    val nIl = new Array[Int](m); val nOl = new Array[Int](m)
    val nWt = new Array[Double](m); val nDs = new Array[Int](m)
    u = 0
    while (u < n) {
      if (remap(u) >= 0) {
        var p = nOff(remap(u))
        k = off(u)
        while (k < off(u + 1)) {
          if (remap(ds(k)) >= 0) {
            nIl(p) = il(k); nOl(p) = ol(k); nWt(p) = wt(k); nDs(p) = remap(ds(k))
            p += 1
          }
          k += 1
        }
      }
      u += 1
    }
    // finals: ascending finState + monotone remap => already sorted
    var fCount = 0
    i = 0
    while (i < finState.length) {
      if (remap(finState(i)) >= 0) fCount += 1
      i += 1
    }
    val fs = new Array[Int](fCount); val fw = new Array[Double](fCount)
    var fi = 0
    i = 0
    while (i < finState.length) {
      if (remap(finState(i)) >= 0) {
        fs(fi) = remap(finState(i)); fw(fi) = finWt(i); fi += 1
      }
      i += 1
    }
    new Wfst(remap(start), kept, nOff, nIl, nOl, nWt, nDs, fs, fw)
  }

  // ---------------------------------------------------------------- distances

  /** Topological order if acyclic (Kahn), else null. The per-window
    * machines of the correction cascade are all DAGs — distance
    * computations use linear DP there and fall back to Dijkstra on
    * cyclic machines (e.g. compiled error models with sigma loops). */
  private def topoOrderOrNull: Array[Int] = {
    val n = numStates
    val indeg = new Array[Int](n)
    var k = 0
    val total = numArcs
    while (k < total) { indeg(ds(k)) += 1; k += 1 }
    val order = new Array[Int](n)
    var head = 0; var tail = 0
    var u = 0
    while (u < n) { if (indeg(u) == 0) { order(tail) = u; tail += 1 }; u += 1 }
    while (head < tail) {
      val v = order(head); head += 1
      k = off(v)
      while (k < off(v + 1)) {
        indeg(ds(k)) -= 1
        if (indeg(ds(k)) == 0) { order(tail) = ds(k); tail += 1 }
        k += 1
      }
    }
    if (tail == n) order else null
  }

  def topoOrder: Option[Array[Int]] = Option(topoOrderOrNull)

  /** Scratch-backed topo order (Kahn into sc.order; sc.indeg as the
    * counters). Returns sc.order (do NOT retain) or null if cyclic. */
  private def topoOrderInto(sc: Scratch): Array[Int] = {
    val n = numStates
    sc.indeg = Scratch.ensureInt(sc.indeg, n)
    sc.order = Scratch.ensureInt(sc.order, n)
    java.util.Arrays.fill(sc.indeg, 0, n, 0)
    var k = 0
    val total = numArcs
    while (k < total) { sc.indeg(ds(k)) += 1; k += 1 }
    var head = 0; var tail = 0
    var u = 0
    while (u < n) { if (sc.indeg(u) == 0) { sc.order(tail) = u; tail += 1 }; u += 1 }
    while (head < tail) {
      val v = sc.order(head); head += 1
      k = off(v)
      while (k < off(v + 1)) {
        sc.indeg(ds(k)) -= 1
        if (sc.indeg(ds(k)) == 0) { sc.order(tail) = ds(k); tail += 1 }
        k += 1
      }
    }
    if (tail == n) sc.order else null
  }

  def shortestDistances: Array[Double] = shortestDistances(topoOrderOrNull)

  private def shortestDistances(topo: Array[Int]): Array[Double] =
    shortestDistancesInto(topo, new Array[Double](numStates))

  /** Like shortestDistances but writes into a caller-provided array
    * (scratch reuse; array length must be >= numStates). */
  private def shortestDistancesInto(topo: Array[Int],
      dist: Array[Double]): Array[Double] = {
    java.util.Arrays.fill(dist, 0, numStates, Double.PositiveInfinity)
    if (numStates == 0) return dist
    dist(start) = 0.0
    if (topo != null) {
      // NOTE: bound by numStates, not topo.length — topo may be the
      // scratch order array, whose capacity exceeds the valid prefix
      var i = 0
      while (i < numStates) {
        val u = topo(i)
        val d = dist(u)
        if (!d.isInfinity) {
          var k = off(u)
          while (k < off(u + 1)) {
            val nd = d + wt(k)
            if (nd < dist(ds(k))) dist(ds(k)) = nd
            k += 1
          }
        }
        i += 1
      }
    } else {
      val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      pq.enqueue((0.0, start))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u) + 1e-15) {
          var k = off(u)
          while (k < off(u + 1)) {
            val nd = d + wt(k)
            if (nd < dist(ds(k)) - 1e-15) { dist(ds(k)) = nd; pq.enqueue((nd, ds(k))) }
            k += 1
          }
        }
      }
    }
    dist
  }

  def reverseDistances: Array[Double] = reverseDistances(topoOrderOrNull)

  private def reverseDistances(topo: Array[Int]): Array[Double] =
    reverseDistancesInto(topo, new Array[Double](numStates))

  private def reverseDistancesInto(topo: Array[Int],
      dist: Array[Double]): Array[Double] = {
    val n = numStates
    java.util.Arrays.fill(dist, 0, n, Double.PositiveInfinity)
    if (n == 0) return dist
    var i = 0
    while (i < finState.length) { dist(finState(i)) = finWt(i); i += 1 }
    if (topo != null) {
      // bound by numStates (scratch order array is over-capacity)
      i = n - 1
      while (i >= 0) {
        val u = topo(i)
        var k = off(u)
        while (k < off(u + 1)) {
          val nd = wt(k) + dist(ds(k))
          if (nd < dist(u)) dist(u) = nd
          k += 1
        }
        i -= 1
      }
    } else {
      val revCnt = new Array[Int](n)
      var k = 0
      val total = numArcs
      while (k < total) { revCnt(ds(k)) += 1; k += 1 }
      val revOff = new Array[Int](n + 1)
      var u = 0
      while (u < n) { revOff(u + 1) = revOff(u) + revCnt(u); u += 1 }
      val revSrc = new Array[Int](total)
      val revW = new Array[Double](total)
      val fill = revOff.clone()
      u = 0
      while (u < n) {
        k = off(u)
        while (k < off(u + 1)) {
          val d = ds(k); revSrc(fill(d)) = u; revW(fill(d)) = wt(k); fill(d) += 1
          k += 1
        }
        u += 1
      }
      val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      i = 0
      while (i < finState.length) { pq.enqueue((finWt(i), finState(i))); i += 1 }
      while (pq.nonEmpty) {
        val (d, v) = pq.dequeue()
        if (d <= dist(v) + 1e-15) {
          var r = revOff(v)
          while (r < revOff(v + 1)) {
            val nd = d + revW(r)
            if (nd < dist(revSrc(r)) - 1e-15) {
              dist(revSrc(r)) = nd; pq.enqueue((nd, revSrc(r)))
            }
            r += 1
          }
        }
      }
    }
    dist
  }

  /** Beam prune (OpenFst/pynini `prune(weight=th)`, lib/latticegen.py:50):
    * keep only states/arcs on some accepting path of weight <= best + th.
    * Renumbers (trims) in the same pass. */
  def prune(th: Double): Wfst = {
    if (numStates == 0) return this
    val sc = Wfst.scratch.get()
    val topo = topoOrderInto(sc)
    sc.fwd = Scratch.ensureDouble(sc.fwd, numStates)
    sc.bwd = Scratch.ensureDouble(sc.bwd, numStates)
    val fwd = shortestDistancesInto(topo, sc.fwd)
    val bwd = reverseDistancesInto(topo, sc.bwd)
    val best = bwd(start)
    if (best.isInfinity) return Wfst.emptyFst
    val lim = best + th + 1e-9
    val n = numStates
    sc.remap = Scratch.ensureInt(sc.remap, n)
    val remap = sc.remap
    var kept = 0
    var u = 0
    while (u < n) {
      if (fwd(u) + bwd(u) <= lim) { remap(u) = kept; kept += 1 } else remap(u) = -1
      u += 1
    }
    val nOff = new Array[Int](kept + 1)
    u = 0
    while (u < n) {
      if (remap(u) >= 0) {
        var c = 0
        var k = off(u)
        while (k < off(u + 1)) {
          if (remap(ds(k)) >= 0 && fwd(u) + wt(k) + bwd(ds(k)) <= lim) c += 1
          k += 1
        }
        nOff(remap(u) + 1) = c
      }
      u += 1
    }
    var t = 0
    while (t < kept) { nOff(t + 1) += nOff(t); t += 1 }
    val m = nOff(kept)
    val nIl = new Array[Int](m); val nOl = new Array[Int](m)
    val nWt = new Array[Double](m); val nDs = new Array[Int](m)
    u = 0
    while (u < n) {
      if (remap(u) >= 0) {
        var p = nOff(remap(u))
        var k = off(u)
        while (k < off(u + 1)) {
          if (remap(ds(k)) >= 0 && fwd(u) + wt(k) + bwd(ds(k)) <= lim) {
            nIl(p) = il(k); nOl(p) = ol(k); nWt(p) = wt(k); nDs(p) = remap(ds(k))
            p += 1
          }
          k += 1
        }
      }
      u += 1
    }
    // finals: finState is ascending and remap is monotone over kept
    // states, so the filtered copy is already sorted (no boxing/sort)
    var fCount = 0
    var i = 0
    while (i < finState.length) {
      if (remap(finState(i)) >= 0 && fwd(finState(i)) + finWt(i) <= lim) fCount += 1
      i += 1
    }
    val fs = new Array[Int](fCount); val fw = new Array[Double](fCount)
    var fi = 0
    i = 0
    while (i < finState.length) {
      val s = finState(i)
      if (remap(s) >= 0 && fwd(s) + finWt(i) <= lim) {
        fs(fi) = remap(s); fw(fi) = finWt(i); fi += 1
      }
      i += 1
    }
    new Wfst(remap(start), kept, nOff, nIl, nOl, nWt, nDs, fs, fw)
  }

  // ---------------------------------------------------------------- compose

  /** Presort arcs by ilabel (pynini `arcsort`, lib/latticegen.py:205) so
    * compose can range-scan matches. Sigma (-1) sorts first. */
  def arcSort: Wfst = {
    val n = numStates
    val nIl = il.clone(); val nOl = ol.clone()
    val nWt = wt.clone(); val nDs = ds.clone()
    val idx = new Array[Integer](numArcs) // per-state sort via boxed idx (compile-time only)
    var s = 0
    while (s < n) {
      val lo = off(s); val hi = off(s + 1)
      var i = lo
      while (i < hi) { idx(i) = Integer.valueOf(i); i += 1 }
      java.util.Arrays.sort(idx, lo, hi,
        (a: Integer, b: Integer) => Integer.compare(il(a), il(b)))
      i = lo
      while (i < hi) {
        val src = idx(i).intValue()
        nIl(i) = il(src); nOl(i) = ol(src); nWt(i) = wt(src); nDs(i) = ds(src)
        i += 1
      }
      s += 1
    }
    new Wfst(start, n, off, nIl, nOl, nWt, nDs, finState, finWt)
  }

  /** Mohri weight pushing toward the initial state over the tropical
    * semiring: reweights by the potential phi(q) = best residual cost to
    * a final (reverseDistances), so every coaccessible state's cheapest
    * continuation costs 0. Total accepting-path weights are preserved
    * (phi telescopes along the path; phi(start) is folded back into the
    * start state's out-arcs and final weight — valid only when no arc
    * re-enters start, which holds for every graft builder; a reentrant
    * start returns `this` unchanged). Non-coaccessible states keep
    * their weights (connect() removes them anyway). This is the
    * reference's `result.push()` on the compiled lexicon
    * (lib/lexicon.py:193); it also aligns shared-suffix residuals so
    * `minimizeAcyclic` can actually merge them. */
  def pushWeights: Wfst = {
    if (numStates == 0 || finState.isEmpty) return this
    val phi = reverseDistances
    val phiS = phi(start)
    if (phiS == Double.PositiveInfinity) return this
    val total = numArcs
    var k = 0
    while (k < total) { if (ds(k) == start) return this; k += 1 }
    val nWt = new Array[Double](total)
    var s = 0
    while (s < numStates) {
      val ps = phi(s)
      val comp = if (s == start) phiS else 0.0
      var a = off(s)
      while (a < off(s + 1)) {
        val pd = phi(ds(a))
        nWt(a) =
          if (ps == Double.PositiveInfinity || pd == Double.PositiveInfinity)
            wt(a)
          else wt(a) + pd - ps + comp
        a += 1
      }
      s += 1
    }
    val nFinW = new Array[Double](finWt.length)
    var f = 0
    while (f < finState.length) {
      val q = finState(f) // phi(q) finite: q is final
      nFinW(f) = finWt(f) - phi(q) + (if (q == start) phiS else 0.0)
      f += 1
    }
    new Wfst(start, numStates, off, il, ol, nWt, ds, finState, nFinW)
  }

  /** Suffix-sharing minimization of an acyclic machine (Revuz/DAWG,
    * generalized to weighted transducer arcs): states are merged
    * bottom-up (reverse topological order) when their outgoing behavior
    * — final weight plus the multiset of (ilabel, olabel, weight-bits,
    * destination class) — is identical. Merging states with equal
    * weighted suffix behavior preserves the weighted relation on ANY
    * machine; on a deterministic acceptor after `pushWeights` it reaches
    * the canonical minimum. Cyclic machines return `this` unchanged.
    * Exact duplicate arcs created by destination merging are collapsed.
    * This is the reference's `result.optimize()` on the compiled lexicon
    * (lib/lexicon.py:192) — perf-only: smaller broadcast artifact and a
    * denser compose product. Output arcs are (ilabel, olabel)-sorted
    * per state (arcSort invariant). */
  def minimizeAcyclic: Wfst = {
    val topo = topoOrderOrNull
    if (topo == null || numStates <= 1) return this
    val classOf = new Array[Int](numStates)
    val sigMap = mutable.HashMap.empty[scala.collection.immutable.ArraySeq[Long], Int]
    val repOf = new IntList
    var i = numStates - 1
    while (i >= 0) {
      val s = topo(i)
      val lo = off(s); val deg = off(s + 1) - lo
      // signature: [finalBits, (il<<32|ol, wBits, class) per arc, sorted]
      val sig = new Array[Long](1 + deg * 3)
      sig(0) = java.lang.Double.doubleToLongBits(finalWeight(s))
      val keys = new Array[(Long, Long, Long)](deg)
      var a = 0
      while (a < deg) {
        keys(a) = ((il(lo + a).toLong << 32) | (ol(lo + a).toLong & 0xffffffffL),
          java.lang.Double.doubleToLongBits(wt(lo + a)),
          classOf(ds(lo + a)).toLong)
        a += 1
      }
      java.util.Arrays.sort(keys, Ordering[(Long, Long, Long)])
      a = 0
      while (a < deg) {
        sig(1 + a * 3) = keys(a)._1
        sig(2 + a * 3) = keys(a)._2
        sig(3 + a * 3) = keys(a)._3
        a += 1
      }
      classOf(s) = sigMap.getOrElseUpdate(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(sig),
        { repOf.add(s); repOf.n - 1 })
      i -= 1
    }
    if (sigMap.size == numStates) return this // nothing merged
    val b = new WfstBuilder(sigMap.size)
    var c = 0
    while (c < repOf.n) {
      val s = repOf.a(c)
      val fw = finalWeight(s)
      if (fw != Double.PositiveInfinity) b.setFinal(c, fw)
      val lo = off(s); val hi = off(s + 1)
      var a = lo
      while (a < hi) {
        // skip exact duplicates (same label pair/weight, merged dest)
        var dup = false
        var p = lo
        while (p < a && !dup) {
          dup = il(p) == il(a) && ol(p) == ol(a) && wt(p) == wt(a) &&
            classOf(ds(p)) == classOf(ds(a))
          p += 1
        }
        if (!dup) b.addArc(c, il(a), ol(a), wt(a), classOf(ds(a)))
        a += 1
      }
      c += 1
    }
    b.result(classOf(start)).arcSort
  }

  /** Composition with the trivial epsilon filter: joint moves on equal
    * non-eps symbols (Sigma on the right matches any symbol, identity),
    * left-alone moves on eps-output arcs, right-alone moves on eps-input
    * arcs. Duplicate-free as long as at most one side carries eps on the
    * shared tape — true everywhere in this pipeline (left inputs are
    * rmEpsilon'd first, cf. SURVEY.md §2 row B5). `that` must be arcSort'd.
    * Result is trimmed (connect). */
  def compose(that: Wfst): Wfst = compose(that, trim = true)

  /** `trim = false` skips the coaccessibility pass (fused connect):
    * correct whenever the result immediately feeds `prune`, which drops
    * non-coaccessible states itself (their backward distance is +inf). */
  def compose(that: Wfst, trim: Boolean): Wfst = {
    if (this.numStates == 0 || that.numStates == 0) return Wfst.emptyFst
    val sc = Wfst.scratch.get()
    assembleTrimmed(sc, expandProduct(that, sc), that, trim)
  }

  /** Fused compose -> projectOutput -> prune(pruneTh): the cascade's
    * lexicon step in ONE exact-size materialization (vs three: product
    * CSR, projected view, pruned CSR with fresh distance passes). */
  def composePruned(that: Wfst, pruneTh: Double): Wfst = {
    if (this.numStates == 0 || that.numStates == 0) return Wfst.emptyFst
    val sc = Wfst.scratch.get()
    assemblePruned(sc, expandProduct(that, sc), that, pruneTh,
      fwdFromSpfa = false)
  }

  /** Full BFS product expansion into scratch (pairs + arc ranges in the
    * scratch sink); returns the product state count. */
  private def expandProduct(that: Wfst, sc: Scratch): Int = {
    val stateIds = sc.map; stateIds.clear()
    val sink = sc.sink; sink.n = 0
    var nStates = 0
    // dense fast path: direct-indexed id table when the product space
    // fits (the error-model cascade step is ~30 x ~650 — one array
    // read replaces three dependent hash-probe cache misses)
    val rightN = that.numStates
    val dense = this.numStates.toLong * rightN <= Scratch.DenseMax
    if (dense) sc.ensureDense(this.numStates * rightN)
    val dId = sc.denseId; val dSt = sc.denseStamp; val dEp = sc.denseEpoch
    def id(p: Int, q: Int): Int = {
      if (dense) {
        val di = p * rightN + q
        if (dSt(di) == dEp) dId(di)
        else {
          sc.growStates(nStates + 1)
          sc.pairA(nStates) = p; sc.pairB(nStates) = q
          sc.rangeStart(nStates) = 0; sc.rangeLen(nStates) = 0
          dId(di) = nStates; dSt(di) = dEp
          nStates += 1
          nStates - 1
        }
      } else {
        val k = p.toLong << 32 | (q.toLong & 0xffffffffL)
        val existing = stateIds.getOrElse(k, -1)
        if (existing >= 0) existing
        else {
          sc.growStates(nStates + 1)
          sc.pairA(nStates) = p; sc.pairB(nStates) = q
          sc.rangeStart(nStates) = 0; sc.rangeLen(nStates) = 0
          stateIds.put(k, nStates)
          nStates += 1
          nStates - 1
        }
      }
    }
    id(this.start, that.start)
    var head = 0
    while (head < nStates) {
      val p = sc.pairA(head); val q = sc.pairB(head)
      val from = sink.n
      val bLo = that.off(q); val bHi = that.off(q + 1)
      // sigma block [bLo, sigmaEnd), then eps block [sigmaEnd, be)
      var sigmaEnd = bLo
      while (sigmaEnd < bHi && that.il(sigmaEnd) < Label.Eps) sigmaEnd += 1
      var be = sigmaEnd
      while (be < bHi && that.il(be) == Label.Eps) {
        sink.add(Label.Eps, that.ol(be), that.wt(be), id(p, that.ds(be)))
        be += 1
      }
      var ka = this.off(p)
      val kaHi = this.off(p + 1)
      while (ka < kaHi) {
        val aol = this.ol(ka)
        if (aol == Label.Eps) {
          sink.add(this.il(ka), Label.Eps, this.wt(ka), id(this.ds(ka), q))
        } else {
          var lo = be; var hi = bHi
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (that.il(mid) < aol) lo = mid + 1 else hi = mid
          }
          var j = lo
          while (j < bHi && that.il(j) == aol) {
            sink.add(this.il(ka), that.ol(j), this.wt(ka) + that.wt(j),
              id(this.ds(ka), that.ds(j)))
            j += 1
          }
          var si = bLo
          while (si < sigmaEnd) {
            val o2 = if (that.ol(si) == Label.Sigma) aol else that.ol(si)
            sink.add(this.il(ka), o2, this.wt(ka) + that.wt(si),
              id(this.ds(ka), that.ds(si)))
            si += 1
          }
        }
        ka += 1
      }
      sc.rangeStart(head) = from
      sc.rangeLen(head) = sink.n - from
      head += 1
    }
    nStates
  }

  /** Build the trimmed (connected) machine straight from the scratch
    * product ranges: coaccessibility is computed over the live arc
    * ranges BEFORE any final arrays are allocated, fusing the old
    * compose-then-connect double CSR copy into one exact-size copy.
    * Forward reachability is by construction (states are only created
    * when an arc reaches them). Renumbering is ascending discovery
    * order — identical to the old connect output. */
  private def assembleTrimmed(sc: Scratch, nStates: Int, that: Wfst,
      trim: Boolean = true): Wfst = {
    if (nStates == 0) return Wfst.emptyFst
    val sink = sc.sink
    if (!trim) {
      // exact-size CSR copy with identity numbering — no coaccessibility
      // pass (the caller guarantees a following prune / start-rooted
      // exploration makes dead states harmless)
      val nOff = new Array[Int](nStates + 1)
      var s = 0
      while (s < nStates) { nOff(s + 1) = nOff(s) + sc.rangeLen(s); s += 1 }
      val m = nOff(nStates)
      val nIl = new Array[Int](m); val nOl = new Array[Int](m)
      val nWt = new Array[Double](m); val nDs = new Array[Int](m)
      s = 0
      while (s < nStates) {
        var src = sc.rangeStart(s)
        var dst = nOff(s)
        val end = src + sc.rangeLen(s)
        while (src < end) {
          nIl(dst) = sink.il(src); nOl(dst) = sink.ol(src)
          nWt(dst) = sink.wt(src); nDs(dst) = sink.ds(src)
          src += 1; dst += 1
        }
        s += 1
      }
      val thisFin = this.finalWeightDense
      val thatFin = that.finalWeightDense
      var fCount = 0
      var i = 0
      while (i < nStates) {
        val wa = thisFin(sc.pairA(i))
        if (!wa.isInfinity && !thatFin(sc.pairB(i)).isInfinity) fCount += 1
        i += 1
      }
      val fs = new Array[Int](fCount); val fw = new Array[Double](fCount)
      var fi = 0
      i = 0
      while (i < nStates) {
        val wa = thisFin(sc.pairA(i))
        if (!wa.isInfinity) {
          val wb = thatFin(sc.pairB(i))
          if (!wb.isInfinity) { fs(fi) = i; fw(fi) = wa + wb; fi += 1 }
        }
        i += 1
      }
      return new Wfst(0, nStates, nOff, nIl, nOl, nWt, nDs, fs, fw)
    }
    // reverse CSR over live ranges
    sc.indeg = Scratch.ensureInt(sc.indeg, nStates)
    java.util.Arrays.fill(sc.indeg, 0, nStates, 0)
    var total = 0
    var s = 0
    while (s < nStates) {
      var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
      total += sc.rangeLen(s)
      while (k < e) { sc.indeg(sink.ds(k)) += 1; k += 1 }
      s += 1
    }
    sc.revOff = Scratch.ensureInt(sc.revOff, nStates + 1)
    sc.revOff(0) = 0
    s = 0
    while (s < nStates) { sc.revOff(s + 1) = sc.revOff(s) + sc.indeg(s); s += 1 }
    sc.revSrc = Scratch.ensureInt(sc.revSrc, math.max(total, 1))
    s = 0
    while (s < nStates) { sc.indeg(s) = sc.revOff(s); s += 1 } // fill cursors
    s = 0
    while (s < nStates) {
      var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
      while (k < e) {
        val d = sink.ds(k); sc.revSrc(sc.indeg(d)) = s; sc.indeg(d) += 1
        k += 1
      }
      s += 1
    }
    // per-state product final weight, computed ONCE into scratch (dense
    // lookups — no per-state binarySearch; sc.bwd is free here)
    sc.bwd = Scratch.ensureDouble(sc.bwd, nStates)
    val finW = sc.bwd
    val thisFin = this.finalWeightDense
    val thatFin = that.finalWeightDense
    var i = 0
    while (i < nStates) {
      val wa = thisFin(sc.pairA(i))
      finW(i) =
        if (wa.isInfinity) wa
        else {
          val wb = thatFin(sc.pairB(i))
          if (wb.isInfinity) Double.PositiveInfinity else wa + wb
        }
      i += 1
    }
    // coaccessibility from product-final states
    sc.mark = Scratch.ensureBool(sc.mark, nStates)
    java.util.Arrays.fill(sc.mark, 0, nStates, false)
    sc.stack = Scratch.ensureInt(sc.stack, nStates)
    var sp = 0
    i = 0
    while (i < nStates) {
      if (!finW(i).isInfinity) { sc.mark(i) = true; sc.stack(sp) = i; sp += 1 }
      i += 1
    }
    while (sp > 0) {
      sp -= 1; val v = sc.stack(sp)
      var r = sc.revOff(v)
      while (r < sc.revOff(v + 1)) {
        val p = sc.revSrc(r)
        if (!sc.mark(p)) { sc.mark(p) = true; sc.stack(sp) = p; sp += 1 }
        r += 1
      }
    }
    if (!sc.mark(0)) return Wfst.emptyFst
    // renumber (ascending) + exact-size CSR copy of kept arcs
    sc.remap = Scratch.ensureInt(sc.remap, nStates)
    var kept = 0
    s = 0
    while (s < nStates) {
      if (sc.mark(s)) { sc.remap(s) = kept; kept += 1 } else sc.remap(s) = -1
      s += 1
    }
    val nOff = new Array[Int](kept + 1)
    s = 0
    while (s < nStates) {
      if (sc.mark(s)) {
        var c = 0
        var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
        while (k < e) { if (sc.mark(sink.ds(k))) c += 1; k += 1 }
        nOff(sc.remap(s) + 1) = c
      }
      s += 1
    }
    var t = 0
    while (t < kept) { nOff(t + 1) += nOff(t); t += 1 }
    val m = nOff(kept)
    val nIl = new Array[Int](m); val nOl = new Array[Int](m)
    val nWt = new Array[Double](m); val nDs = new Array[Int](m)
    s = 0
    while (s < nStates) {
      if (sc.mark(s)) {
        var p = nOff(sc.remap(s))
        var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
        while (k < e) {
          if (sc.mark(sink.ds(k))) {
            nIl(p) = sink.il(k); nOl(p) = sink.ol(k); nWt(p) = sink.wt(k)
            nDs(p) = sc.remap(sink.ds(k)); p += 1
          }
          k += 1
        }
      }
      s += 1
    }
    // finals: kept product-final states, ascending remap order
    var fCount = 0
    i = 0
    while (i < nStates) {
      if (sc.mark(i) && !finW(i).isInfinity) fCount += 1
      i += 1
    }
    val fs = new Array[Int](fCount); val fw = new Array[Double](fCount)
    var fi = 0
    i = 0
    while (i < nStates) {
      if (sc.mark(i) && !finW(i).isInfinity) {
        fs(fi) = sc.remap(i); fw(fi) = finW(i); fi += 1
      }
      i += 1
    }
    new Wfst(0, kept, nOff, nIl, nOl, nWt, nDs, fs, fw)
  }

  /** Weight-bounded composition: like `compose`, but product states are
    * only expanded along prefixes of weight <= maxWeight (SPFA-style
    * relaxation: a state is re-expanded when a cheaper prefix is found,
    * so no state reachable within the bound is missed).
    *
    * EXACTLY equivalent to compose-then-prune(maxWeight) whenever the
    * composed machine has a 0-weight accepting path — true for the
    * error-model step of the cascade (the Σ* identity path): every
    * surviving path has total <= 0 + maxWeight, and with non-negative
    * weights all its prefixes are <= maxWeight too. This is the
    * beam-during-search that keeps dense error models (10^4+ confusion
    * types) from exploding the per-window product. */
  def composeBounded(that: Wfst, maxWeight: Double): Wfst =
    composeBounded(that, maxWeight, trim = true)

  /** `trim = false` as in `compose(that, trim)`. */
  def composeBounded(that: Wfst, maxWeight: Double, trim: Boolean): Wfst = {
    if (this.numStates == 0 || that.numStates == 0) return Wfst.emptyFst
    val sc = Wfst.scratch.get()
    assembleTrimmed(sc, expandBounded(that, maxWeight, sc), that, trim)
  }

  /** Fused composeBounded -> projectOutput -> prune(pruneTh): the
    * cascade's error-model step in ONE exact-size materialization; the
    * SPFA's converged distances double as prune's forward distances. */
  def composeBoundedPruned(that: Wfst, maxWeight: Double,
      pruneTh: Double): Wfst = {
    if (this.numStates == 0 || that.numStates == 0) return Wfst.emptyFst
    val sc = Wfst.scratch.get()
    assemblePruned(sc, expandBounded(that, maxWeight, sc), that, pruneTh,
      fwdFromSpfa = true)
  }

  /** Weight-bounded SPFA product expansion into scratch; returns the
    * product state count. sc.dist holds each state's exact shortest
    * prefix distance on return. */
  private def expandBounded(that: Wfst, maxWeight: Double, sc: Scratch): Int = {
    val lim = maxWeight + 1e-9
    val stateIds = sc.map; stateIds.clear()
    // arcs in the scratch sink; per-state (start,len) ranges — a
    // re-expansion appends a fresh range and repoints (stale ranges are
    // skipped in the final copy). No per-arc object allocation.
    val sink = sc.sink; sink.n = 0
    var nStates = 0
    // dense fast path (see expandProduct): direct-indexed id table
    // when leftN * rightN fits
    val rightN = that.numStates
    val dense = this.numStates.toLong * rightN <= Scratch.DenseMax
    if (dense) sc.ensureDense(this.numStates * rightN)
    val dId = sc.denseId; val dSt = sc.denseStamp; val dEp = sc.denseEpoch
    def id(p: Int, q: Int): Int = {
      if (dense) {
        val di = p * rightN + q
        if (dSt(di) == dEp) dId(di)
        else {
          sc.growStates(nStates + 1)
          sc.pairA(nStates) = p; sc.pairB(nStates) = q
          sc.dist(nStates) = Double.PositiveInfinity
          sc.rangeStart(nStates) = 0; sc.rangeLen(nStates) = 0
          sc.flags(nStates) = false // in-queue flag, clean at creation
          dId(di) = nStates; dSt(di) = dEp
          nStates += 1
          nStates - 1
        }
      } else {
        val k = p.toLong << 32 | (q.toLong & 0xffffffffL)
        val existing = stateIds.getOrElse(k, -1)
        if (existing >= 0) existing
        else {
          sc.growStates(nStates + 1)
          sc.pairA(nStates) = p; sc.pairB(nStates) = q
          sc.dist(nStates) = Double.PositiveInfinity
          sc.rangeStart(nStates) = 0; sc.rangeLen(nStates) = 0
          sc.flags(nStates) = false // in-queue flag, clean at creation
          stateIds.put(k, nStates)
          nStates += 1
          nStates - 1
        }
      }
    }
    val s0 = id(this.start, that.start)
    sc.dist(s0) = 0.0
    // primitive FIFO + membership flags (no boxing on the hot path)
    var qHead = 0; var qTail = 0
    def push(t: Int): Unit = {
      if (qTail == sc.queue.length) {
        if (qHead > (sc.queue.length >> 1)) { // compact
          System.arraycopy(sc.queue, qHead, sc.queue, 0, qTail - qHead)
          qTail -= qHead; qHead = 0
        } else sc.queue = java.util.Arrays.copyOf(sc.queue, sc.queue.length << 1)
      }
      sc.queue(qTail) = t; qTail += 1
    }
    sc.flags(s0) = true; push(s0)
    while (qHead < qTail) {
      val cur = sc.queue(qHead); qHead += 1
      sc.flags(cur) = false
      val d0 = sc.dist(cur)
      val p = sc.pairA(cur); val q = sc.pairB(cur)
      val from = sink.n
      var emitted = 0
      def emit(il2: Int, ol2: Int, w: Double, dp: Int, dq: Int): Unit = {
        val nd = d0 + w
        if (nd <= lim) {
          val t = id(dp, dq)
          sink.add(il2, ol2, w, t)
          emitted += 1
          if (nd < sc.dist(t) - 1e-15) {
            sc.dist(t) = nd
            if (!sc.flags(t)) { sc.flags(t) = true; push(t) }
          }
        }
      }
      val bLo = that.off(q); val bHi = that.off(q + 1)
      var sigmaEnd = bLo
      while (sigmaEnd < bHi && that.il(sigmaEnd) < Label.Eps) sigmaEnd += 1
      var be = sigmaEnd
      while (be < bHi && that.il(be) == Label.Eps) {
        emit(Label.Eps, that.ol(be), that.wt(be), p, that.ds(be))
        be += 1
      }
      var ka = this.off(p)
      val kaHi = this.off(p + 1)
      while (ka < kaHi) {
        val aol = this.ol(ka)
        if (aol == Label.Eps) {
          emit(this.il(ka), Label.Eps, this.wt(ka), this.ds(ka), q)
        } else {
          var lo = be; var hi = bHi
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (that.il(mid) < aol) lo = mid + 1 else hi = mid
          }
          var j = lo
          while (j < bHi && that.il(j) == aol) {
            emit(this.il(ka), that.ol(j), this.wt(ka) + that.wt(j),
              this.ds(ka), that.ds(j))
            j += 1
          }
          var si = bLo
          while (si < sigmaEnd) {
            val o2 = if (that.ol(si) == Label.Sigma) aol else that.ol(si)
            emit(this.il(ka), o2, this.wt(ka) + that.wt(si),
              this.ds(ka), that.ds(si))
            si += 1
          }
        }
        ka += 1
      }
      sc.rangeStart(cur) = from
      sc.rangeLen(cur) = emitted
    }
    nStates
  }

  /** Fused projectOutput + prune straight from the scratch product
    * ranges: equivalent to assemble(trim=false) -> projectOutput ->
    * prune(th) but with ONE exact-size CSR materialization instead of
    * two, skipping prune's fresh topo/distance passes. `fwdFromSpfa`:
    * the bounded expansion's sc.dist already holds exact forward
    * shortest distances; the unbounded expansion computes them here by
    * forward SPFA over the live ranges. */
  private def assemblePruned(sc: Scratch, nStates: Int, that: Wfst,
      pruneTh: Double, fwdFromSpfa: Boolean): Wfst = {
    if (nStates == 0) return Wfst.emptyFst
    val sink = sc.sink
    val thisFin = this.finalWeightDense
    val thatFin = that.finalWeightDense
    def finW(i: Int): Double = {
      val wa = thisFin(sc.pairA(i))
      if (wa.isInfinity) wa
      else {
        val wb = thatFin(sc.pairB(i))
        if (wb.isInfinity) Double.PositiveInfinity else wa + wb
      }
    }
    var qh = 0
    var qt = 0
    def qpush(t: Int): Unit = {
      if (qt == sc.queue.length)
        sc.queue = java.util.Arrays.copyOf(sc.queue, qt << 1)
      sc.queue(qt) = t; qt += 1
    }
    // ---- forward distances
    val fwd = sc.dist // bounded expansion left its exact distances here
    if (!fwdFromSpfa) {
      java.util.Arrays.fill(fwd, 0, nStates, Double.PositiveInfinity)
      java.util.Arrays.fill(sc.flags, 0, nStates, false)
      fwd(0) = 0.0
      sc.flags(0) = true; qpush(0)
      while (qh < qt) {
        val u = sc.queue(qh); qh += 1
        sc.flags(u) = false
        val d = fwd(u)
        var k = sc.rangeStart(u); val e = k + sc.rangeLen(u)
        while (k < e) {
          val nd = d + sink.wt(k)
          val t = sink.ds(k)
          if (nd < fwd(t) - 1e-15) {
            fwd(t) = nd
            if (!sc.flags(t)) { sc.flags(t) = true; qpush(t) }
          }
          k += 1
        }
      }
    }
    // ---- reverse CSR (with weights) over the live ranges
    sc.indeg = Scratch.ensureInt(sc.indeg, nStates)
    java.util.Arrays.fill(sc.indeg, 0, nStates, 0)
    var total = 0
    var s = 0
    while (s < nStates) {
      var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
      total += sc.rangeLen(s)
      while (k < e) { sc.indeg(sink.ds(k)) += 1; k += 1 }
      s += 1
    }
    sc.revOff = Scratch.ensureInt(sc.revOff, nStates + 1)
    sc.revOff(0) = 0
    s = 0
    while (s < nStates) { sc.revOff(s + 1) = sc.revOff(s) + sc.indeg(s); s += 1 }
    sc.revSrc = Scratch.ensureInt(sc.revSrc, math.max(total, 1))
    sc.revW = Scratch.ensureDouble(sc.revW, math.max(total, 1))
    s = 0
    while (s < nStates) { sc.indeg(s) = sc.revOff(s); s += 1 }
    s = 0
    while (s < nStates) {
      var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
      while (k < e) {
        val d = sink.ds(k)
        sc.revSrc(sc.indeg(d)) = s; sc.revW(sc.indeg(d)) = sink.wt(k)
        sc.indeg(d) += 1
        k += 1
      }
      s += 1
    }
    // ---- backward shortest distances (SPFA from product-final states)
    sc.bwd = Scratch.ensureDouble(sc.bwd, nStates)
    val bwd = sc.bwd
    java.util.Arrays.fill(bwd, 0, nStates, Double.PositiveInfinity)
    java.util.Arrays.fill(sc.flags, 0, nStates, false)
    qh = 0; qt = 0
    var i = 0
    while (i < nStates) {
      val f = finW(i)
      if (!f.isInfinity) { bwd(i) = f; sc.flags(i) = true; qpush(i) }
      i += 1
    }
    while (qh < qt) {
      val v = sc.queue(qh); qh += 1
      sc.flags(v) = false
      val d = bwd(v)
      var r = sc.revOff(v)
      while (r < sc.revOff(v + 1)) {
        val p = sc.revSrc(r)
        val nd = d + sc.revW(r)
        if (nd < bwd(p) - 1e-15) {
          bwd(p) = nd
          if (!sc.flags(p)) { sc.flags(p) = true; qpush(p) }
        }
        r += 1
      }
    }
    val best = bwd(0)
    if (best.isInfinity) return Wfst.emptyFst
    val lim = best + pruneTh + 1e-9
    // ---- remap + exact-size projected CSR (same criteria as prune)
    sc.remap = Scratch.ensureInt(sc.remap, nStates)
    var kept = 0
    s = 0
    while (s < nStates) {
      if (fwd(s) + bwd(s) <= lim) { sc.remap(s) = kept; kept += 1 }
      else sc.remap(s) = -1
      s += 1
    }
    val nOff = new Array[Int](kept + 1)
    s = 0
    while (s < nStates) {
      if (sc.remap(s) >= 0) {
        var c = 0
        var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
        while (k < e) {
          if (sc.remap(sink.ds(k)) >= 0 &&
              fwd(s) + sink.wt(k) + bwd(sink.ds(k)) <= lim) c += 1
          k += 1
        }
        nOff(sc.remap(s) + 1) = c
      }
      s += 1
    }
    var t = 0
    while (t < kept) { nOff(t + 1) += nOff(t); t += 1 }
    val m = nOff(kept)
    val nIl = new Array[Int](m); val nOl = new Array[Int](m)
    val nWt = new Array[Double](m); val nDs = new Array[Int](m)
    s = 0
    while (s < nStates) {
      if (sc.remap(s) >= 0) {
        var p = nOff(sc.remap(s))
        var k = sc.rangeStart(s); val e = k + sc.rangeLen(s)
        while (k < e) {
          if (sc.remap(sink.ds(k)) >= 0 &&
              fwd(s) + sink.wt(k) + bwd(sink.ds(k)) <= lim) {
            val o = sink.ol(k) // projectOutput fused: output on both tapes
            nIl(p) = o; nOl(p) = o; nWt(p) = sink.wt(k)
            nDs(p) = sc.remap(sink.ds(k)); p += 1
          }
          k += 1
        }
      }
      s += 1
    }
    // finals (ascending remap order; prune's criterion fwd + finW <= lim)
    var fCount = 0
    i = 0
    while (i < nStates) {
      if (sc.remap(i) >= 0 && fwd(i) + finW(i) <= lim) fCount += 1
      i += 1
    }
    val fs = new Array[Int](fCount); val fw = new Array[Double](fCount)
    var fi = 0
    i = 0
    while (i < nStates) {
      if (sc.remap(i) >= 0) {
        val f = finW(i)
        if (fwd(i) + f <= lim) { fs(fi) = sc.remap(i); fw(fi) = f; fi += 1 }
      }
      i += 1
    }
    new Wfst(sc.remap(0), kept, nOff, nIl, nOl, nWt, nDs, fs, fw)
  }

  // ---------------------------------------------------------------- decoding

  /** Single shortest path, tropical Viterbi (pynini `shortestpath`,
    * lib/latticegen.py:142-147). Returns (input, output, weight) of the
    * best accepting path, or None if the language is empty. */
  def shortestPath: Option[(String, String, Double)] = {
    if (numStates == 0 || finState.isEmpty) return None
    val dist = Array.fill(numStates)(Double.PositiveInfinity)
    val fromArc = new Array[Int](numStates)
    java.util.Arrays.fill(fromArc, -1)
    val fromState = new Array[Int](numStates)
    dist(start) = 0.0
    val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
    pq.enqueue((0.0, start))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d <= dist(u) + 1e-15) {
        var k = off(u)
        while (k < off(u + 1)) {
          val nd = d + wt(k)
          if (nd < dist(ds(k)) - 1e-15) {
            dist(ds(k)) = nd; fromArc(ds(k)) = k; fromState(ds(k)) = u
            pq.enqueue((nd, ds(k)))
          }
          k += 1
        }
      }
    }
    var bestS = -1; var bestW = Double.PositiveInfinity
    var i = 0
    while (i < finState.length) {
      val w = dist(finState(i)) + finWt(i)
      if (w < bestW) { bestW = w; bestS = finState(i) }
      i += 1
    }
    if (bestS < 0) return None
    var rev = List.empty[Int]
    var cur = bestS
    while (cur != start) { rev ::= fromArc(cur); cur = fromState(cur) }
    val in = new StringBuilder; val outb = new StringBuilder
    rev.foreach { k =>
      if (il(k) > 0) in.appendAll(Character.toChars(il(k)))
      if (ol(k) > 0) outb.appendAll(Character.toChars(ol(k)))
    }
    Some((in.result(), outb.result(), bestW))
  }

  /** Enumerate all accepting paths (pynini `paths()`, used on pruned
    * acyclic window FSTs, lib/latticegen.py:150-181). Requires an acyclic
    * machine; guarded by a path budget. */
  def paths(maxPaths: Int = 100000): Seq[(String, String, Double)] = {
    if (numStates == 0 || finState.isEmpty) return Seq.empty
    val acc = mutable.ArrayBuffer.empty[(String, String, Double)]
    val inb = new mutable.ArrayBuffer[Int]; val outb = new mutable.ArrayBuffer[Int]
    val onStack = new Array[Boolean](numStates)
    def dfs(s: Int, w: Double): Unit = {
      if (acc.length >= maxPaths)
        throw new IllegalStateException(s"paths() budget exceeded ($maxPaths)")
      if (onStack(s))
        throw new IllegalStateException("paths() on a cyclic FST")
      val fw = finalWeight(s)
      if (!fw.isInfinity) acc += ((cps(inb), cps(outb), w + fw))
      onStack(s) = true
      var k = off(s)
      while (k < off(s + 1)) {
        if (il(k) > 0) inb += il(k)
        if (ol(k) > 0) outb += ol(k)
        dfs(ds(k), w + wt(k))
        if (il(k) > 0) inb.remove(inb.length - 1)
        if (ol(k) > 0) outb.remove(outb.length - 1)
        k += 1
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
}

/** Growable int list (CSR offsets). */
private[wfst] final class IntList(cap0: Int = 64) {
  var a = new Array[Int](cap0)
  var n = 0
  def add(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
    a(n) = v; n += 1
  }
  def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
}

/** Mutable machine builder: arcs arrive in any state order; `result`
  * bins them into CSR. */
private[wfst] final class WfstBuilder(val numStates: Int) {
  private val srcs = new IntList(64)
  private val sink = new ArcSink(64)
  private val finW = Array.fill(numStates)(Double.PositiveInfinity)

  def addArc(s: Int, i: Int, o: Int, w: Double, d: Int): Unit = {
    srcs.add(s); sink.add(i, o, w, d)
  }
  def setFinal(s: Int, w: Double): Unit =
    if (w < finW(s)) finW(s) = w
  def copyMachine(m: Wfst, shift: Int): Unit = {
    var s = 0
    while (s < m.numStates) {
      var k = m.off(s)
      while (k < m.off(s + 1)) {
        addArc(s + shift, m.il(k), m.ol(k), m.wt(k), m.ds(k) + shift)
        k += 1
      }
      s += 1
    }
  }
  def result(start: Int): Wfst = Wfst.fromBuilder(start, numStates, srcs, sink, finW)
}

object Wfst {

  private[wfst] def fromBuilder(start: Int, n: Int, srcs: IntList,
      sink: ArcSink, finW: Array[Double]): Wfst = {
    val cnt = new Array[Int](n)
    var i = 0
    while (i < srcs.n) { cnt(srcs.a(i)) += 1; i += 1 }
    val off = new Array[Int](n + 1)
    var s = 0
    while (s < n) { off(s + 1) = off(s) + cnt(s); s += 1 }
    val m = off(n)
    val il = new Array[Int](m); val ol = new Array[Int](m)
    val wt = new Array[Double](m); val ds = new Array[Int](m)
    val fill = off.clone()
    i = 0
    while (i < srcs.n) {
      val p = fill(srcs.a(i)); fill(srcs.a(i)) += 1
      il(p) = sink.il(i); ol(p) = sink.ol(i); wt(p) = sink.wt(i); ds(p) = sink.ds(i)
      i += 1
    }
    val fb = mutable.ArrayBuffer.empty[(Int, Double)]
    s = 0
    while (s < n) {
      if (finW(s) != Double.PositiveInfinity) fb += ((s, finW(s)))
      s += 1
    }
    new Wfst(start, n, off, il, ol, wt, ds,
      fb.map(_._1).toArray, fb.map(_._2).toArray)
  }

  /** Construct from per-state arc arrays (tests / non-hot builders). */
  def apply(start: Int, finals: Map[Int, Double],
      arcsPerState: Array[Array[Arc]]): Wfst = {
    val n = arcsPerState.length
    val b = new WfstBuilder(n)
    var s = 0
    while (s < n) {
      arcsPerState(s).foreach(a => b.addArc(s, a.ilabel, a.olabel, a.weight, a.dst))
      s += 1
    }
    finals.foreach { case (st, w) => b.setFinal(st, w) }
    b.result(start)
  }

  /** The empty-language machine. */
  val emptyFst: Wfst = apply(0, Map.empty, Array(Array.empty[Arc]))

  /** Accepts only the empty string with weight 0. */
  def epsilonFst: Wfst = apply(0, Map(0 -> 0.0), Array(Array.empty[Arc]))

  /** Per-thread scratch buffers for the hot path (see Scratch). */
  private[wfst] val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Linear-chain identity acceptor of `s` with final weight `w`
    * (pynini `acceptor`, lib/latticegen.py:29-35). */
  def acceptor(s: String, w: Double = 0.0): Wfst = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val off = Array.tabulate(n + 1 + 1)(i => math.min(i, n))
    val wt = new Array[Double](n)
    new Wfst(0, n + 1, off, cps, cps, wt,
      Array.tabulate(n)(_ + 1), Array(n), Array(w))
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
    val arr = children.map { m =>
      m.iterator.map { case (cp, dst) => Arc(cp, cp, 0.0, dst) }
        .toArray.sortBy(_.ilabel)
    }.toArray
    apply(0, fin.toMap, arr)
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
        val i = if (k < icps.length) icps(k) else Label.Eps
        val o = if (k < ocps.length) ocps(k) else Label.Eps
        states += mutable.ArrayBuffer.empty[Arc]
        val nxt = states.length - 1
        states(cur) += Arc(i, o, 0.0, nxt)
        cur = nxt
        k += 1
      }
      if (w < fin.getOrElse(cur, Double.PositiveInfinity)) fin(cur) = w
    }
    apply(0, fin.toMap, states.map(_.toArray).toArray)
  }

  /** Sigma-star: accepts any string with weight 0 (the universal acceptor
    * of combine_error_transducers, lib/error_simp.py:264-271, realized as
    * one wildcard self-loop instead of per-symbol loops). */
  def sigmaStar: Wfst =
    apply(0, Map(0 -> 0.0),
      Array(Array(Arc(Label.Sigma, Label.Sigma, 0.0, 0))))
}

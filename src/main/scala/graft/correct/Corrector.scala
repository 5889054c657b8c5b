package graft.correct

import graft.tokenize.Tokenizer
import graft.train.{ErrorModelTrainer, Lexicon, LexiconBuilder}
import graft.wfst.Wfst
import scala.collection.mutable

/** One decoding alternative for a lattice edge: output string and
  * tropical weight (conf = 2^-weight at the PageXML surface — preserved
  * quirk of lib/latticegen.py:176). */
final case class Alt(text: String, weight: Double) {
  def conf: Double = math.pow(2.0, -weight)
}

/** Hypothesis lattice over token boundaries 0..nTokens
  * (lib/latticegen.py:150-181 graph form; the FST form is only ever
  * shortest-path'd, which `viterbi` does directly). */
final case class Lattice(nTokens: Int, edges: Map[(Int, Int), Seq[Alt]])

/** Compiled correction model, built once on the driver and broadcast
  * (the COW-fork analogue of scripts/process.py:14,55-70). Both FSTs are
  * arcSort'd for composition. serialVersionUID is PINNED from this
  * version FORWARD: Java's default UID hashes the member list, so
  * without the pin every future method/field addition would invalidate
  * saved ModelIO artifacts (as this round's lexiconFst addition did to
  * anything saved before the pin — a one-time break; from here on the
  * withWordsPerWindow null-field fallback below is reachable). */
@SerialVersionUID(1L)
final case class CompiledModel(
    errorFst: Option[Wfst],
    windowFst: Wfst,
    pruningWeight: Double = 5.0,
    rejectionWeight: Double = 1.5,
    maxWindowSize: Int = 2,
    wordsPerWindow: Int = 3,
    // the RAW lexicon FST (pre-window-closure), kept in the artifact so
    // words_per_window is a LOAD-time knob like the reference's -W
    // (scripts/process.py:102-104 applies it at model load; the window
    // closure is rebuilt from this via windowFstFrom)
    lexiconFst: Option[Wfst] = None) extends Serializable {

  /** Rebuild the window closure for a different words_per_window —
    * the reference's runtime -W (lib/latticegen.py:127-139 built at
    * init). Falls back to the baked window FST when the artifact
    * predates lexiconFst. */
  def withWordsPerWindow(w: Int): CompiledModel =
    lexiconFst match {
      case Some(lex) if w != wordsPerWindow =>
        copy(windowFst = CompiledModel.windowFstFrom(lex, w),
          wordsPerWindow = w)
      case _ => this
    }
}

object CompiledModel {
  /** One-time inference normalization of an error FST: collapse its
    * eps:eps glue (union/closure/concat artifacts of the model
    * BUILD, kept there because glue makes training fast) and arc-sort.
    * With an eps-free error model the per-window product contains no
    * eps:eps arcs at all, so the cascade's rmEpsilon degenerates to a
    * no-op scan — measured 2.2-2.5x on the miss path (JFR showed 25%
    * of flagship time inside per-window rmEpsilon). The arc count
    * grows (fixture model: 941 -> 24.7k arcs, ~600 KB) but that is a
    * one-time, per-broadcast cost; outputs are byte-identical (glue
    * weights are exact-zero sums). The WINDOW fst keeps its glue —
    * eps-removing a lexicon trie closure would copy the root fan-out
    * into every leaf. */
  def normalizeError(f: Wfst): Wfst = f.rmEpsilon.arcSort

  /** lexicon_to_window_fst (lib/latticegen.py:127-139):
    * (lex . " ")^{0..wordsPerWindow-1} . lex, arcsorted (:205). */
  def windowFstFrom(lexiconFst: Wfst, wordsPerWindow: Int): Wfst = {
    val w =
      if (wordsPerWindow == 1) lexiconFst
      else lexiconFst.concat(Wfst.acceptor(" "))
        .closure(0, wordsPerWindow - 1).concat(lexiconFst)
    // glue eps arcs kept (compose handles right-side eps); rmEpsilon on
    // a large lexicon trie would copy the root fan-out into every leaf
    w.arcSort
  }

  /** Driver-side compile from training pairs + optional wordlist —
    * the full train-then-load path (scripts/train.py + FSTLatticeGenerator
    * init, lib/latticegen.py:198-212). */
  def train(pairs: Iterable[(String, String)],
      wordlist: Map[String, Long] = Map.empty,
      maxContext: Int = 3, maxErrors: Int = 3,
      wordsPerWindow: Int = 3,
      pruningWeight: Double = 5.0,
      rejectionWeight: Double = 1.5,
      preservePunct: Boolean = false): CompiledModel = {
    val gtLines = pairs.map(_._2)
    val lexicon = LexiconBuilder.buildLexicon(gtLines, wordlist)
    val lexFst = LexiconBuilder.lexiconToFst(lexicon)
    val errorFst = ErrorModelTrainer.trainSimple(pairs, maxContext, maxErrors,
      preservePunct)
    CompiledModel(Some(normalizeError(errorFst)),
      windowFstFrom(lexFst, wordsPerWindow),
      pruningWeight, rejectionWeight, maxWindowSize = 2, wordsPerWindow,
      lexiconFst = Some(lexFst.arcSort))
  }

  def fromFsts(lexiconFst: Wfst, errorFst: Option[Wfst],
      wordsPerWindow: Int = 3, pruningWeight: Double = 5.0,
      rejectionWeight: Double = 1.5): CompiledModel =
    CompiledModel(errorFst.map(normalizeError),
      windowFstFrom(lexiconFst, wordsPerWindow),
      pruningWeight, rejectionWeight, 2, wordsPerWindow,
      lexiconFst = Some(lexiconFst.arcSort))

  /** Distributed training: the counting passes (lexicon C2, confusion
    * D1) run as Spark hash aggregations over the full pair table; only
    * the AGGREGATED dicts (bounded: vocabulary / confusion-type sized)
    * are collected for the driver-side FST compile — the shape that
    * holds at 100 TB (SURVEY.md §3.2). */
  def trainSpark(spark: org.apache.spark.sql.SparkSession,
      pairs: org.apache.spark.sql.Dataset[(String, String)],
      wordlist: Map[String, Long] = Map.empty,
      maxContext: Int = 3, maxErrors: Int = 3,
      wordsPerWindow: Int = 3,
      pruningWeight: Double = 5.0,
      rejectionWeight: Double = 1.5,
      preservePunct: Boolean = false,
      errorModelType: String = "simple", // "simple" | "st" (train.py -T)
      addedWordCost: Double = 0.0, // lexicon_to_fst added_word_cost
      unweightedLexicon: Boolean = false): CompiledModel = {
    import spark.implicits._
    // C2 + D1 in ONE distributed pass (round 6): the lexicon counts
    // (tag n = 0) and the confusion n-gram counts (n >= 1 — disjoint
    // key space by construction) share a single flatMap + typed
    // reduce job. The aggregates are identical to the previous
    // two-job formulation (sum of freqs / count = sum of 1s); what
    // the merge removes is a whole extra first-queries-of-the-session
    // job — cold-start measurement put the second job at ~1 s of pure
    // scheduling/codegen overhead on the battery's largest entry. For
    // the "st" error model the confusion alignments are not needed,
    // so that branch keeps the lexicon-only pass.
    def collectCounts(withConfusion: Boolean)
        : Array[((Int, String, String), Long)] =
      pairs.flatMap { case (ocr, gt) =>
        val lex = LexiconBuilder.lineEmissions(gt)
          .map { case (c, t, f) => ((0, c, t), f) }
        if (!withConfusion) lex
        else lex ++ ErrorModelTrainer.confusionEmissions(ocr, gt, maxContext)
          .map { case (n, r, g) => ((n, r, g), 1L) }
      }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect()
    val counts = collectCounts(withConfusion = errorModelType != "st")
    val lexRows = counts.collect { case ((0, c, t), f) => (c, t, f) }
    val withWordlist = lexRows ++
      wordlist.map { case (w, f) => (graft.train.Category.Words, w, f) }
    def cat(c: String): Map[String, Long] =
      withWordlist.filter(_._1 == c).groupBy(_._2)
        .map { case (t, rows) => t -> rows.map(_._3).sum }
    val lexicon = Lexicon(cat(graft.train.Category.OpeningBracket),
      cat(graft.train.Category.ClosingBracket),
      cat(graft.train.Category.Punctuation), cat(graft.train.Category.Words))
    val lexFst =
      LexiconBuilder.lexiconToFst(lexicon, addedWordCost, unweightedLexicon)
    val errorFst = errorModelType match {
      case "st" =>
        // E-rows: EM-fit stochastic transducer (train.py -T st)
        val st = graft.train.ErrorModelST.fitSpark(spark, pairs,
          maxN = maxContext, maxNgrams = 1000)
        val mappings = graft.train.ErrorModelST.matrixToMappings(
          st.probs, st.ngrams, weightThreshold = 5.0)
        graft.train.ErrorModelST.compileTransducer(
          mappings, st.ngrProbs, maxErrors, maxContext)
      case _ =>
        // D1: confusion n-gram counts from the shared pass
        val byN: Map[Int, Map[(String, String), Long]] =
          (1 to maxContext).map { n =>
            n -> counts.collect { case ((`n`, r, g), c) => ((r, g), c) }.toMap
          }.toMap
        val singles = (1 to maxContext).map(n =>
          ErrorModelTrainer.compileSingle(byN(n), preservePunct))
        ErrorModelTrainer.combineErrorTransducers(singles, maxErrors)
    }
    CompiledModel(Some(normalizeError(errorFst)),
      windowFstFrom(lexFst, wordsPerWindow),
      pruningWeight, rejectionWeight, 2, wordsPerWindow,
      lexiconFst = Some(lexFst.arcSort))
  }
}

/** Memo for per-window hypothesis sets: the correction is a pure
  * function of (window string, model) and natural-language tokens are
  * Zipf-distributed, so the overwhelmingly common windows become O(1)
  * lookups. */
trait AltCache {
  def getOrCompute(key: String)(f: => Seq[Alt]): Seq[Alt]
}

/** Single-threaded bounded LRU (one instance per partition iterator). */
final class WindowCache(maxEntries: Int = 50000) extends AltCache {
  private val m = new java.util.LinkedHashMap[String, Seq[Alt]](1024, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, Seq[Alt]]): Boolean = size() > maxEntries
  }
  var hits: Long = 0L
  var misses: Long = 0L
  def getOrCompute(key: String)(f: => Seq[Alt]): Seq[Alt] = {
    val v = m.get(key)
    if (v != null) { hits += 1; v }
    else { misses += 1; val r = f; m.put(key, r); r }
  }
}

/** JVM-wide (= per-executor) thread-safe memo, shared across all tasks
  * and waves — the true analogue of the reference's COW fork-pool model
  * sharing (scripts/process.py:14,55-70): pay each distinct window once
  * per executor, not once per task. Keyed weakly by model instance
  * (broadcast values are one instance per executor JVM), so dropping
  * the broadcast frees the memo. Insertion stops at `maxEntries`
  * (lock-free reads keep serving the hot head of the Zipf curve). */
object SharedWindowCache {
  import java.util.concurrent.ConcurrentHashMap
  import java.util.concurrent.atomic.AtomicLong
  private final class Entry(
      val chm: ConcurrentHashMap[String, Seq[Alt]],
      val approxSize: AtomicLong)
  private val perModel = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[CompiledModel, Entry]())
  private val MaxEntries = 2000000L

  def forModel(m: CompiledModel): AltCache = {
    val e = perModel.synchronized {
      var v = perModel.get(m)
      if (v == null) {
        v = new Entry(new ConcurrentHashMap[String, Seq[Alt]](1 << 16),
          new AtomicLong(0L))
        perModel.put(m, v)
      }
      v
    }
    new AltCache {
      def getOrCompute(key: String)(f: => Seq[Alt]): Seq[Alt] = {
        val v = e.chm.get(key)
        if (v != null) v
        else {
          val r = f
          // approx counter instead of CHM.size(): size() traverses all
          // bins and was measured to serialize 32 miss-heavy threads
          if (e.approxSize.get() < MaxEntries) {
            if (e.chm.put(key, r) == null) e.approxSize.incrementAndGet()
          }
          r
        }
      }
    }
  }
}

/** The per-line correction dataflow, B1-B11 of SURVEY.md §2. Pure
  * functions — executed inside `mapPartitions` closures on executors. */
object Corrector {

  /** process_window (lib/latticegen.py:38-69): cascade each model FST:
    * compose -> project(output) -> prune -> optimize; union an identity
    * rejection hypothesis for single-token windows with weight
    * rejection_weight*(len+2) (the naive OOV model, :56-66). */
  def processWindow(inputStr: String, model: CompiledModel): Wfst = {
    var w = Wfst.acceptor(inputStr)
    // error-model step: the Σ* identity path guarantees a 0-weight
    // accepting path, so weight-bounded composition at the pruning
    // threshold is EXACTLY compose-then-prune — the beam applies during
    // the search instead of after it (dense confusion tables would
    // otherwise explode the product before prune sees it).
    // trim = false throughout: prune drops non-coaccessible states
    // itself, and downstream compose / path enumeration explore only
    // from the start state, so the intermediate connect passes are
    // pure overhead (measured ~15% of the miss path)
    // NOTE: dropping rmEpsilon entirely is semantically legal here
    // (compose treats left eps:eps arcs as left-alone moves and
    // paths()/distinctOutputs skip eps labels + dedup) but measured 2.7x
    // SLOWER — the uncollapsed eps chains multiply the next product's
    // state count; rmEpsilon earns its keep as compaction.
    // compose+project+prune are FUSED (one exact-size materialization
    // per step; the SPFA's converged distances double as prune's forward
    // distances — Wfst.assemblePruned)
    for (fst <- model.errorFst) {
      w = w.composeBoundedPruned(fst, model.pruningWeight,
        model.pruningWeight).rmEpsilon(trim = false)
    }
    // the final cascade step keeps its eps arcs: nothing composes with
    // this machine again, and paths()/distinctOutputs skip eps labels —
    // only the error-model step's rmEpsilon earns its keep (compaction
    // before the lexicon compose; without it, 2.7x slower)
    w = w.composePruned(model.windowFst, model.pruningWeight)
    if (!inputStr.contains(' ')) {
      val len = inputStr.codePointCount(0, inputStr.length)
      w = w.union(Wfst.acceptor(inputStr,
        model.rejectionWeight * (len + 2)))
    }
    w
  }

  /** Window enumeration (lib/latticegen.py:214-218) + per-window
    * processing; returns the lattice in graph form. Alternatives carry
    * determinization semantics: distinct strings, min weight (pynini
    * optimize()+paths(), SURVEY.md §2 row B9). */
  def windowAlternatives(winStr: String, model: CompiledModel,
      cache: AltCache): Seq[Alt] = {
    def compute = {
      val w = processWindow(winStr, model)
      // The cascade's last step keeps its eps arcs (perf: nothing
      // composes with it again, and enumeration skips eps). Two rare
      // failure modes of that shortcut are caught here and retried on
      // the eps-free machine: (1) eps-differing duplicate paths blowing
      // distinctOutputs' path budget on dense windows; (2) an eps cycle
      // introduced by an eps-cyclic window FST ("paths() on a cyclic
      // FST"). rmEpsilon's SPFA closure handles eps CYCLES fine
      // (non-negative weights), so the fallback always terminates.
      val alts =
        try w.distinctOutputs()
        catch { case _: IllegalStateException =>
          w.rmEpsilon(trim = false).distinctOutputs()
        }
      alts.map { case (s, wt) => Alt(s, wt) }
    }
    if (cache == null) compute else cache.getOrCompute(winStr)(compute)
  }

  def latticeFromString(line: String, model: CompiledModel,
      cache: AltCache = null): Lattice = {
    val tokens = Tokenizer.splitInputString(line)
    val n = tokens.length
    val edges = mutable.HashMap.empty[(Int, Int), Seq[Alt]]
    var i = 0
    while (i < n) {
      var j = 1
      while (j <= math.min(model.maxWindowSize, n - i)) {
        val winStr = tokens.slice(i, i + j).mkString(" ")
        val alts = windowAlternatives(winStr, model, cache)
        if (alts.nonEmpty) edges((i, i + j)) = alts
        j += 1
      }
      i += 1
    }
    Lattice(n, edges.toMap)
  }

  /** Tropical shortest path through the lattice = the FST-form
    * recombine+shortestpath (lib/latticegen.py:72-124,142-147): windows
    * spliced between token boundaries, space-joined. */
  def viterbi(lattice: Lattice): Option[String] = {
    val n = lattice.nTokens
    if (n == 0) return None
    val best = Array.fill(n + 1)(Double.PositiveInfinity)
    val bp = Array.fill(n + 1)(-1)
    val bpAlt = Array.fill[Alt](n + 1)(null)
    best(0) = 0.0
    var i = 0
    while (i < n) {
      if (!best(i).isInfinity) {
        var j = 1
        while (i + j <= n) {
          lattice.edges.get((i, i + j)).foreach { alts =>
            val a = alts.head // sorted by (weight, text): head is argmin
            val cand = best(i) + a.weight
            if (cand < best(i + j)) {
              best(i + j) = cand; bp(i + j) = i; bpAlt(i + j) = a
            }
          }
          j += 1
        }
      }
      i += 1
    }
    if (best(n).isInfinity) None
    else {
      var parts = List.empty[String]
      var cur = n
      while (cur > 0) { parts ::= bpAlt(cur).text; cur = bp(cur) }
      Some(parts.mkString(" "))
    }
  }

  /** correct_string (scripts/process.py:30-40), FST path: line ->
    * lattice -> shortest path. Empty/whitespace-only lines pass through
    * unchanged (the reference never sees them: its loaders skip empties,
    * lib/helper.py:41-55). */
  def correctLine(line: String, model: CompiledModel,
      cache: AltCache = null): String = {
    if (Tokenizer.splitInputString(line).isEmpty) return line
    val lattice = latticeFromString(line, model, cache)
    viterbi(lattice).getOrElse(line)
  }
}

package graft.train

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) —
  * the step every LLM data pipeline runs before token counting, done
  * the way it should be at corpus scale:
  *
  *   - ONE corpus-wide shuffle builds the word-frequency vocabulary
  *     (the same agg the classical trainer starts from). Everything
  *     after operates on the VOCAB — bounded by distinct words, not
  *     corpus size — which stays a distributed Dataset throughout
  *     (at web scale the vocab is billions of rows and never fits the
  *     driver).
  *   - each merge iteration = one pair-count hash aggregation over the
  *     vocab + a 1-row top-1 collect (cnt desc, pair asc — a
  *     deterministic total order) + a narrow map applying the merge.
  *   - lineage is truncated with localCheckpoint every 8 iterations
  *     (the PageRank discipline): without it the per-iteration map
  *     lineage grows linearly and stage retries replay every merge.
  *
  * Symbols are the word's code points; no end-of-word marker (the
  * marker variant only shifts which boundary pairs exist — the
  * aggregation algebra is identical). Merges apply left-to-right
  * within a word, one merge per iteration, like the reference
  * algorithm's `re.sub` pass. */
object Bpe {

  /** Left-to-right single-merge application (the reference semantics:
    * after a merge fires at i, scanning resumes at i+2 — "aaa" under
    * merge (a,a) becomes ["aa", "a"]). */
  def applyMerge(syms: IndexedSeq[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment a word with an ordered merge list — applying merges in
    * training order reproduces the training-time segmentation. */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { m => syms = applyMerge(syms, m) }
    syms
  }

  /** Driver-local reference trainer over a word-count dict (the shape
    * the distributed trainer must reproduce bit-for-bit). */
  def trainLocal(wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** Distributed trainer: the vocab never leaves the cluster; the
    * driver sees one (a, b, cnt) row per iteration. */
  def trainSpark(s: SparkSession, docs: DataFrame, textCol: String,
                 numMerges: Int): Seq[(String, String)] = {
    import s.implicits._
    var vocab: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toVector: Seq[String], c) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    try {
      while (merges.size < numMerges && !exhausted) {
        val top = vocab
          .flatMap { case (syms, c) =>
            (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
          }
          .toDF("a", "b", "c")
          .groupBy($"a", $"b").agg(sum($"c").as("cnt"))
          .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
          .collect() // bounded: exactly one row (TakeOrderedAndProject)
        if (top.isEmpty) exhausted = true
        else {
          val m = (top(0).getString(0), top(0).getString(1))
          merges += m
          var next = vocab
            .map { case (syms, c) => (applyMerge(syms.toIndexedSeq, m): Seq[String], c) }
          if (merges.size % 8 == 0) next = next.localCheckpoint(eager = false)
          val nextP = next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          nextP.count() // materialize before dropping the parent cache
          vocab.unpersist()
          vocab = nextP
        }
      }
    } finally vocab.unpersist()
    merges.toSeq
  }
}

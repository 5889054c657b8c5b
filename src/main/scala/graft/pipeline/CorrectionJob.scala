package graft.pipeline

import graft.correct.{CompiledModel, Corrector}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Pipeline metrics via accumulators (the north rule's per-partition
  * metrics; exported into snapshot manifests by TableIO). */
final case class Metrics(
    docs: LongAccumulator,
    textSpans: LongAccumulator,
    mediaSpans: LongAccumulator,
    spansChanged: LongAccumulator,
    chars: LongAccumulator)

object Metrics {
  def apply(spark: SparkSession): Metrics = {
    val sc = spark.sparkContext
    Metrics(sc.longAccumulator("graft.docs"),
      sc.longAccumulator("graft.textSpans"),
      sc.longAccumulator("graft.mediaSpans"),
      sc.longAccumulator("graft.spansChanged"),
      sc.longAccumulator("graft.chars"))
  }
}

/** The flagship correction job (SURVEY.md §3.1): driver compiles +
  * broadcasts the model once; executors run the whole per-line FST
  * cascade inside `mapPartitions` — the Spark-native analogue of the
  * reference's COW fork pool (scripts/process.py:14,55-70). The inference
  * path has NO shuffle except the optional salting exchange.
  *
  * Scale design (100 TB / 1000 executors):
  *  - model is broadcast once per executor (torrent broadcast), NOT
  *    serialized per task;
  *  - docs are value-independent rows → embarrassingly parallel map;
  *  - long-document skew is broken either by uniform re-hashing on
  *    doc_id (`salt`) or by span-chunk splitting (`chunkSpans`), which
  *    caps per-row work at `chunkSize` spans and reassembles with one
  *    groupBy — use when doc length skew is extreme (SURVEY.md §7.4 #5).
  */
object CorrectionJob {

  def broadcastModel(spark: SparkSession, model: CompiledModel): Broadcast[CompiledModel] =
    spark.sparkContext.broadcast(model)

  private def correctSpan(s: Span, m: CompiledModel, metrics: Option[Metrics],
      cache: graft.correct.AltCache = null): Span =
    if (s.kind == "text") {
      metrics.foreach { mx =>
        mx.textSpans.add(1); mx.chars.add(s.text.length.toLong)
      }
      val corrected = Corrector.correctLine(s.text, m, cache)
      if (corrected != s.text) metrics.foreach(_.spansChanged.add(1))
      Span(s.kind, corrected, s.media_ref, s.offset)
    } else {
      metrics.foreach(_.mediaSpans.add(1))
      s
    }

  /** Default path: optional salted repartition (uniform doc spread),
    * then a pure map over docs. */
  def correctDocs(docs: Dataset[Doc], bc: Broadcast[CompiledModel],
      metrics: Option[Metrics] = None,
      saltPartitions: Option[Int] = None,
      useCache: Boolean = true): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val input = saltPartitions match {
      case Some(p) => docs.repartition(p, xxhash64($"doc_id"))
      case None    => docs
    }
    input.mapPartitions { it =>
      val m = bc.value
      // useCache=false is the bench's controlled miss-path measurement
      // (the 10^12-doc regime where window diversity dwarfs any cache)
      val cache =
        if (useCache) graft.correct.SharedWindowCache.forModel(m) else null
      it.map { d =>
        metrics.foreach(_.docs.add(1))
        Doc(d.doc_id, d.spans.map(correctSpan(_, m, metrics, cache)))
      }
    }
  }

  /** LM-rescored path (G7): each doc is a sequential fold — lines share
    * LM state in offset order — while docs stay embarrassingly parallel
    * (the wrapper's page-at-a-time traceback threading, SURVEY.md §3.3).
    */
  def correctDocsLm(docs: Dataset[Doc], bc: Broadcast[CompiledModel],
      bcLm: Broadcast[graft.correct.LmScorer],
      lmWeight: Double = 0.5, beamWidth: Int = 100,
      metrics: Option[Metrics] = None,
      saltPartitions: Option[Int] = None): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val input = saltPartitions match {
      case Some(p) => docs.repartition(p, xxhash64($"doc_id"))
      case None    => docs
    }
    input.mapPartitions { it =>
      val m = bc.value
      val lm = bcLm.value
      val cache = graft.correct.SharedWindowCache.forModel(m)
      it.map { d =>
        metrics.foreach(_.docs.add(1))
        graft.correct.LmDecoder.correctDocLm(d, m, lm, lmWeight, beamWidth, cache)
      }
    }
  }

  /** Skew-splitting path: docs with more than `chunkSize` spans are
    * split into chunks, corrected in parallel, and reassembled by
    * doc_id with span order restored via offset sort. Costs one extra
    * shuffle — only pays off under extreme doc-length skew. */
  def correctDocsChunked(docs: Dataset[Doc], bc: Broadcast[CompiledModel],
      chunkSize: Int = 64,
      metrics: Option[Metrics] = None): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = docs.flatMap { d =>
      d.spans.grouped(chunkSize).zipWithIndex.map { case (g, ci) =>
        (d.doc_id, ci, g)
      }
    }
    // spread chunks uniformly (a mega-doc's chunks land on many tasks)
    val corrected = chunks
      .repartition(col("_1"), col("_2"))
      .mapPartitions { it =>
        val m = bc.value
        val cache = graft.correct.SharedWindowCache.forModel(m)
        it.map { case (id, ci, g) =>
          (id, ci, g.map(correctSpan(_, m, metrics, cache)))
        }
      }
    corrected.groupByKey(_._1).mapGroups { (id, it) =>
      metrics.foreach(_.docs.add(1))
      val spans = it.toSeq.sortBy(_._2).flatMap(_._3)
      Doc(id, spans)
    }
  }
}

package graft

import graft.correct.CompiledModel
import graft.pipeline.{CorrectionJob, DocGen}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * flagship correction throughput (corrected text spans/sec — the
  * BASELINE.json metric). Prints ONE JSON line. */
object Bench {

  /** Headline query subset (each also correctness-gated via Verify). */
  val headline: Seq[String] = Seq(
    "q_correct_docs", "q_token_counts", "q_lexicon_counts",
    "q_confusion_counts", "q_ngram_topk", "q_cer_lev",
    "q_dedup_exact", "q_dedup_minhash", "q_ngram_jaccard",
    "q_ann_cosine", "q_ann_lsh", "q_ann_ivf", "q_dedup_embed", "q_dedup_groups", "q_dedup_simhash",
    "q_simhash", "q_quality", "q_fingerprint",
    "q_tpch_pricing", "q_tpch_top_customers", "q_tpch_promo",
    "q_parts_cold", "q_suppliers_hot", "q_events_window", "q_events_asof")

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Flagship throughput: synthesized interleaved Doc table sized so the
    * correction map dominates; returns (textSpans, seconds). */
  def correctionThroughput(spark: SparkSession, model: CompiledModel,
      nDocs: Long, cpus: Int, seed: Long = 42L,
      diverse: Boolean = false, useCache: Boolean = true): (Long, Double) = {
    // 4 task waves per core: straggler/skew smoothing (a single wave of
    // exactly-`cpus` tasks is gated by its slowest task)
    val partitions = cpus * 4
    val docs =
      if (diverse) DocGen.docsDiverse(spark, nDocs, seed, partitions)
      else DocGen.docs(spark, nDocs, seed = seed, partitions = partitions)
    val bc = CorrectionJob.broadcastModel(spark, model)
    val metrics = graft.pipeline.Metrics(spark)
    val (_, sec) = time {
      CorrectionJob.correctDocs(docs, bc, Some(metrics),
        saltPartitions = Some(partitions), useCache = useCache)
        .foreachPartition((it: Iterator[graft.pipeline.Doc]) =>
          it.foreach(_ => ())) // drain: forces the lazy correction map
    }
    (metrics.textSpans.value, sec)
  }

  def fixtureModel(): CompiledModel = {
    val pairs = DocGen.gtLines.zipWithIndex.map { case (gt, i) =>
      (DocGen.perturb(gt, i.toLong), gt)
    }
    CompiledModel.train(pairs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // co-tenant noise protocol (BENCH.md): this box time-shares and
    // identical runs swing up to 5x in multi-minute bursts, so each
    // query runs SPARK_GRAFT_REPS times (default 3) and reports the
    // min — one burst can no longer masquerade as a regression.
    val reps = math.max(sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt, 1)
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // q_correct_docs runs ONCE: its dominant cost is the one-time
        // distributed model training, which later reps would skip via
        // the per-dir model cache — a min over reps would hide it
        val qreps = if (name == "q_correct_docs") 1 else reps
        val secs = (1 to qreps).map { _ =>
          val (_, sec) = time(fn(spark, sfDir).count())
          // free per-query persisted caches (qNgramJaccard's shingle
          // agg) so later passes aren't measured against leaked blocks
          graft.queries.Queries.releaseCaches()
          sec
        }
        name -> secs.min
      }
    }

    // flagship spans/sec (scaled to keep the bench under ~1 min)
    val model = fixtureModel()
    val nDocs = if (sfDir.endsWith("0.1")) 3000L else 600L
    correctionThroughput(spark, model, 200L, cpus.toInt) // warmup
    // best-of-reps for the flagship too (same noise protocol; the
    // measured run is sub-second clean, so extra reps are cheap and
    // the flagship number is the baseline-facing one)
    val (spans, corrSec) = (1 to math.max(reps, 4))
      .map(_ => correctionThroughput(spark, model, nDocs, cpus.toInt))
      .minBy(_._2)

    val qs = (results :+ ("flagship_correction" -> corrSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + corrSec
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"corrected_spans":$spans,"spans_per_sec":${spans / corrSec}%.1f}""")
    spark.stop()
  }
}

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
    "q_correct_docs", "q_token_counts", "q_lexicon_counts", "q_lm_ngrams",
    "q_lm_perplexity", "q_len_percentiles", "q_substring_dup",
    "q_confusion_counts", "q_ngram_topk", "q_cer_lev",
    "q_dedup_exact", "q_paragraph_dedup", "q_dedup_bloom",
    "q_dedup_minhash", "q_ngram_jaccard", "q_boilerplate",
    "q_main_content", "q_html_extract", "q_pdf_extract", "q_warc_extract",
    "q_url_dedup", "q_link_graph", "q_pagerank", "q_crawl_frontier",
    "q_robots_filter",
    "q_fix_mojibake", "q_c4_filter",
    "q_ann_cosine", "q_ann_lsh", "q_ann_ivf", "q_dedup_embed", "q_dedup_groups", "q_dedup_simhash",
    "q_simhash", "q_quality", "q_quality_classifier", "q_fingerprint",
    "q_gopher_quality", "q_pii_redact", "q_decontaminate", "q_sample_stratified",
    "q_sample_upsample", "q_sample_mixture",
    "q_chunk_fixed", "q_tfidf_top", "q_bpe_pairs", "q_sessionize",
    "q_inverted_index",
    "q_semdedup", "q_bpe_encode", "q_dsir", "q_bm25", "q_winnow",
    "q_pmi_bigrams", "q_setsim_join", "q_anchor_text", "q_sample_weighted",
    "q_ppl_buckets", "q_hits", "q_cocitation", "q_jl_project", "q_stupid_backoff",
    "q_tpch_pricing", "q_tpch_top_customers", "q_tpch_promo",
    "q_parts_cold", "q_suppliers_hot", "q_events_window", "q_events_asof", "q_scd_current")

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
    // query runs SPARK_GRAFT_REPS times (default 3; the flagship
    // defaults to 4) and reports the min — one burst can no longer
    // masquerade as a regression. An EXPLICIT SPARK_GRAFT_REPS is
    // honored verbatim for every query including the flagship (so
    // SPARK_GRAFT_REPS=1 really is a quick single-rep run).
    val repsEnv = sys.env.get("SPARK_GRAFT_REPS").map(r => math.max(r.toInt, 1))
    val reps = repsEnv.getOrElse(3)
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
    // INTERLEAVED PAIRED reps (cal/flagship/cal/flagship/...): each
    // flagship rep is bracketed by a fixed CPU-bound calibration job
    // (constant work, no model, no memo), so a co-tenant burst shows up
    // as a calibration swing IN THE SAME RECORD — the bench carries its
    // own noise evidence instead of needing side runs. Reported number
    // is best-of-reps; the full rep and calibration series + spread are
    // in the JSON.
    // bit_xor, not sum: summing 64M random xxhash64 longs overflows
    // under ANSI mode (Spark 4 default); xor is overflow-free and the
    // same constant CPU-bound work
    def calibrate(): Double = time {
      spark.range(0L, 32L * 2000000L, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.bit_xor(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")))).collect()
    }._2
    val flagReps = repsEnv.getOrElse(4)
    val series = (1 to flagReps).map { _ =>
      val cal = calibrate()
      val (sp, sec) = correctionThroughput(spark, model, nDocs, cpus.toInt)
      (cal, sp, sec)
    }
    val (spans, corrSec) = series.map(t => (t._2, t._3)).minBy(_._2)
    val calSeries = series.map(_._1)
    val repSeries = series.map(_._3)
    val spread = repSeries.max / repSeries.min
    val calSpread = calSeries.max / calSeries.min

    val qs = (results :+ ("flagship_correction" -> corrSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val total = results.map(_._2).sum + corrSec
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"corrected_spans":$spans,"spans_per_sec":${spans / corrSec}%.1f,"flagship_reps":${arr(repSeries)},"flagship_spread":$spread%.2f,"cal_reps":${arr(calSeries)},"cal_spread":$calSpread%.2f}"""
    println(json)
    // machine-readable record: stdout passes through sbt's logger,
    // which prefixes every line with "[info] " — a driver tail-scrape
    // then has to strip it (BENCH_r0N.json "parsed": null). The same
    // JSON goes verbatim to $SPARK_GRAFT_BENCH_OUT (default
    // bench/bench_last.json under the repo cwd).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: java.io.IOException =>
      System.err.println(s"bench: could not write $outPath: $e")
    }
    spark.stop()
  }
}

import org.apache.spark.sql.SparkSession

/** Round-6 plan-evidence dumper: writes .explain("formatted") for the
  * touched queries to plans/r06/<query>_<suffix>.txt. The committed
  * `_before` files were generated with the round-start tree
  * (`git checkout ddd77be -- src/main/scala/graft/queries` then
  * `Test/runMain ScratchExplain before`); `_after` files from HEAD via
  * `Test/runMain ScratchExplain after`. */
object ScratchExplain extends App {
  val suffix = args.headOption.getOrElse("after")
  val sf = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val names = Seq(
    "q_correct_docs", "q_confusion_counts", "q_paragraph_dedup",
    "q_dedup_groups", "q_hits", "q_dedup_minhash", "q_ngram_topk",
    "q_winnow", "q_setsim_join", "q_ann_ivf", "q_dedup_embed",
    "q_crawl_frontier", "q_lm_perplexity", "q_token_counts",
    "q_dedup_bloom", "q_tfidf_top", "q_pmi_bigrams", "q_stupid_backoff",
    "q_inverted_index", "q_cer_lev", "q_semdedup", "q_dedup_simhash",
    "q_substring_dup", "q_ngram_jaccard", "q_pdf_extract", "q_bm25",
    "q_pagerank", "q_tpch_pricing", "q_tpch_top_customers", "q_tpch_promo",
    "q_parts_cold", "q_suppliers_hot", "q_events_window", "q_events_asof",
    "q_scd_current", "q_sessionize", "q_boilerplate", "q_anchor_text")
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r06"))
  names.foreach { n =>
    graft.SparkEntry.queries.get(n).foreach { fn =>
      try {
        val df = fn(spark, sf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r06/${n}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[explain] wrote $n")
      } catch { case e: Exception => println(s"[explain] $n FAILED: $e") }
    }
  }
  spark.stop()
}

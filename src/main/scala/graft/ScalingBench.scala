package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence for the north rule's
  * N-vs-4N-executors criterion (no real cluster in this sandbox — per
  * driver instruction we run the identical job on the identical input at
  * local[N] and local[4N] and report throughput at both plus the
  * efficiency eff = (thr@4N / thr@N) / 4; target >= 0.8, BASELINE.md). */
object ScalingBench {

  /** Best spans/sec over 3 repetitions with DISTINCT seeds — each rep
    * corrects fresh data (cache hits only from natural token repetition,
    * not from re-running identical input), and taking the best rep
    * filters the sandbox host's co-tenant interference bursts. */
  private def run(cpus: Int, nDocs: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = Bench.fixtureModel()
    try {
      Bench.correctionThroughput(spark, model, math.max(nDocs / 10, 100),
        cpus, seed = 99L, diverse = true, useCache = false) // warmup (JIT + broadcast)
      val reps = Seq(1L, 2L, 3L).map { sd =>
        val (spans, sec) =
          Bench.correctionThroughput(spark, model, nDocs, cpus, sd,
            diverse = true, useCache = false)
        (spans, spans / sec)
      }
      val best = reps.maxBy(_._2)
      (reps.map(_._1).sum, best._2)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8
    val nDocs = if (args.length > 1) args(1).toLong else 20000L
    val (spansN, thrN) = run(n, nDocs)
    val (_, thr4N) = run(4 * n, nDocs)
    val eff = (thr4N / thrN) / 4.0
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cpus":$n,"n4_cpus":${4 * n},"spans_total":$spansN,"spans_per_sec_n":$thrN%.1f,"spans_per_sec_4n":$thr4N%.1f}""")
  }
}

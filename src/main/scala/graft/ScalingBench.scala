package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence for the north rule's
  * N-vs-4N-executors criterion (no real cluster in this sandbox — per
  * driver instruction we run the identical job on the identical input at
  * local[N] and local[4N] and report throughput at both plus the
  * efficiency eff = (thr@4N / thr@N) / 4; target >= 0.8, BASELINE.md). */
object ScalingBench {

  private def run(cpus: Int, nDocs: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = Bench.fixtureModel()
    try {
      Bench.correctionThroughput(spark, model, math.max(nDocs / 10, 100), cpus) // warmup
      val runs = (1 to 3).map(_ => Bench.correctionThroughput(spark, model, nDocs, cpus))
      val spans = runs.head._1
      val med = runs.map(_._2).sorted.apply(1)
      (spans, med)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8
    val nDocs = if (args.length > 1) args(1).toLong else 12000L
    val (spansN, secN) = run(n, nDocs)
    val (spans4N, sec4N) = run(4 * n, nDocs)
    require(spansN == spans4N, "same input must yield same span count")
    val thrN = spansN / secN
    val thr4N = spans4N / sec4N
    val eff = (thr4N / thrN) / 4.0
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cpus":$n,"n4_cpus":${4 * n},"spans":$spansN,"sec_n":$secN%.3f,"sec_4n":$sec4N%.3f,"spans_per_sec_n":$thrN%.1f,"spans_per_sec_4n":$thr4N%.1f}""")
  }
}

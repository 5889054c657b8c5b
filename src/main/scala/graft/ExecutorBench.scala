package graft

import org.apache.spark.sql.SparkSession

/** One emulated EXECUTOR for the multi-process scaling protocol: a
  * standalone JVM running the flagship miss-path correction on its own
  * SparkSession. The north rule's criterion is N -> 4N *executors*; a
  * real executor is its own JVM (own heap, own GC, dedicated cores), so
  * the faithful single-box emulation is k concurrent copies of THIS
  * process pinned to disjoint core sets (bench/multi_exec_bench.sh), not
  * k*8 threads sharing one heap. Prints one JSON line {spans, sec}.
  *
  * args: seed cpus nDocs */
object ExecutorBench {
  def main(args: Array[String]): Unit = {
    val seed = if (args.nonEmpty) args(0).toLong else 1L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val nDocs = if (args.length > 2) args(2).toLong else 12000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = Bench.fixtureModel()
    try {
      // warmup: JIT + broadcast machinery
      Bench.correctionThroughput(spark, model, math.max(nDocs / 10, 100),
        cpus, seed = 99L, diverse = true, useCache = false)
      val (spans, sec) = Bench.correctionThroughput(spark, model, nDocs,
        cpus, seed, diverse = true, useCache = false)
      println(f"""{"spans":$spans,"sec":$sec%.3f,"spans_per_sec":${spans / sec}%.1f}""")
    } finally spark.stop()
  }
}

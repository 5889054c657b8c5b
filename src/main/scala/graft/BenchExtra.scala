package graft

import org.apache.spark.sql.SparkSession

/** Round-6 auxiliary benchmark (guide §1.4): times declared queries
  * against the NOOP sink — so the computation is measured, not the
  * sink or the driver-side row collection — with min-of-reps and the
  * paired CPU calibration series of the main bench (this box
  * time-shares; the calibration value alongside each rep lets a reader
  * discount co-tenant bursts). Does NOT replace `graft.Bench` (frozen
  * measurement contract): numbers from here are cited in
  * OPTIMIZATION_r06.md as noop-isolated evidence only.
  *
  * Usage: sbt "runMain graft.BenchExtra [query ...]" — no args = the
  * full Bench.headline battery. Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 3),
  * SPARK_GRAFT_BENCHX_OUT (default bench/benchx_last.json). */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sec[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def calibrate(): Double = sec {
      spark.range(0L, 32L * 1000000L, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.bit_xor(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")))).collect()
    }
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val out = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        spark.sparkContext.setJobDescription(s"benchx: $name")
        val series = (1 to reps).map { _ =>
          val cal = calibrate()
          val t = sec {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          graft.queries.Queries.releaseCaches()
          (cal, t)
        }
        spark.sparkContext.setJobDescription(null)
        (name, series.map(_._2).min, series)
      }
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val qs = out.map { case (n, m, _) => "\"" + n + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val repsJson = out.map { case (n, _, s) =>
      "\"" + n + "\":{\"t\":" + arr(s.map(_._2)) + ",\"cal\":" + arr(s.map(_._1)) + "}"
    }.mkString("{", ",", "}")
    val total = out.map(_._2).sum
    val json = f"""{"metric":"noop_total","value":$total%.3f,"unit":"sec","queries":$qs,"series":$repsJson,"sf":"$sfDir","cpus":$cpus}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCHX_OUT",
      "bench/benchx_last.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: java.io.IOException =>
      System.err.println(s"benchx: could not write $outPath: $e")
    }
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Production graph primitives over edge DataFrames. The oracle-gated
  * battery twin ([[graft.queries.Queries.qPagerank]]) runs a fixed
  * 3-iteration integer form so DuckDB can check it bit-for-bit; THIS
  * is the shape a real job runs: double arithmetic, iterate until the
  * L1 delta is small, lineage truncated so 100 iterations do not build
  * a 100-deep plan. */
object GraphOps {

  /** Weighted PageRank with sink-drop dangling semantics (matching the
    * battery twin). `edges` needs columns (src, dst, w). Returns
    * (url, rank).
    *
    * Scale shape: the weighted edge list + per-src out-weights are
    * computed once and persisted — every iteration joins ranks
    * (node-sized) against that cached relation on src, then one
    * dst-keyed partial+final sum. `localCheckpoint` every
    * `checkpointEvery` iterations truncates lineage (without it,
    * iteration k re-plans k nested joins and the driver's plan
    * optimization dominates wall time long before the executors do).
    * Convergence = sum |r_t - r_{t-1}| <= tol * nodes, checked only at
    * checkpoint boundaries so the check adds no extra jobs in between. */
  def pagerank(edges: DataFrame, maxIterations: Int = 100,
      damping: Double = 0.85, tol: Double = 1e-6,
      checkpointEvery: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"src", $"dst", $"w".cast("double").as("w"))
    val outw = e.groupBy($"src").agg(F.sum($"w").as("ow"))
    val ew = e.join(outw, "src")
      .select($"src", $"dst", ($"w" / $"ow").as("share"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select($"src".as("url"))
      .union(e.select($"dst".as("url"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count() // materializes both caches
    var ranks = nodes.select($"url", F.lit(1.0).as("rank")).localCheckpoint()
    var prev = ranks
    var it = 0
    var converged = false
    while (it < maxIterations && !converged) {
      val contrib = ew.join(ranks, ew("src") === ranks("url"))
        .select($"dst".as("url"), ($"rank" * $"share" * damping).as("c"))
        .groupBy($"url").agg(F.sum($"c").as("c"))
      ranks = nodes.join(contrib, Seq("url"), "left")
        .select($"url",
          (F.lit(1.0 - damping) + F.coalesce($"c", F.lit(0.0))).as("rank"))
      it += 1
      if (it % checkpointEvery == 0 || it == maxIterations) {
        ranks = ranks.localCheckpoint() // truncate lineage, one job
        val delta = ranks.as("a").join(prev.as("b"), "url")
          .agg(F.sum(F.abs($"a.rank" - $"b.rank")).as("d"))
          .collect()(0).getDouble(0)
        converged = delta <= tol * nNodes
        prev = ranks
      }
    }
    ew.unpersist(); nodes.unpersist()
    ranks
  }
}

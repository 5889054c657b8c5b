package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("pagerank: 2-cycle fixed point is rank 1.0 per node") {
    import spark.implicits._
    // r = 0.15 + 0.85 r  =>  r = 1 exactly, for both nodes
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val ranks = GraphOps.pagerank(edges, maxIterations = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 2)
    ranks.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6, ranks))
  }

  test("pagerank: weighted star — heavier edge carries proportionally more rank") {
    import spark.implicits._
    // hub links to x with weight 3 and y with weight 1; x and y dangle.
    // r(x) = 0.15 + 0.85 * 0.75 * r(hub), r(y) = 0.15 + 0.85 * 0.25 * r(hub),
    // r(hub) = 0.15 (nothing links to it) — closed form after 2 iterations.
    val edges = Seq(("hub", "x", 3L), ("hub", "y", 1L)).toDF("src", "dst", "w")
    val ranks = GraphOps.pagerank(edges, maxIterations = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hub = 0.15
    assert(math.abs(ranks("hub") - hub) < 1e-9, ranks)
    assert(math.abs(ranks("x") - (0.15 + 0.85 * 0.75 * hub)) < 1e-9, ranks)
    assert(math.abs(ranks("y") - (0.15 + 0.85 * 0.25 * hub)) < 1e-9, ranks)
  }

  test("pagerank: agrees with the integer battery twin's ordering on the crawl graph") {
    import spark.implicits._
    // same synthetic edge shape as q_pagerank, tiny scale
    val edges = (0L until 60L).flatMap { id =>
      val g = id % 7
      val g2 = (id * 3 + 2) % 7
      Seq((s"a$g", s"a$g2", 1L), (s"a$g", "nav", 1L))
    }.toDF("src", "dst", "w").groupBy("src", "dst")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
    val ranks = GraphOps.pagerank(edges, maxIterations = 50)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // nav receives from every article and emits nothing: max rank
    assert(ranks("nav") == ranks.values.max, ranks)
    assert(ranks.values.forall(_ >= 0.15 - 1e-12))
  }
}

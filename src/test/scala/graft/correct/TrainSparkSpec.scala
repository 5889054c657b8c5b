package graft.correct

import graft.Fixtures
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed training must be semantically identical to the local
  * reference path (state numbering may differ; weights and corrections
  * must not). */
class TrainSparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("trainSpark == local train (corrections and window weights)") {
    import spark.implicits._
    val local = CompiledModel.train(Fixtures.trainingPairs, Fixtures.wordlist)
    val dist = CompiledModel.trainSpark(spark,
      Fixtures.trainingPairs.toDS(), Fixtures.wordlist)
    val lines = Seq("ih niht weiß", "Mahrunq", "frag zu bringen. —",
      "re<hée Bahn", "zzqx")
    for (line <- lines) {
      assert(Corrector.correctLine(line, dist) ==
        Corrector.correctLine(line, local), s"line <$line>")
    }
    // full hypothesis sets equal on a window
    val a = Corrector.windowAlternatives("niht", local, null)
    val b = Corrector.windowAlternatives("niht", dist, null)
    assert(a.map(_.text) == b.map(_.text))
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x.weight - y.weight) < 1e-9)
    }
  }
}

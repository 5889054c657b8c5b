package graft.streaming

import graft.Fixtures
import graft.correct.{CompiledModel, Corrector}
import graft.pipeline.{CorrectionJob, DocGen}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC").getOrCreate()

  test("streaming correction matches the batch job on the same input") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-docs").toString
    val docs = DocGen.docs(spark, 30, seed = 13L, partitions = 2)
    docs.write.mode("overwrite").parquet(dir)

    val model = CompiledModel.train(Fixtures.trainingPairs, Fixtures.wordlist)
    val bc = CorrectionJob.broadcastModel(spark, model)

    val stream = StreamingCorrection.readDocStream(spark, dir)
    val q = StreamingCorrection
      .toMemorySink(StreamingCorrection.correctStream(stream, bc), "corrected")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("corrected").as[graft.pipeline.Doc]
        .collect().sortBy(_.doc_id).toSeq
      val batch = CorrectionJob.correctDocs(docs, bc)
        .collect().sortBy(_.doc_id).toSeq
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stateful streaming dedup keeps first-seen content only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-dedup").toString
    val docs = DocGen.docs(spark, 20, seed = 5L, partitions = 2)
    // every doc duplicated under a longer id: dedup must drop all
    // copies and keep the shortest-id original (first-wins order)
    val dup = docs.map(d => d.copy(doc_id = "dup-" + d.doc_id))
    docs.union(dup).write.mode("overwrite").parquet(dir)
    val stream = StreamingCorrection.readDocStream(spark, dir)
    val q = StreamingCorrection.dedupStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("deduped").as[graft.pipeline.Doc].collect()
      assert(kept.length == 20, s"got ${kept.length}")
      assert(!kept.exists(_.doc_id.startsWith("dup-")),
        "must keep the first-seen originals")
      assert(kept.map(_.doc_id).distinct.length == 20)
    } finally q.stop()
  }

  test("watermarked windowed aggregation over the events shape") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamingCorrection.eventWindowAgg(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("evagg").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; with a finite
      // file source the final windows stay open, so check the plan ran
      // and compare the closed prefix against the batch computation
      val streamed = spark.table("evagg")
        .select($"w_start", $"event_type", $"n", $"total").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = StreamingCorrection.eventWindowAgg(
        spark.read.parquet(dir)).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed.subsetOf(batch))
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("oracled q_events_window mirrors the streaming agg (same buckets, cents vs double)") {
    val dir = "/root/testdata/sf0.001"
    val batch = StreamingCorrection.eventWindowAgg(
      spark.read.parquet(s"$dir/events.parquet")).collect()
      .map(r => ((r.getTimestamp(0).getTime / 1000, r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val mirror = graft.queries.Analytics.qEventsWindow(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(batch.keySet == mirror.keySet)
    assert(mirror.nonEmpty)
    mirror.foreach { case (k, (n, cents)) =>
      val (bn, btot) = batch(k)
      assert(bn == n, s"count mismatch at $k")
      // the battery query folds to integer cents per row; the streaming
      // agg sums raw doubles — equal up to accumulated rounding
      assert(math.abs(btot - cents / 100.0) < 0.5, s"total mismatch at $k")
    }
  }
}

package graft.streaming

import graft.correct.CompiledModel
import graft.pipeline.{CorrectionJob, Doc}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Structured Streaming surface. The reference is a batch CLI (SURVEY.md
  * §2 "Streaming: none"), but the engine exposes the correction as a
  * streaming transform for continuous ingestion at scale: the correction
  * is a stateless per-row map, so the same broadcast-model mapPartitions
  * runs under `readStream` unchanged; checkpointing and exactly-once
  * come from the sink/commit-log, complementing TableIO's batch resume. */
object StreamingCorrection {

  /** Streaming source of Doc rows from a parquet directory. */
  def readDocStream(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Doc].schema
    spark.readStream.schema(schema).parquet(path).as[Doc]
  }

  /** The flagship correction as a streaming transform (stateless; model
    * broadcast once, shared memo per executor). */
  def correctStream(docs: Dataset[Doc],
      bc: Broadcast[CompiledModel]): Dataset[Doc] =
    CorrectionJob.correctDocs(docs, bc) // no repartition: stateless map

  def toMemorySink(ds: Dataset[Doc], queryName: String): DataStreamWriter[Doc] =
    ds.writeStream.outputMode("append").format("memory").queryName(queryName)

  /** Watermarked windowed aggregation over the events stream shape
    * (event_id, ts, user_id, event_type, value): counts + sums per
    * 5-minute window, 10-minute watermark for late data. */
  def eventWindowAgg(events: DataFrame): DataFrame =
    events
      // driver testdata stores ts as TIMESTAMP_NTZ; watermarks need LTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))
}

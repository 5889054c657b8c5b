package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped table IO (SURVEY.md §7.5). The sandbox has no Iceberg
  * runtime jars, so the snapshot/commit semantics of the north rule are
  * emulated over Parquet: output is bucketed by hash(doc_id); each bucket
  * commits atomically (write-tmp → rename) with a JSON manifest carrying
  * per-partition lineage stats (row/span counts, doc_id range, checksum);
  * a snapshot file lists committed buckets. Resume = re-run the same
  * write; committed buckets are filtered out before any work happens
  * (predicate on the bucket column → only pending docs are scanned).
  * Swapping in real Iceberg later is one re-implementation of this seam.
  */
object TableIO {

  final case class BucketManifest(bucket: Int, numDocs: Long, numSpans: Long,
      minDocId: String, maxDocId: String, checksum: Long, attemptId: String)

  /** Test-only failure injection: throw after committing N buckets. */
  final class InjectedFailure(msg: String) extends RuntimeException(msg)

  private def manifestDir(path: String): Path = Paths.get(path, "_manifests")
  private def dataDir(path: String): Path = Paths.get(path, "data")

  def committedBuckets(path: String): Set[Int] = {
    val dir = manifestDir(path)
    if (!Files.exists(dir)) Set.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
          s.stripPrefix("bucket-").stripSuffix(".json").toInt
        }.toSet
      finally stream.close()
    }
  }

  /** Bucketed, idempotent, resumable write. Returns newly committed
    * bucket manifests. */
  def writeDocs(docs: Dataset[Doc], path: String, buckets: Int = 32,
      attemptId: String = "attempt-0",
      failAfterBuckets: Option[Int] = None,
      metrics: Option[Metrics] = None): Seq[BucketManifest] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Files.createDirectories(manifestDir(path))
    Files.createDirectories(dataDir(path))
    val done = committedBuckets(path)
    val pending = (0 until buckets).filterNot(done.contains)
    if (pending.isEmpty) return Seq.empty

    // persisted: the parquet write and the lineage-stats aggregation both
    // consume this Dataset — without the persist the upstream correction
    // job (and its accumulators) would run twice, double-counting metrics
    val withBucket = docs
      .withColumn("bucket", pmod(xxhash64($"doc_id"), lit(buckets)).cast("int"))
      .where($"bucket".isin(pending: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tmp = Paths.get(path, s"_tmp_$attemptId")
    withBucket.write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(tmp.toString)

    // per-bucket lineage stats (second pass over the persisted rows; at
    // real cluster scale these come from task-side commit messages instead)
    val stats = withBucket
      .select($"bucket", $"doc_id", size($"spans").as("ns"),
        xxhash64($"doc_id", to_json($"spans")).as("h"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("numDocs"), sum($"ns").as("numSpans"),
        min($"doc_id").as("minId"), max($"doc_id").as("maxId"),
        expr("bit_xor(h)").as("checksum")) // xor: overflow-free, order-independent
      .collect()
      .map(r => r.getInt(0) -> BucketManifest(r.getInt(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), attemptId))
      .toMap
    withBucket.unpersist(blocking = false)

    val committed = scala.collection.mutable.ArrayBuffer.empty[BucketManifest]
    for (b <- pending) {
      val src = tmp.resolve(s"bucket=$b")
      val dst = dataDir(path).resolve(s"bucket=$b")
      if (Files.exists(src)) {
        if (Files.exists(dst)) deleteRecursively(dst)
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      } else Files.createDirectories(dst) // empty bucket still commits
      val m = stats.getOrElse(b,
        BucketManifest(b, 0L, 0L, "", "", 0L, attemptId))
      Files.writeString(manifestDir(path).resolve(s"bucket-$b.json"),
        manifestJson(m))
      committed += m
      failAfterBuckets.foreach { k =>
        if (committed.length >= k && b != pending.last) {
          deleteRecursively(tmp)
          throw new InjectedFailure(s"injected failure after $k buckets")
        }
      }
    }
    deleteRecursively(tmp)
    val rootStream = Files.list(Paths.get(path))
    val snapN =
      try rootStream.iterator().asScala
        .count(_.getFileName.toString.startsWith("_snapshot-"))
      finally rootStream.close()
    val all = committedBuckets(path).toSeq.sorted
    // job metrics ride the snapshot (the Iceberg snapshot-summary analogue)
    val metricsJson = metrics.map { m =>
      s""","metrics":{"docs":${m.docs.value},"textSpans":${m.textSpans.value},""" +
        s""""mediaSpans":${m.mediaSpans.value},"spansChanged":${m.spansChanged.value},""" +
        s""""chars":${m.chars.value}}"""
    }.getOrElse("")
    Files.writeString(Paths.get(path, s"_snapshot-$snapN.json"),
      s"""{"snapshot":$snapN,"attempt":"$attemptId","buckets":[${all.mkString(",")}]$metricsJson}""")
    committed.toSeq
  }

  def readDocs(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(dataDir(path).toString)
      .select("doc_id", "spans").as[Doc]
  }

  private def manifestJson(m: BucketManifest): String =
    s"""{"bucket":${m.bucket},"numDocs":${m.numDocs},"numSpans":${m.numSpans},""" +
      s""""minDocId":"${m.minDocId}","maxDocId":"${m.maxDocId}",""" +
      s""""checksum":${m.checksum},"attemptId":"${m.attemptId}"}"""

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally stream.close()
    }
  }
}

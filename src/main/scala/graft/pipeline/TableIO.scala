package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Iceberg-shaped table IO (SURVEY.md §7.5). The sandbox has no Iceberg
  * runtime jars, so the snapshot/commit semantics of the north rule are
  * emulated over Parquet: output is bucketed by hash(doc_id); each bucket
  * commits atomically (write-tmp → rename) with a JSON manifest carrying
  * per-partition lineage stats (row/span counts, doc_id range, checksum);
  * a snapshot file lists committed buckets. Resume = re-run the same
  * write; committed buckets are filtered out before any work happens
  * (predicate on the bucket column → only pending docs are scanned).
  * Swapping in real Iceberg later is one implementation of this seam.
  *
  * ALL filesystem access goes through the Hadoop FileSystem resolved
  * from the table path — manifests, snapshots and the bucket rename
  * work identically on file:/, HDFS and S3A (java.nio would silently
  * write driver-local paths and cannot rename an HDFS directory). The
  * caveat inherited from Hadoop: rename is atomic on HDFS/file: but
  * copy-based on S3A — real Iceberg solves that with metadata-pointer
  * commits, which is exactly the seam this class emulates. */
object TableIO {

  final case class BucketManifest(bucket: Int, numDocs: Long, numSpans: Long,
      minDocId: String, maxDocId: String, checksum: Long, attemptId: String)

  /** Test-only failure injection: throw after committing N buckets. */
  final class InjectedFailure(msg: String) extends RuntimeException(msg)

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
  private def manifestDir(root: Path): Path = new Path(root, "_manifests")
  private def dataDir(root: Path): Path = new Path(root, "data")

  private def committedBuckets(fs: FileSystem, root: Path): Set[Int] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
        s.stripPrefix("bucket-").stripSuffix(".json").toInt
      }.toSet
  }

  def committedBuckets(path: String): Set[Int] = {
    val spark = SparkSession.active
    val (fs, root) = fsFor(spark, path)
    committedBuckets(fs, root)
  }

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Bucketed, idempotent, resumable write. Returns newly committed
    * bucket manifests. */
  def writeDocs(docs: Dataset[Doc], path: String, buckets: Int = 32,
      attemptId: String = "attempt-0",
      failAfterBuckets: Option[Int] = None,
      metrics: Option[Metrics] = None): Seq[BucketManifest] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (fs, root) = fsFor(spark, path)
    fs.mkdirs(manifestDir(root))
    fs.mkdirs(dataDir(root))
    val done = committedBuckets(fs, root)
    val pending = (0 until buckets).filterNot(done.contains)
    if (pending.isEmpty) return Seq.empty

    // persisted: the parquet write and the lineage-stats aggregation both
    // consume this Dataset — without the persist the upstream correction
    // job (and its accumulators) would run twice, double-counting metrics
    val withBucket = docs
      .withColumn("bucket", pmod(xxhash64($"doc_id"), lit(buckets)).cast("int"))
      .where($"bucket".isin(pending: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tmp = new Path(root, s"_tmp_$attemptId")
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
      val src = new Path(tmp, s"bucket=$b")
      val dst = new Path(dataDir(root), s"bucket=$b")
      if (fs.exists(src)) {
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename $src -> $dst failed")
      } else fs.mkdirs(dst) // empty bucket still commits
      val m = stats.getOrElse(b,
        BucketManifest(b, 0L, 0L, "", "", 0L, attemptId))
      writeString(fs, new Path(manifestDir(root), s"bucket-$b.json"),
        manifestJson(m))
      committed += m
      failAfterBuckets.foreach { k =>
        if (committed.length >= k && b != pending.last) {
          fs.delete(tmp, true)
          throw new InjectedFailure(s"injected failure after $k buckets")
        }
      }
    }
    fs.delete(tmp, true)
    val snapN =
      if (!fs.exists(root)) 0
      else fs.listStatus(root).iterator
        .count(_.getPath.getName.startsWith("_snapshot-"))
    val all = committedBuckets(fs, root).toSeq.sorted
    // job metrics ride the snapshot (the Iceberg snapshot-summary analogue)
    val metricsJson = metrics.map { m =>
      s""","metrics":{"docs":${m.docs.value},"textSpans":${m.textSpans.value},""" +
        s""""mediaSpans":${m.mediaSpans.value},"spansChanged":${m.spansChanged.value},""" +
        s""""chars":${m.chars.value}}"""
    }.getOrElse("")
    writeString(fs, new Path(root, s"_snapshot-$snapN.json"),
      s"""{"snapshot":$snapN,"attempt":"$attemptId","buckets":[${all.mkString(",")}]$metricsJson}""")
    committed.toSeq
  }

  def readDocs(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(new Path(new Path(path), "data").toString)
      .select("doc_id", "spans").as[Doc]
  }

  private def manifestJson(m: BucketManifest): String =
    s"""{"bucket":${m.bucket},"numDocs":${m.numDocs},"numSpans":${m.numSpans},""" +
      s""""minDocId":"${m.minDocId}","maxDocId":"${m.maxDocId}",""" +
      s""""checksum":${m.checksum},"attemptId":"${m.attemptId}"}"""
}

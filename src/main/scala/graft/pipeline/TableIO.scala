package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Iceberg-shaped table IO (SURVEY.md §7.5). The sandbox has no Iceberg
  * runtime jars, so the snapshot/commit semantics of the north rule are
  * emulated over Parquet with METADATA-POINTER commits, the same shape
  * real Iceberg uses:
  *
  *  - data files are written ONCE under an attempt-scoped directory
  *    (`data/<attempt>-<seq>/bucket=N/part-*.parquet`) and NEVER moved
  *    or renamed afterwards;
  *  - a bucket COMMITS by creating its manifest
  *    (`_manifests/bucket-N.json`), which records the ABSOLUTE data
  *    file list plus per-partition lineage stats (row/span counts,
  *    doc_id range, checksum). The manifest is written to a temp name
  *    and renamed into place: single-file rename is atomic on
  *    HDFS/file:, and on S3A the copy creates the destination object
  *    fully formed — a reader never observes a truncated manifest, and
  *    there is NO directory rename anywhere in the commit path (the
  *    round-4 S3A caveat);
  *  - readers resolve the table EXCLUSIVELY through manifests, so
  *    orphaned files from failed attempts are invisible (vacuum()
  *    reclaims them);
  *  - a snapshot file (`_snapshot-K.json`) lists the committed buckets
  *    + job metrics — the Iceberg snapshot-summary analogue.
  *
  * Resume = re-run the same write; committed buckets are filtered out
  * before any work happens (predicate on the bucket column → only
  * pending docs are scanned). Swapping in real Iceberg later is one
  * implementation of this seam.
  *
  * ALL filesystem access goes through the Hadoop FileSystem resolved
  * from the table path — manifests, snapshots and data files work
  * identically on file:/, HDFS and S3A (java.nio would silently write
  * driver-local paths). */
object TableIO {

  final case class BucketManifest(bucket: Int, numDocs: Long, numSpans: Long,
      minDocId: String, maxDocId: String, checksum: Long, attemptId: String,
      files: Seq[String] = Nil)

  /** Test-only failure injection: throw after committing N buckets. */
  final class InjectedFailure(msg: String) extends RuntimeException(msg)

  private def fsFor(conf: Configuration, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }
  /** Active-session Hadoop conf when one exists; a plain Configuration
    * otherwise — table inspection must work SESSIONLESS (e.g. checking
    * resume state before building a SparkSession). */
  private def defaultConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
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

  def committedBuckets(path: String,
      conf: Configuration = null): Set[Int] = {
    val (fs, root) = fsFor(Option(conf).getOrElse(defaultConf()), path)
    committedBuckets(fs, root)
  }

  /** Atomic single-file publish: write to a dot-temp sibling, rename
    * into place. Readers either see the complete file or none. */
  private def publishString(fs: FileSystem, p: Path, s: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"manifest publish $tmp -> $p failed")
  }

  /** A fresh attempt-scoped data directory: `<attemptId>-<seq>` with
    * the first free sequence number (a RETRY of the same attemptId must
    * not overwrite data files referenced by already-committed
    * manifests — files are immutable once written). */
  private def freshAttemptDir(fs: FileSystem, root: Path,
      attemptId: String): Path = {
    var seq = 0
    var p = new Path(dataDir(root), s"$attemptId-$seq")
    while (fs.exists(p)) { seq += 1; p = new Path(dataDir(root), s"$attemptId-$seq") }
    p
  }

  /** Bucketed, idempotent, resumable write with metadata-pointer
    * commits. Returns newly committed bucket manifests. */
  def writeDocs(docs: Dataset[Doc], path: String, buckets: Int = 32,
      attemptId: String = "attempt-0",
      failAfterBuckets: Option[Int] = None,
      metrics: Option[Metrics] = None): Seq[BucketManifest] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (fs, root) = fsFor(spark.sparkContext.hadoopConfiguration, path)
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
    val attemptDir = freshAttemptDir(fs, root, attemptId)
    withBucket.write.mode(SaveMode.ErrorIfExists)
      .partitionBy("bucket").parquet(attemptDir.toString)

    // per-bucket lineage stats (second pass over the persisted rows; at
    // real cluster scale these come from task-side commit messages instead)
    val stats = bucketStats(withBucket, attemptId)
    withBucket.unpersist(blocking = false)

    val committed = scala.collection.mutable.ArrayBuffer.empty[BucketManifest]
    for (b <- pending) {
      val src = new Path(attemptDir, s"bucket=$b")
      // the manifest records the ABSOLUTE file list; data files stay
      // where the tasks wrote them — the manifest CREATE is the commit
      val files =
        if (!fs.exists(src)) Seq.empty[String]
        else fs.listStatus(src).iterator.map(_.getPath)
          .filter(p => p.getName.startsWith("part-"))
          .map(_.toString).toSeq.sorted
      val m = stats.getOrElse(b,
        BucketManifest(b, 0L, 0L, "", "", 0L, attemptId))
        .copy(files = files)
      publishString(fs, new Path(manifestDir(root), s"bucket-$b.json"),
        manifestJson(m))
      committed += m
      failAfterBuckets.foreach { k =>
        if (committed.length >= k && b != pending.last)
          throw new InjectedFailure(s"injected failure after $k buckets")
          // uncommitted attempt files stay on disk as orphans —
          // invisible to readers (manifest-driven), reclaimed by vacuum()
      }
    }
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
    publishString(fs, new Path(root, s"_snapshot-$snapN.json"),
      s"""{"snapshot":$snapN,"attempt":"$attemptId","buckets":[${all.mkString(",")}]$metricsJson}""")
    committed.toSeq
  }

  /** Per-bucket lineage stats over a bucketed Doc frame (shared by
    * [[writeDocs]] and [[mergeDocs]]). */
  private def bucketStats(withBucket: org.apache.spark.sql.DataFrame,
      attemptId: String): Map[Int, BucketManifest] =
    withBucket
      .select(col("bucket"), col("doc_id"), size(col("spans")).as("ns"),
        xxhash64(col("doc_id"), to_json(col("spans"))).as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("numDocs"), sum(col("ns")).as("numSpans"),
        min(col("doc_id")).as("minId"), max(col("doc_id")).as("maxId"),
        expr("bit_xor(h)").as("checksum"))
      .collect()
      .map(r => r.getInt(0) -> BucketManifest(r.getInt(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), attemptId))
      .toMap

  /** Copy-on-write MERGE — the Iceberg `MERGE INTO` (COW strategy)
    * analogue: upsert `updates` into the committed table by doc_id.
    * Only buckets containing an updated key are rewritten — each
    * affected bucket's new data = updates ∪ (its existing rows whose
    * doc_id was NOT updated), written ONCE under a fresh attempt dir;
    * the commit REPOINTS the affected bucket manifests (atomic
    * single-file publish). Untouched buckets keep their manifests
    * verbatim, and the superseded data files stay on disk — the
    * previous snapshot still describes a consistent table (time
    * travel) until vacuum() reclaims them. A crash mid-publish leaves
    * a prefix of affected buckets repointed; every manifest remains
    * individually consistent (lineage stats intact) and re-running
    * the same merge rewrites identical content (idempotence is
    * spec-pinned by checksum equality).
    *
    * Scale shape: the existing side reads ONLY the affected buckets'
    * files (manifest-driven pruning — an update touching 3 of 4096
    * buckets scans 3 buckets of a 100-TB table); both sides carry the
    * same xxhash64(doc_id) % buckets key so the anti-join
    * co-partitions; lineage stats ride one pass over the persisted
    * merged frame, exactly like writeDocs. `updates` must carry
    * unique doc_ids (the MERGE contract). */
  def mergeDocs(updates: Dataset[Doc], path: String, buckets: Int = 32,
      attemptId: String = "merge-0"): Seq[BucketManifest] = {
    val spark = updates.sparkSession
    import spark.implicits._
    val (fs, root) = fsFor(spark.sparkContext.hadoopConfiguration, path)
    fs.mkdirs(manifestDir(root))
    fs.mkdirs(dataDir(root))
    val bucketOf = pmod(xxhash64(col("doc_id")), lit(buckets)).cast("int")
    val up = updates.toDF().withColumn("bucket", bucketOf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val affected = up.select($"bucket").distinct().as[Int].collect().sorted
    if (affected.isEmpty) { up.unpersist(blocking = false); return Seq.empty }
    val oldFiles = readManifests(path, spark.sparkContext.hadoopConfiguration)
      .filter(m => affected.contains(m.bucket)).flatMap(_.files)
    val existing =
      if (oldFiles.isEmpty) up.limit(0)
      else spark.read.parquet(oldFiles: _*)
        .select(col("doc_id"), col("spans")).withColumn("bucket", bucketOf)
    val merged = up
      .unionByName(existing.join(up.select($"doc_id"), Seq("doc_id"), "left_anti")
        .select(up.columns.map(col).toSeq: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val attemptDir = freshAttemptDir(fs, root, attemptId)
    merged.write.mode(SaveMode.ErrorIfExists)
      .partitionBy("bucket").parquet(attemptDir.toString)
    val stats = bucketStats(merged, attemptId)
    merged.unpersist(blocking = false)
    up.unpersist(blocking = false)
    val committed = affected.toSeq.map { b =>
      val src = new Path(attemptDir, s"bucket=$b")
      val files =
        if (!fs.exists(src)) Seq.empty[String]
        else fs.listStatus(src).iterator.map(_.getPath)
          .filter(p => p.getName.startsWith("part-"))
          .map(_.toString).toSeq.sorted
      val m = stats.getOrElse(b,
        BucketManifest(b, 0L, 0L, "", "", 0L, attemptId)).copy(files = files)
      publishString(fs, new Path(manifestDir(root), s"bucket-$b.json"),
        manifestJson(m))
      m
    }
    val snapN = fs.listStatus(root).iterator
      .count(_.getPath.getName.startsWith("_snapshot-"))
    val all = committedBuckets(fs, root).toSeq.sorted
    publishString(fs, new Path(root, s"_snapshot-$snapN.json"),
      s"""{"snapshot":$snapN,"attempt":"$attemptId","merge":true,""" +
        s""""rewrittenBuckets":[${affected.mkString(",")}],""" +
        s""""buckets":[${all.mkString(",")}]}""")
    committed
  }

  /** All committed manifests, parsed (Jackson rides in with Spark). */
  def readManifests(path: String,
      conf: Configuration = null): Seq[BucketManifest] = {
    val (fs, root) = fsFor(Option(conf).getOrElse(defaultConf()), path)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fs.listStatus(dir).iterator
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("bucket-") && n.endsWith(".json")
      }
      .map { st =>
        val in = fs.open(st.getPath)
        val node =
          try mapper.readTree(in)
          finally in.close()
        import scala.jdk.CollectionConverters._
        BucketManifest(
          node.get("bucket").asInt(), node.get("numDocs").asLong(),
          node.get("numSpans").asLong(), node.get("minDocId").asText(),
          node.get("maxDocId").asText(), node.get("checksum").asLong(),
          node.get("attemptId").asText(),
          node.get("files").elements().asScala.map(_.asText()).toSeq)
      }.toSeq.sortBy(_.bucket)
  }

  /** Read the table AS COMMITTED: the union of the manifests' file
    * lists — never a directory glob, so half-written attempts and
    * orphans are invisible. */
  def readDocs(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    val files = readManifests(path,
      spark.sparkContext.hadoopConfiguration).flatMap(_.files)
    if (files.isEmpty) spark.emptyDataset[Doc]
    else spark.read.parquet(files: _*)
      .select("doc_id", "spans").as[Doc]
  }

  /** Reclaim data files not referenced by any committed manifest
    * (failed-attempt orphans). Returns the deleted paths. NOT called
    * automatically: against a live concurrent writer this is the table
    * owner's maintenance decision, exactly like Iceberg's
    * remove_orphan_files. */
  def vacuum(path: String, conf: Configuration = null): Seq[String] = {
    val c = Option(conf).getOrElse(defaultConf())
    val (fs, root) = fsFor(c, path)
    val dd = dataDir(root)
    if (!fs.exists(dd)) return Seq.empty
    val referenced = readManifests(path, c).flatMap(_.files).toSet
    val it = fs.listFiles(dd, true)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toString
      if (st.isFile && st.getPath.getName.startsWith("part-")
          && !referenced.contains(p)) {
        fs.delete(st.getPath, false)
        deleted += p
      }
    }
    deleted.toSeq
  }

  private def manifestJson(m: BucketManifest): String = {
    val files = m.files.map(f => "\"" + f.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
    s"""{"bucket":${m.bucket},"numDocs":${m.numDocs},"numSpans":${m.numSpans},""" +
      s""""minDocId":"${m.minDocId}","maxDocId":"${m.maxDocId}",""" +
      s""""checksum":${m.checksum},"attemptId":"${m.attemptId}","files":$files}"""
  }
}

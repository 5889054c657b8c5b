package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark readers/writers for the reference's file formats
  * (SURVEY.md §2 block A). */
object Sources {

  /** A1 load_pairs_from_file (lib/helper.py:41-55): two-column TSV,
    * first two columns kept, short rows skipped (the reference logs a
    * warning; we count them via a filter — same rows survive). */
  def loadPairsFromFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .select(split(regexp_replace($"value", "\\s+$", ""), "\t").as("cols"))
      .where(size($"cols") >= 2)
      .select(element_at($"cols", 1).as("line_id"),
        element_at($"cols", 2).as("text"))
  }

  /** A2 load_pairs_from_dir (lib/helper.py:18-38,58-65): one file per
    * line id (`<id>.<suffix>`), every nonempty line yields a row keyed
    * by the basename before the first dot. */
  def loadPairsFromDir(spark: SparkSession, dir: String, suffix: String): DataFrame = {
    import spark.implicits._
    spark.read.text(s"$dir/*.$suffix")
      .withColumn("fname", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .select(regexp_extract($"fname", "^([^.]*)", 1).as("line_id"),
        trim($"value").as("text"))
      .where($"text" =!= "")
  }

  /** A3 load_lines_from_file (lib/helper.py:68-75). */
  def loadLines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.text(path).select(regexp_replace($"value", "\\s+$", "").as("value"))
      .as[String]
  }

  /** A4 load_wordlist_from_file (lib/helper.py:78-92): word<TAB>freq,
    * malformed rows silently dropped (non-numeric freq -> null -> drop).
    */
  def loadWordlist(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .select(split($"value", "\t").as("cols"))
      .where(size($"cols") >= 2)
      .select(element_at($"cols", 1).as("word"),
        expr("try_cast(element_at(cols, 2) AS BIGINT)").as("freq"))
      .na.drop(Seq("freq"))
  }

  /** A5 save_pairs_to_file (lib/helper.py:95-101): two-column TSV. */
  def savePairsToFile(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)

  /** A5 save_pairs_to_dir (lib/helper.py:104-114): one `<id>.<suffix>`
    * file per pair, file content = the line (the inverse of
    * loadPairsFromDir). Executors write their partitions in parallel —
    * the driver never collects the pairs — through the Hadoop
    * FileSystem API resolved from the output URI (file:/, hdfs://,
    * s3a:// alike), so per-file output lands on SHARED storage on a
    * real cluster, not each executor's local disk. Null ids are
    * dropped (no filename to write), null text coalesces to empty —
    * a single bad row must not NPE a million-file job. */
  def savePairsToDir(df: DataFrame, dir: String, suffix: String): Unit = {
    val confSer = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(confSer.value).mkdirs(dirPath) // driver-side
    val (d, sfx) = (dir, suffix) // serializable captures, not `this`
    val cols = df.columns
    df.select(col(cols(0)).cast("string").as("id"),
        coalesce(col(cols(1)).cast("string"), lit("")).as("text"))
      .where(col("id").isNotNull)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val base = new org.apache.hadoop.fs.Path(d)
        // newInstance, NOT the cached get(): setWriteChecksum on the
        // shared cached FileSystem would disable .crc sidecars for every
        // other writer in this JVM for its lifetime; a private instance
        // scopes the flag to this task and is closed with it
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          base.toUri, confSer.value)
        try {
          // the contract is exactly one file per entry — no .crc
          // sidecars from the checksummed local FS (no-op on HDFS/S3A)
          fs.setWriteChecksum(false)
          it.foreach { r =>
            val out = fs.create(
              new org.apache.hadoop.fs.Path(base, s"${r.getString(0)}.$sfx"),
              true)
            try out.write(r.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
        } finally fs.close()
      }
  }

  /** A7 frequency-list write (lib/error_simp.py:159-167): human-readable
    * confusion triples, NBSP gap rendered as the box character. */
  def writeFrequencyList(df: DataFrame, path: String): Unit = {
    val gap = "\u00a0"
    df.select(
      regexp_replace(col("raw"), gap, "□").as("raw"),
      regexp_replace(col("gt"), gap, "□").as("gt"),
      col("relfreq"))
      .write.mode("overwrite").option("sep", "\t")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

  /** A7 frequency-list read (lib/error_simp.py:170-180). */
  def readFrequencyList(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("sep", "\t")
      .schema("raw STRING, gt STRING, relfreq DOUBLE").csv(path)
      .select(
        regexp_replace(col("raw"), "□", "\u00a0").as("raw"),
        regexp_replace(col("gt"), "□", "\u00a0").as("gt"),
        col("relfreq"))
  }

  /** A8 ngram list save/load (lib/error_st.py:281-293). */
  def saveNgrams(spark: SparkSession, ngrams: Seq[String], path: String): Unit = {
    import spark.implicits._
    ngrams.toDS().coalesce(1).write.mode("overwrite").text(path)
  }
  def loadNgrams(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    spark.read.text(path).as[String].collect().toSeq
  }

  /** JSONL interchange for the interleaved Doc table — the lingua
    * franca LLM data pipelines exchange corpora in (one JSON object
    * per line, so the files are splittable and greppable). Writer is
    * Spark's native json sink (distributed, one file per partition);
    * reader pins the schema FROM THE Doc ENCODER — never inferred:
    * inference costs a full extra pass over 100 TB and drifts when a
    * sparse field (e.g. media_ref) is absent from a sampled shard. */
  def writeJsonlDocs(docs: Dataset[graft.pipeline.Doc], path: String): Unit =
    docs.write.mode("overwrite").json(path)

  def readJsonlDocs(spark: SparkSession, path: String): Dataset[graft.pipeline.Doc] = {
    import spark.implicits._
    spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[graft.pipeline.Doc]].schema)
      .json(path).as[graft.pipeline.Doc]
  }
}

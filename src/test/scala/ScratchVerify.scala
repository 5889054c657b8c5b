import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Throwaway targeted verify: dump selected queries at sf0.01. */
object ScratchVerify extends App {
  val names = args.headOption.map(_.split(",").toSeq)
    .getOrElse(Seq("q_nb_train", "q_nb_classify"))
  val spark = SparkSession.builder()
    .master("local[16]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scratch-verify").getOrCreate()
  val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
  names.foreach { n =>
    val t0 = System.nanoTime()
    SparkEntry.queries(n)(spark, dir)
      .write.mode("overwrite").parquet(s"/tmp/scratch_verify/$n.parquet")
    println(f"[scratch] $n done in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    graft.queries.Queries.releaseCaches()
  }
  java.nio.file.Files.writeString(
    java.nio.file.Paths.get("/tmp/scratch_verify/oracle_sql.json"),
    SparkEntry.oracleSql.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t") + "\""
    }.mkString("{", ",\n", "}"))
  spark.stop()
}

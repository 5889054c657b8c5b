import org.apache.spark.sql.SparkSession

/** Throwaway: time q_dsir end-to-end at sf0.1. */
object ScratchDsir extends App {
  val spark = SparkSession.builder()
    .master("local[16]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("scratch-dsir").getOrCreate()
  val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
  val t0 = System.nanoTime()
  graft.queries.Queries.qDsir(spark, dir)
    .write.mode("overwrite").parquet("/tmp/scratch_dsir.parquet")
  println(f"[dsir] end-to-end: ${(System.nanoTime() - t0) / 1e9}%.2fs")
  graft.queries.Queries.releaseCaches()
  spark.stop()
}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: isolate q_winnow stage costs at sf0.1. */
object ScratchWinnow extends App {
  val spark = SparkSession.builder()
    .master("local[16]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("scratch-winnow").getOrCreate()
  import spark.implicits._
  import graft.functions.HexPrefix64.hexPrefix64
  val dir = "/root/testdata/sf0.1"
  def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[win] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  val docs = spark.read.parquet(s"$dir/documents.parquet")
  timed("warmup count")(docs.count())
  val grams = when(length($"text") >= 5, expr(
    "transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))"))
    .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
  def drain(c: Column): Unit =
    docs.select(c.as("v")).agg(bit_xor($"v")).collect()
  timed("grams")(drain(size(grams)))
  val gh = transform(grams, g => hexPrefix64(md5(g)))
  timed("gh md5")(drain(element_at(gh, -1)))
  def minLayer(c: Column, gap: Int): Column =
    zip_with(slice(c, lit(1), size(c) - gap), slice(c, lit(1 + gap), size(c) - gap), least(_, _))
  timed("layer1")(drain(element_at(minLayer(gh, 1), -1)))
  timed("layer2 naive")(drain(element_at(minLayer(minLayer(gh, 1), 2), -1)))
  val bound = element_at(transform(array(gh), g =>
    element_at(minLayer(minLayer(g, 1), 2), -1)), 1)
  timed("layer2 let-bound")(drain(bound))
  timed("full query")(graft.queries.Queries.qWinnow(spark, dir)
    .write.mode("overwrite").parquet("/tmp/scratch_winnow.parquet"))
  spark.stop()
}

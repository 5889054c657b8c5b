import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: isolate q_setsim_join stage costs at sf0.1. */
object ScratchSetsim extends App {
  val spark = SparkSession.builder()
    .master("local[32]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("scratch-setsim").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import spark.implicits._
  import graft.functions.HexPrefix64.hexPrefix64
  val dir = "/root/testdata/sf0.1"
  def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[setsim] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  val docs = spark.read.parquet(s"$dir/documents.parquet")
  timed("warmup")(docs.count())
  val ex = docs.where(length($"text") >= 8)
    .select($"doc_id", explode(array_distinct(
      transform(graft.functions.CharNgrams.charNgrams($"text", 8, 8),
        g => hexPrefix64(md5(g))))).as("h"))
  timed("explode+count")(ex.count())
  val dfc = ex.groupBy($"h").agg(count(lit(1)).as("df"))
  timed("df agg")(dfc.count())
  val ordered = ex.join(dfc, "h")
    .groupBy($"doc_id")
    .agg(transform(array_sort(collect_list(struct($"df", $"h"))),
      x => x.getField("h")).as("toks"))
    .withColumn("n", size($"toks"))
    .persist()
  timed("ordered build")(ordered.count())
  val pref = ordered.select($"doc_id", $"n",
    posexplode(slice($"toks", lit(1), expr("n - (9*n + 9) div 10 + 1"))))
    .toDF("doc_id", "n", "p", "h")
  timed("prefix explode")(pref.count())
  val cand = pref.as("a").join(pref.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
      col("a.n") * 10 >= col("b.n") * 9 && col("b.n") * 10 >= col("a.n") * 9)
    .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
    .agg(min(struct(col("a.p").as("pa"), col("b.p").as("pb"),
      col("a.n").as("na"), col("b.n").as("nb"))).as("m"))
    .where(lit(19) * least($"m.na" - $"m.pa", $"m.nb" - $"m.pb") >=
      lit(9) * ($"m.na" + $"m.nb"))
    .select($"doc_i", $"doc_j")
  timed("candidates (positional)")(println("  n_cand=" + cand.count()))
  val ver = cand
    .join(ordered.select($"doc_id".as("doc_i"), $"toks".as("ta"), $"n".cast("long").as("na")), "doc_i")
    .join(ordered.select($"doc_id".as("doc_j"), $"toks".as("tb"), $"n".cast("long").as("nb")), "doc_j")
    .withColumn("inter", size(array_intersect($"ta", $"tb")).cast("long"))
    .where(lit(19L) * $"inter" >= lit(9L) * ($"na" + $"nb"))
  timed("verify")(ver.count())
  timed("full query")(graft.queries.Queries.qSetsimJoin(spark, dir).count())
  graft.queries.Queries.releaseCaches()
  spark.stop()
}

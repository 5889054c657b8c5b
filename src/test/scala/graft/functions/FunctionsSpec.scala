package graft.functions

import graft.queries.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2").getOrCreate()

  test("SimHash64 expression == TextOps.simhash64, inside codegen") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "ich weiß nicht",
      "a", "", "x  y\tz", "ſchoͤne Graphen")
    val df = texts.toDF("t")
      .select($"t", SimHash64.simhash64($"t").as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == TextOps.simhash64(t), s"text <$t>")
    }
    // over a real scan the expression stays inside whole-stage codegen
    // (no serde boundary — unlike the typed-map variant)
    val scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(SimHash64.simhash64($"text").as("h"))
    // "*(n)" is the WholeStageCodegen stage marker in plan strings
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash64("), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(scan.count() > 0)
  }

  test("SimHash64 whitespace set == TextOps (\\s exactly, not isWhitespace)") {
    import spark.implicits._
    // exotic whitespace: isWhitespace-only separators (U+1680, U+2000,
    // U+2028, U+205F, U+3000, U+001C) must NOT split; VT U+000B must NOT
    // split either (RE2/DuckDB \s excludes it, unlike Java regex \s)
    val texts = Seq(
      "a\u1680b", "a\u2000b", "a\u2028b", "a\u205Fb", "a\u3000b",
      "a\u000Bb", "a\u001Cb", "nbsp\u00A0joined", "mix \u2028 of\u000Bit")
    val got = texts.toDF("t")
      .select($"t", SimHash64.simhash64($"t").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == TextOps.simhash64(t),
        s"text <${t.map(c => f"\\u${c.toInt}%04x").mkString}>")
    }
  }

  test("HexPrefix64 == conv(substr(hex,1,15),16,10) and stays in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(md5(col("text")).as("h"))
      .select(col("h"),
        HexPrefix64.hexPrefix64(col("h")).as("fast"),
        conv(substring(col("h"), 1, 15), 16, 10).cast("long").as("ref"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hexprefix64(") || plan.contains("HexPrefix64"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
  }

  test("SQL function registration: simhash64/hexprefix64 callable from plain SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT simhash64('the quick brown fox') AS h,
        |       hexprefix64(md5('hello#0')) AS p""".stripMargin).head()
    assert(row.getLong(0) == TextOps.simhash64("the quick brown fox"))
    assert(row.getLong(1) == 1052003359986274704L) // int('e99777b6e7fd190',16)
    // the extensions class builds the same registrations (spark-submit path)
    assert(GraftFunctions.all.map(_._1).toSet ==
      Set("simhash64", "hexprefix64", "char_ngrams"))
    new GraftExtensions() // constructible via reflection by spark.sql.extensions
  }

  test("CharNgrams == transform/substring SQL form, stays in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real corpus + unicode edges (umlauts, combining marks, CJK — all
    // multi-byte UTF-8 where per-gram offset scanning matters)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().take(50).toSeq ++
      Seq("aͤbc", "über", "日本語のテキスト", "a", "", "ab")
    val df = docs.toDF("text")
    for ((mn, mx) <- Seq((1, 3), (3, 3), (8, 8))) {
      val got = df.select(CharNgrams.charNgrams($"text", mn, mx).as("g"))
        .as[Seq[String]].collect().map(_.sorted.toList)
      val ref = df.select(expr(
        s"""flatten(transform(sequence(1, length(text)), i ->
              transform(sequence(1, least($mx, length(text) - i + 1)), n ->
                substring(text, i, n))))""").as("g"))
        .as[Seq[String]].collect()
        .map(_.filter(g => g.codePointCount(0, g.length) >= mn).sorted.toList)
      assert(got.toSeq == ref.toSeq, s"($mn,$mx)")
    }
    // codegen residency: no DeserializeToObject boundary
    val plan = df.select(explode(CharNgrams.charNgrams($"text", 3, 3)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    // nulls
    val nulls = Seq[String](null).toDF("text")
      .select(CharNgrams.charNgrams($"text", 1, 3)).collect()
    assert(nulls.head.isNullAt(0))
    // SQL registration path
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT size(char_ngrams('abcd', 2, 2)) s").head().getInt(0) == 3)
  }

  test("TopKMinLongs: bounded heap equals sort-take-k across partitions, dupes and nulls handled") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import TopKMinLongs.topKMin
    // adversarial: one hot key with many values (incl. duplicates),
    // descending insert order (worst case for a min-keeper), several
    // partitions so partial merge runs, a null, an under-k group
    val rows =
      (1000L to 1L by -1L).map(v => ("hot", Option(v))) ++
        Seq(("hot", Option(5L)), ("hot", Option(5L)), ("hot", None)) ++
        Seq(("tiny", Option(42L)), ("tiny", Option(7L)))
    val df = rows.toDF("k", "v").repartition(7)
      .groupBy($"k").agg(topKMin($"v", 20).as("top"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val hotExpected = ((1000L to 1L by -1L) ++ Seq(5L, 5L))
      .sorted.take(20)
    assert(got("hot") == hotExpected) // dupes kept, nulls skipped
    assert(got("tiny") == Seq(7L, 42L)) // under-k group: all values, ascending
    // per-group state is the k-slot object buffer: the plan is an
    // ObjectHashAggregate partial+final pair, no window, no sort-agg
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("SimHash64 handles nulls") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("t")
      .select(SimHash64.simhash64($"t").as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}

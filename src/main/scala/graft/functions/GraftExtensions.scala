package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native Catalyst expressions as SQL functions,
  * so plain-SQL users can call them:
  *
  *   SELECT simhash64(text), hexprefix64(md5(text)) FROM docs
  *
  * Two entry points:
  *  - spark-submit: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard SparkSessionExtensions injection path);
  *  - an existing session: `GraftFunctions.register(spark)` (temp
  *    functions on the session's registry — no session rebuild needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects exactly 1 argument")
    args.head
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(one(args, "simhash64"))),
    ("hexprefix64",
      new ExpressionInfo(classOf[HexPrefix64].getName, "hexprefix64"),
      (args: Seq[Expression]) => HexPrefix64(one(args, "hexprefix64"))),
    ("char_ngrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "char_ngrams expects (text, minN, maxN)")
        def asInt(e: Expression) = {
          // foldable check FIRST: eval(null) on a non-literal (e.g. a
          // column reference) throws an opaque UnsupportedOperation
          // instead of this message
          require(e.foldable,
            s"char_ngrams n-bounds must be integer literals, got $e")
          e.eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"char_ngrams n-bounds must be integer literals, got $other")
          }
        }
        CharNgrams(args.head, asInt(args(1)), asInt(args(2)))
      }))

  /** Register on an already-running session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

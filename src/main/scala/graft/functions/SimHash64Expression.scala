package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash of a string —
  * the one place the engine benefits from dropping below the Dataset
  * API (SURVEY.md §7.3: preference (b), a custom `Expression`, beats a
  * Scala closure): evaluation stays inside whole-stage codegen, reading
  * the UTF8String directly from the unsafe row with no
  * serialization/boxing, like Spark's own hash expressions.
  *
  * Same semantics as TextOps.simhash64 (whitespace tokens, MD5 bit
  * votes) — asserted equal in FunctionsSpec. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Token separator set = RE2/DuckDB's \s ([ \t\n\f\r]) — the set the
    * DuckDB qSimhash oracle splits on, and the SAME set
    * TextOps.simhash64 uses. NOT Java regex \s (which adds VT U+000B)
    * and NOT Character.isWhitespace (broader still: U+1680,
    * U+2000-200A, U+2028/29, ...) — either would tokenize text with
    * those code points differently from the oracle. */
  @inline private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Static helper invoked from generated code (the pattern of Spark's
    * own Md5/XxHash expressions: codegen emits a direct static call). */
  def hash(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val str = s.toString
    var start = 0
    var i = 0
    val len = str.length
    while (i <= len) {
      if (i == len || isSep(str.charAt(i))) {
        if (i > start) {
          val h = md.digest(str.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h(b / 8) >> (b % 8)) & 1) == 1) 1 else -1)
            b += 1
          }
          md.reset()
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Column-level entry point (Spark 4 Column<->Expression bridge). */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

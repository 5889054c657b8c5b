package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse the first 15 hex chars of a hex string (e.g. an md5 digest) as
  * a non-negative BIGINT — the fold that turns `min(md5(...))` string
  * aggregation into a HashAggregate over longs. The built-in `conv`
  * expression does the same job through generic any-base conversion
  * machinery and was measured ~4x slower on the MinHash hot path; this
  * reads the ASCII bytes straight off the UTF8String (no substring, no
  * toString). Equivalent DuckDB oracle: CAST(('0x' || substr(h,1,15)) AS
  * BIGINT). 15 hex digits = 60 bits, fits signed 64-bit. */
case class HexPrefix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HexPrefix64.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexPrefix64.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): HexPrefix64 =
    copy(child = newChild)
}

object HexPrefix64 {
  /** Static helper invoked from generated code. Accepts [0-9a-fA-F];
    * stops at the first non-hex char or after 15 digits. */
  def parse(s: UTF8String): Long = {
    val n = math.min(s.numBytes(), 15)
    var out = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return out
      out = (out << 4) | d
      i += 1
    }
    out
  }

  def hexPrefix64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HexPrefix64(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

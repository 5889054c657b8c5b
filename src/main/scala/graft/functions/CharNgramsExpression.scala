package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of `child` for n in [minN, maxN], as one
  * ARRAY<STRING> built in a SINGLE linear pass over the UTF-8 bytes.
  *
  * The SQL-composable alternative —
  * `transform(sequence(1, length(text)), i -> substring(text, i, n))` —
  * re-locates the i-th code point from the string START on every
  * lambda element (UTF8String.substringSQL scans for char offsets), so
  * gram emission is O(len^2) per row. This expression computes the
  * code-point byte-offset table once (O(len)) and slices windows off
  * the shared byte array; each gram shares the parent's bytes (one
  * UTF8String.fromBytes view, no per-gram copy).
  *
  * Used by the MinHash shingler (8,8), the char-trigram top-k (3,3)
  * and the ST n-gram counter (1,maxN); the DuckDB oracles keep their
  * substr() form — the gram MULTISET is identical. */
case class CharNgrams(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression {
  require(minN >= 1 && maxN >= minN, "need 1 <= minN <= maxN")

  // reject non-string inputs at ANALYSIS time (a BIGINT column would
  // otherwise die mid-job with a ClassCastException in nullSafeEval)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a STRING argument, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.grams(input.asInstanceOf[UTF8String], minN, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.grams($c, $minN, $maxN)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  /** Static helper invoked from generated code. Emission order: by
    * start position, then by length — irrelevant to the aggregating
    * consumers, but deterministic. */
  def grams(s: UTF8String, minN: Int, maxN: Int): GenericArrayData = {
    val bytes = s.getBytes // materialize once; grams become views on it
    val nb = bytes.length
    // code-point start offsets (ASCII fast path: offsets(i) = i)
    val starts = new Array[Int](nb + 1)
    var nChars = 0
    var off = 0
    while (off < nb) {
      starts(nChars) = off
      val b = bytes(off)
      off += (if ((b & 0x80) == 0) 1
              else if ((b & 0xE0) == 0xC0) 2
              else if ((b & 0xF0) == 0xE0) 3
              else 4)
      nChars += 1
    }
    starts(nChars) = nb
    if (nChars < minN) return new GenericArrayData(new Array[Any](0))
    // count: sum over i of max(0, min(maxN, nChars-i) - minN + 1)
    var total = 0
    var i = 0
    while (i < nChars) {
      val hi = math.min(maxN, nChars - i)
      if (hi >= minN) total += hi - minN + 1
      i += 1
    }
    val out = new Array[Any](total)
    var k = 0
    i = 0
    while (i <= nChars - minN) {
      val hi = math.min(maxN, nChars - i)
      var n = minN
      while (n <= hi) {
        out(k) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
        k += 1
        n += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(c: Column, minN: Int, maxN: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharNgrams(org.apache.spark.sql.GraftColumnBridge.expression(c), minN, maxN))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** BOUNDED top-k-min aggregate — a custom Catalyst
  * `TypedImperativeAggregate` whose per-group state is a fixed k-slot
  * heap (k longs), never a growing list. This is the aggregation
  * primitive the dedup/posting queries need that Spark lacks:
  * `collect_list` buffers the whole group (the round-4 hot-key OOM
  * finding), a rank window buffers/spills the whole partition — a
  * bounded heap does neither, and it combines map-side like any
  * partial aggregate, so a key appearing in every row of a 100-TB
  * corpus still costs exactly k longs per task.
  *
  * Returns the k smallest child values per group, ascending
  * (duplicates kept). Nulls ignored; an all-null/empty group yields an
  * empty array. */
case class TopKMinLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMinLongs.Heap] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): TopKMinLongs.Heap =
    new TopKMinLongs.Heap(k)

  override def update(buf: TopKMinLongs.Heap, input: InternalRow): TopKMinLongs.Heap = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKMinLongs.Heap, b2: TopKMinLongs.Heap): TopKMinLongs.Heap = {
    var i = 0
    while (i < b2.size) { b1.insert(b2.slots(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKMinLongs.Heap): Any =
    new GenericArrayData(buf.sortedAscending)

  override def serialize(buf: TopKMinLongs.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.slots(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKMinLongs.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKMinLongs.Heap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMinLongs =
    copy(child = newChild)
}

object TopKMinLongs {

  /** Fixed-capacity BINARY MAX-heap over the k smallest values seen:
    * the root is the largest survivor, so an incoming value replaces
    * it iff smaller. All state = one k-slot long array + a size. */
  final class Heap(k: Int) {
    val slots = new Array[Long](k)
    var size = 0

    def insert(v: Long): Unit = {
      if (size < k) {
        slots(size) = v
        size += 1
        var i = size - 1 // sift up
        while (i > 0 && slots((i - 1) / 2) < slots(i)) {
          val p = (i - 1) / 2
          val t = slots(p); slots(p) = slots(i); slots(i) = t
          i = p
        }
      } else if (v < slots(0)) {
        slots(0) = v // replace the max, sift down
        var i = 0
        var continue = true
        while (continue) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && slots(l) > slots(m)) m = l
          if (r < size && slots(r) > slots(m)) m = r
          if (m == i) continue = false
          else {
            val t = slots(m); slots(m) = slots(i); slots(i) = t
            i = m
          }
        }
      }
    }

    def sortedAscending: Array[Long] = {
      val out = java.util.Arrays.copyOf(slots, size)
      java.util.Arrays.sort(out)
      out
    }
  }

  /** Column-API entry: k smallest values of `c` per group, ascending. */
  def topKMin(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TopKMinLongs(org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}

package graft.wfst

/** Minimal open-addressing Long->Int hash map for the composition
  * hot path (avoids boxing of scala.collection HashMap). Keys must not
  * be Long.MinValue (used as the empty marker). */
final class LongIntMap(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2)
  private var keys = Array.fill[Long](cap)(Long.MinValue)
  private var vals = new Array[Int](cap)
  private var n = 0

  private def idx(k: Long): Int = {
    var h = (k ^ (k >>> 32)).toInt * 0x9e3779b9
    h ^= (h >>> 16)
    var i = h & (cap - 1)
    while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  def getOrElse(k: Long, default: Int): Int = {
    val i = idx(k)
    if (keys(i) == k) vals(i) else default
  }

  def put(k: Long, v: Int): Unit = {
    val i = idx(k)
    if (keys(i) != k) {
      keys(i) = k; vals(i) = v; n += 1
      if (n * 2 > cap) grow()
    } else vals(i) = v
  }

  def size: Int = n

  /** Reset to empty, KEEPING the grown capacity (scratch reuse across
    * compose calls: one fill instead of a fresh allocation + GC). */
  def clear(): Unit = {
    if (n > 0) { java.util.Arrays.fill(keys, Long.MinValue); n = 0 }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1
    keys = Array.fill[Long](cap)(Long.MinValue)
    vals = new Array[Int](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ok(i) != Long.MinValue) put(ok(i), ov(i))
      i += 1
    }
  }
}

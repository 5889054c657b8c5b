package graft.wfst

/** Minimal open-addressing Long->Int hash map for the composition
  * hot path (avoids boxing of scala.collection HashMap).
  *
  * Slots are validated by an epoch stamp instead of a sentinel key, so
  * `clear()` is O(1) (bump the epoch) — the map is thread-local scratch
  * cleared once per compose call, and a single large window would
  * otherwise condemn every later (tiny) compose on the thread to a full
  * array fill of the grown capacity. */
final class LongIntMap(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2)
  private var keys = new Array[Long](cap)
  private var vals = new Array[Int](cap)
  private var stamps = new Array[Int](cap) // slot live iff stamps(i) == epoch
  private var epoch = 1
  private var n = 0

  private def idx(k: Long): Int = {
    var h = (k ^ (k >>> 32)).toInt * 0x9e3779b9
    h ^= (h >>> 16)
    var i = h & (cap - 1)
    while (stamps(i) == epoch && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  def getOrElse(k: Long, default: Int): Int = {
    val i = idx(k)
    if (stamps(i) == epoch && keys(i) == k) vals(i) else default
  }

  def put(k: Long, v: Int): Unit = {
    val i = idx(k)
    if (!(stamps(i) == epoch && keys(i) == k)) {
      keys(i) = k; vals(i) = v; stamps(i) = epoch; n += 1
      if (n * 2 > cap) grow()
    } else vals(i) = v
  }

  def size: Int = n

  /** O(1) reset, keeping capacity (epoch bump; wrap-safe). */
  def clear(): Unit = {
    n = 0
    if (epoch == Int.MaxValue) {
      java.util.Arrays.fill(stamps, 0)
      epoch = 1
    } else epoch += 1
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val os = stamps; val oe = epoch
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Int](cap)
    stamps = new Array[Int](cap)
    epoch = 1
    n = 0
    var i = 0
    while (i < ok.length) {
      if (os(i) == oe) put(ok(i), ov(i))
      i += 1
    }
  }
}

package graft.queries

/** Shared MinHash definitions — 64 permutations folded into 16 bands x
  * 4 rows — emitted as IDENTICAL SQL fragments for Spark (`expr`) and
  * the DuckDB oracle, so both engines compute the same signatures by
  * construction.
  *
  * The round-4 signature was 4 bands x r=1 row (disjoint 32-bit md5
  * slices): a band collision there means ONE shared min-shingle, which
  * is so loose that minhash edges had to be excluded from group
  * resolution (measured 486/500 docs false-chaining at sf0.01). With
  * b=16, r=4 a band collides with probability J^4 per band
  * (1-(1-J^4)^16 overall — the classic S-curve centered near J~0.5),
  * so band buckets approximate a Jaccard threshold and verified
  * candidates can re-enter group resolution.
  *
  * Permutations are affine maps over a 31-bit universe:
  * perm_i(h) = (A_i * h + B_i) mod P, P = 2^31 - 1, h = the shingle's
  * 60-bit md5 prefix reduced mod P. All arithmetic stays below 2^62,
  * so it is overflow-free under ANSI mode in Spark AND exact in DuckDB
  * BIGINTs — no dialect-specific hashing anywhere (the one dialect
  * difference, md5-prefix extraction, is the caller's). Band values
  * fold the 4 row-mins with a polynomial hash mod P (31-bit buckets;
  * fold-collision probability ~2^-31 per pair-band, negligible against
  * the downstream verification). */
object MinHashDefs {
  val NumPerms = 64
  val Bands = 16
  val Rows = 4
  /** Modulus for permutations and the band fold: 2^31 - 1 (prime). */
  val P = 2147483647L
  /** Band-fold polynomial multiplier. */
  val FoldMult = 1000003L

  // splitmix64-style finalizer (same mixer family as TextOps
  // .lshPlaneSign) — deterministic, seedless constants
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Per-permutation multipliers (1 <= A < P) and offsets (0 <= B < P). */
  val A: IndexedSeq[Long] =
    (0 until NumPerms).map(i => Math.floorMod(mix(2L * i), P - 1) + 1)
  val B: IndexedSeq[Long] =
    (0 until NumPerms).map(i => Math.floorMod(mix(2L * i + 1), P))

  /** perm_i over a column holding h (0 <= h < P). Dialect-neutral. */
  def permSql(i: Int, hCol: String): String =
    s"((${A(i)} * $hCol + ${B(i)}) % $P)"

  /** The 64 per-doc min aggregates `min(perm_i(h)) AS m_i`. */
  def minAggSqls(hCol: String): Seq[String] =
    (0 until NumPerms).map(i => s"min(${permSql(i, hCol)}) AS m$i")

  /** Polynomial fold of band j's 4 row-min columns into one band value. */
  def bandFoldSql(j: Int): String =
    (0 until Rows).map(k => s"m${Rows * j + k}")
      .reduceLeft((acc, c) => s"((($acc) * $FoldMult + $c) % $P)")

  /** Spark `stack` projection: (band, sig) long-form rows per doc. */
  def stackSparkSql: String = {
    val parts = (0 until Bands).map(j => s"$j, ${bandFoldSql(j)}")
    s"stack($Bands, ${parts.mkString(", ")}) AS (band, sig)"
  }

  /** DuckDB band rows via a CASE over an unnested band index. */
  def bandCaseDuckSql(bandCol: String): String = {
    val whens = (0 until Bands)
      .map(j => s"WHEN $j THEN ${bandFoldSql(j)}").mkString(" ")
    s"CASE $bandCol $whens END"
  }

  /** Signature agreement count between two m0..m63 row prefixes —
    * sum_i [a.m_i = b.m_i]; agreement/64 estimates Jaccard. */
  def agreementSql(a: String, b: String): String =
    (0 until NumPerms)
      .map(i => s"(CASE WHEN $a.m$i = $b.m$i THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Verification threshold: estimated Jaccard >= 0.5 (32/64 perms). */
  val VerifyAgreement = 32

  // ---------------------------------------------------------------------
  // Local (non-SQL) signature path — used by the STREAMING near-dup
  // operator. Produces values IDENTICAL to the SQL pipeline by
  // construction: code-point 8-gram shingles (CharNgrams.grams(8, 8)
  // semantics), md5-hex 15-char prefix (HexPrefix64 semantics), the
  // same affine permutations and band folds. Equality is spec-pinned
  // (StreamingSpec: streamed mins == minhashMins SQL mins).

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(sh) as a non-negative long — the local
    * twin of hexPrefix64(md5(sh)): 7 full bytes + the high nibble of
    * byte 7 (60 bits). */
  def hash60(sh: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var i = 0
    while (i < 7) { out = (out << 8) | (d(i) & 0xffL); i += 1 }
    (out << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Code-point 8-grams, step 1 (CharNgrams.grams(minN=8, maxN=8)). */
  def shingles8(text: String): Iterator[String] = {
    val cps = text.codePoints().toArray
    if (cps.length < 8) Iterator.empty
    else (0 to cps.length - 8).iterator.map(i => new String(cps, i, 8))
  }

  /** The 64 per-doc row-mins; None when the text yields no shingle
    * (the SQL path's length >= 8 filter). */
  def minsOf(text: String): Option[Array[Long]] = {
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var any = false
    shingles8(text).foreach { sh =>
      any = true
      val h = hash60(sh) % P
      var i = 0
      while (i < NumPerms) {
        val v = (A(i) * h + B(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    if (any) Some(mins) else None
  }

  /** The 16 band values folded from the row-mins (bandFoldSql twin). */
  def bandsOf(mins: Array[Long]): Array[Long] =
    Array.tabulate(Bands) { j =>
      var v = mins(Rows * j)
      var k = 1
      while (k < Rows) { v = (v * FoldMult + mins(Rows * j + k)) % P; k += 1 }
      v
    }

  /** Signature agreement (agreementSql twin). */
  def agreement(a: Array[Long], b: Array[Long]): Int = {
    var n = 0
    var i = 0
    while (i < NumPerms) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }
}

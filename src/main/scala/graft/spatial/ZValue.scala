package graft.spatial

/** Morton (Z-order) curve: bit-interleaves n non-negative Int coordinates
  * into a single Long (reference: spatial/ZValue.scala:26-63).
  *
  * Used to linearise n-D space so that range partitioning on the z-value
  * approximates spatial partitioning — the backbone of the z-order index
  * and the approximate zKNN join. Capacity: dims * bitsPerDim must be
  * <= 62 to stay within a positive Long.
  */
object ZValue {

  /** Interleave the low `bits` bits of each coordinate. Coordinate i's
    * bit b lands at position `b * n + i`. */
  def interleave(coords: Array[Int], bits: Int): Long = {
    val n = coords.length
    require(n * bits <= 62, s"z-value overflow: $n dims x $bits bits")
    var z = 0L
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < n) {
        if (((coords(i) >> b) & 1) == 1) z |= 1L << (b * n + i)
        i += 1
      }
      b += 1
    }
    z
  }

  /** Inverse of [[interleave]]. */
  def deinterleave(z: Long, n: Int, bits: Int): Array[Int] = {
    val out = new Array[Int](n)
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < n) {
        if (((z >> (b * n + i)) & 1L) == 1L) out(i) |= 1 << b
        i += 1
      }
      b += 1
    }
    out
  }

  /** Default 21-bit-per-dim 2-D curve (fits 2*21=42 bits). */
  def apply(x: Int, y: Int): Long = interleave(Array(x, y), 21)

  /** Map a double in [lo, hi] to a `bits`-bit cell ordinate. Values
    * outside the range clamp to the boundary cells, so a z-curve built
    * from sampled bounds stays total. */
  def quantize(v: Double, lo: Double, hi: Double, bits: Int): Int = {
    // Int cell arithmetic: bits > 30 would overflow `1 << bits` silently
    // and collapse the curve to cell 0 (interleave alone allows up to 62)
    require(bits >= 1 && bits <= 30, s"quantize bits must be in [1, 30], got $bits")
    val cells = (1 << bits) - 1
    if (hi <= lo) return 0
    val t = (v - lo) / (hi - lo)
    val q = (t * cells).toInt
    if (q < 0) 0 else if (q > cells) cells else q
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight per-row kernels over Catalyst `ArrayData`, shared by interpreted
  * `eval` and generated code (whole-stage codegen emits a static call into
  * this object, keeping the hot loop JIT-friendly with zero boxing).
  *
  * These back the embedding-similarity surface (brute-force and LSH ANN,
  * embedding near-dup) — the n-dimensional analogue of the reference's
  * point kernels (reference: spatial/Point.scala:52-58 Euclidean minDist).
  */
object VectorKernels {

  @inline private def sameDim(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    // a silent min() here would score a vector as identical to its own
    // prefix — a schema mix-up (mismatched embedding models) must be loud
    require(n == b.numElements(),
      s"vector dimension mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Cosine similarity of two float vectors; 0.0 when either norm is 0. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Euclidean norm of one float vector — EXACTLY cosineF's `sqrt(na)`
    * factor (same index-order accumulation over the same double casts),
    * so `dotF(a,b) / (normF(a) * normF(b))` is bit-identical to
    * `cosineF(a,b)` wherever the norms are nonzero. Exists so pair joins
    * can hoist the two norm passes out of the n^2 loop (1/3 of cosineF's
    * per-pair arithmetic each) without perturbing oracle parity. */
  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    math.sqrt(na)
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def l2F(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Sign-bit sketch: dot the vector against `nPlanes` deterministic
    * pseudo-random hyperplanes (seeded by plane index) and pack the signs
    * into a Long — random-hyperplane LSH for cosine similarity. */
  def hyperplaneSketch(a: ArrayData, nPlanes: Int, seed: Long): Long = {
    require(nPlanes <= 64)
    val n = a.numElements()
    var sketch = 0L
    var p = 0
    while (p < nPlanes) {
      // xorshift64* stream per (seed, plane, dim) — deterministic, cheap.
      var dot = 0.0
      var i = 0
      while (i < n) {
        var h = seed + p * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        // map to (-1, 1): use the high bit for sign, rest for magnitude
        val r = (h >> 11).toDouble / (1L << 52).toDouble // in (-1, 1)
        dot += a.getFloat(i).toDouble * r
        i += 1
      }
      if (dot >= 0) sketch |= 1L << p
      p += 1
    }
    sketch
  }
}

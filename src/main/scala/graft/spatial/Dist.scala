package graft.spatial

/** Distance kernels shared by all shapes (reference: spatial/Dist.scala:26-33
  * plus the per-shape minDist implementations, e.g. spatial/Point.scala:52-58,
  * spatial/MBR.scala:36-122, spatial/LineSegment.scala:107-118).
  *
  * All kernels are Euclidean, branch-light, and allocation-free on the hot
  * path so they can be called per-row from Catalyst expressions and from
  * per-partition join loops.
  */
object Dist {

  def pointToPoint(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, s"dim mismatch: ${a.length} vs ${b.length}")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i) - b(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Distance from a point to the nearest face of a box (0 inside). */
  def pointToMBR(p: Array[Double], b: MBR): Double = {
    require(p.length == b.dimensions)
    var acc = 0.0
    var i = 0
    while (i < p.length) {
      val lo = b.low.coord(i)
      val hi = b.high.coord(i)
      val d = if (p(i) < lo) lo - p(i) else if (p(i) > hi) p(i) - hi else 0.0
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def pointToCircle(p: Array[Double], c: Circle): Double =
    math.max(0.0, pointToPoint(p, c.center.coord) - c.radius)

  /** Min distance between two boxes (0 if they overlap). */
  def mbrToMBR(a: MBR, b: MBR): Double = {
    require(a.dimensions == b.dimensions)
    var acc = 0.0
    var i = 0
    while (i < a.dimensions) {
      val d =
        if (a.high.coord(i) < b.low.coord(i)) b.low.coord(i) - a.high.coord(i)
        else if (b.high.coord(i) < a.low.coord(i)) a.low.coord(i) - b.high.coord(i)
        else 0.0
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Max distance from a point to a box — the "furthest corner" bound used
    * for kNN pruning (reference: spatial/Dist.scala:26-33). */
  def furthest(p: Point, b: MBR): Double = b.maxDist(p)

  /** Point-to-segment projection distance
    * (reference: spatial/LineSegment.scala:107-118). */
  def pointToSegment(p: Point, s: LineSegment): Double = {
    val px = p.coord(0); val py = p.coord(1)
    val ax = s.start.coord(0); val ay = s.start.coord(1)
    val bx = s.end.coord(0); val by = s.end.coord(1)
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0.0) return math.hypot(px - ax, py - ay)
    val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    math.hypot(px - (ax + t * dx), py - (ay + t * dy))
  }

  def segmentToSegment(a: LineSegment, b: LineSegment): Double =
    if (a.intersects(b)) 0.0
    else Seq(
      pointToSegment(a.start, b), pointToSegment(a.end, b),
      pointToSegment(b.start, a), pointToSegment(b.end, a)).min

  def segmentToMBR(s: LineSegment, b: MBR): Double = {
    if (s.intersects(b)) return 0.0
    val corners = Array(
      Point(b.low.coord(0), b.low.coord(1)),
      Point(b.high.coord(0), b.low.coord(1)),
      Point(b.high.coord(0), b.high.coord(1)),
      Point(b.low.coord(0), b.high.coord(1)))
    var best = Double.MaxValue
    var i = 0
    while (i < 4) {
      val edge = LineSegment(corners(i), corners((i + 1) % 4))
      val d = segmentToSegment(s, edge)
      if (d < best) best = d
      i += 1
    }
    best
  }

  /** Sign of the cross product (b-a) × (c-a): >0 counter-clockwise,
    * <0 clockwise, 0 collinear. */
  def orientation(a: Point, b: Point, c: Point): Double = {
    val v = (b.coord(0) - a.coord(0)) * (c.coord(1) - a.coord(1)) -
            (b.coord(1) - a.coord(1)) * (c.coord(0) - a.coord(0))
    if (v > 0) 1.0 else if (v < 0) -1.0 else 0.0
  }

  /** Whether collinear point p lies within segment [a, b]'s bounding box. */
  def onSegment(a: Point, b: Point, p: Point): Boolean =
    math.min(a.coord(0), b.coord(0)) <= p.coord(0) &&
    p.coord(0) <= math.max(a.coord(0), b.coord(0)) &&
    math.min(a.coord(1), b.coord(1)) <= p.coord(1) &&
    p.coord(1) <= math.max(a.coord(1), b.coord(1))

  /** Boundary-inclusive even-odd point-in-polygon over the flattened
    * vertex ring [x0,y0,x1,y1,...]. Allocation-free — this is the kernel
    * behind the codegen'd PointInPolygon expression, so it runs per row
    * inside whole-stage codegen. */
  def pointInPolygon(x: Double, y: Double, verts: Array[Double]): Boolean = {
    val n = verts.length / 2
    // boundary pass: on any edge counts as inside
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = verts(2 * i); val yi = verts(2 * i + 1)
      val xj = verts(2 * j); val yj = verts(2 * j + 1)
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (cross == 0.0 &&
          math.min(xi, xj) <= x && x <= math.max(xi, xj) &&
          math.min(yi, yj) <= y && y <= math.max(yi, yj)) return true
      j = i; i += 1
    }
    // even-odd crossing count
    var inside = false
    i = 0; j = n - 1
    while (i < n) {
      val xi = verts(2 * i); val yi = verts(2 * i + 1)
      val xj = verts(2 * j); val yj = verts(2 * j + 1)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Ring test at an offset into a shared flat array (no slicing, no
    * allocation — callable per row from generated code): 0 = outside,
    * 1 = strictly inside, 2 = on the ring boundary. `off` is the array
    * index of the ring's first x; `n` its vertex count. Same even-odd +
    * boundary arithmetic as [[pointInPolygon]]. */
  def ringStatus(x: Double, y: Double, verts: Array[Double],
                 off: Int, n: Int): Int = {
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = verts(off + 2 * i); val yi = verts(off + 2 * i + 1)
      val xj = verts(off + 2 * j); val yj = verts(off + 2 * j + 1)
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (cross == 0.0 &&
          math.min(xi, xj) <= x && x <= math.max(xi, xj) &&
          math.min(yi, yj) <= y && y <= math.max(yi, yj)) return 2
      j = i; i += 1
    }
    var inside = false
    i = 0; j = n - 1
    while (i < n) {
      val xi = verts(off + 2 * i); val yi = verts(off + 2 * i + 1)
      val xj = verts(off + 2 * j); val yj = verts(off + 2 * j + 1)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    if (inside) 1 else 0
  }

  /** Boundary-inclusive containment for a polygon with interior rings
    * (holes), over the multi-ring flat encoding
    * `[nRings, n0, x,y...(n0 pairs), n1, x,y..., ...]` (ring 0 = outer
    * shell, rest = holes; see `Polygon.flatRings`). JTS/OGC semantics:
    * every ring's boundary BELONGS to the polygon — a point strictly
    * inside a hole is out, a point ON a hole's ring is in. Kernel
    * behind the codegen'd [[graft.functions.PointInPolygon]]; offset
    * walk, zero allocation. */
  def pointInPolygonRings(x: Double, y: Double, rings: Array[Double]): Boolean = {
    val nRings = rings(0).toInt
    var off = 1
    val n0 = rings(off).toInt
    off += 1
    val outer = ringStatus(x, y, rings, off, n0)
    if (outer == 0) return false
    if (outer == 2) return true // on the shell: in, regardless of holes
    off += 2 * n0
    var r = 1
    while (r < nRings) {
      val nh = rings(off).toInt
      off += 1
      val st = ringStatus(x, y, rings, off, nh)
      if (st == 1) return false // strictly inside a hole
      if (st == 2) return true  // on a hole boundary: still the polygon
      off += 2 * nh
      r += 1
    }
    true
  }
}

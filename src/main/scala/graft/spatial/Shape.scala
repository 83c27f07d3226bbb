package graft.spatial

/** Geometry ADT for multi-dimensional spatial analytics.
  *
  * Semantics mirror the reference engine's shape contract
  * (reference: spatial/Shape.scala:28-36): every shape knows its
  * dimensionality, its minimum bounding rectangle, its minimum distance
  * to any other shape, and whether it intersects any other shape.
  *
  * Unlike the reference (which dispatches shape pairs through an n²
  * pattern-match matrix, e.g. spatial/Point.scala:34-50), we centralise
  * pairwise dispatch in [[Dist]] so each kernel is written once.
  *
  * These classes are plain Scala values — on the Spark side, points are
  * represented as plain numeric columns (or `array<double>`), and these
  * kernels back custom Catalyst expressions and partitioners. They are
  * deliberately allocation-light: hot paths take `Array[Double]` directly.
  */
sealed trait Shape extends Serializable {
  def dimensions: Int
  def mbr: MBR
  def minDist(other: Shape): Double
  def intersects(other: Shape): Boolean
}

/** An n-dimensional point (reference: spatial/Point.scala:28). */
final case class Point(coord: Array[Double]) extends Shape {
  require(coord.nonEmpty, "point needs at least one coordinate")

  override def dimensions: Int = coord.length
  override def mbr: MBR = MBR(this, this)

  override def minDist(other: Shape): Double = other match {
    case p: Point        => Dist.pointToPoint(coord, p.coord)
    case b: MBR          => Dist.pointToMBR(coord, b)
    case c: Circle       => Dist.pointToCircle(coord, c)
    case s: LineSegment  => Dist.pointToSegment(this, s)
    case g: Polygon      => g.minDist(this)
    case m: ShapeCollection => m.minDist(this)
  }

  override def intersects(other: Shape): Boolean = other match {
    case p: Point       => sameAs(p)
    case b: MBR         => b.contains(this)
    case c: Circle      => Dist.pointToPoint(coord, c.center.coord) <= c.radius
    case s: LineSegment => Dist.pointToSegment(this, s) == 0.0
    case g: Polygon     => g.contains(this)
    case m: ShapeCollection => m.contains(this)
  }

  def sameAs(p: Point): Boolean =
    dimensions == p.dimensions && {
      // NaN-reflexive (matches Arrays.hashCode) so equals/hashCode stay
      // contract-consistent even for degenerate coordinates
      var i = 0
      while (i < coord.length &&
        (coord(i) == p.coord(i) || (coord(i) != coord(i) && p.coord(i) != p.coord(i))))
        i += 1
      i == coord.length
    }

  /** Coordinate-wise dominance (reference: spatial/Point.scala:71-75). */
  def <=(p: Point): Boolean = {
    require(dimensions == p.dimensions)
    var i = 0
    while (i < coord.length && coord(i) <= p.coord(i)) i += 1
    i == coord.length
  }

  def shift(d: Double): Point = Point(coord.map(_ + d))

  // Array fields break case-class equality; define value equality explicitly.
  override def equals(o: Any): Boolean = o match {
    case p: Point => sameAs(p)
    case _        => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(coord)
  override def toString: String = coord.mkString("Point(", ",", ")")
}

object Point {
  def apply(xs: Double*): Point = Point(xs.toArray)
}

/** An n-dimensional axis-aligned box (reference: spatial/MBR.scala:28-122). */
final case class MBR(low: Point, high: Point) extends Shape {
  require(low.dimensions == high.dimensions, "MBR corner dims differ")
  require(low <= high, s"MBR low must dominate-below high: $low vs $high")

  override def dimensions: Int = low.dimensions
  override def mbr: MBR = this

  def contains(p: Point): Boolean = {
    require(p.dimensions == dimensions)
    var i = 0
    while (i < dimensions &&
      low.coord(i) <= p.coord(i) && p.coord(i) <= high.coord(i)) i += 1
    i == dimensions
  }

  def intersects(b: MBR): Boolean = {
    require(b.dimensions == dimensions)
    var i = 0
    while (i < dimensions &&
      low.coord(i) <= b.high.coord(i) && high.coord(i) >= b.low.coord(i)) i += 1
    i == dimensions
  }

  override def intersects(other: Shape): Boolean = other match {
    case p: Point       => contains(p)
    case b: MBR         => intersects(b)
    case c: Circle      => Dist.pointToMBR(c.center.coord, this) <= c.radius
    case s: LineSegment => s.intersects(this)
    case g: Polygon     => g.intersects(this)
    case m: ShapeCollection => m.intersects(this)
  }

  override def minDist(other: Shape): Double = other match {
    case p: Point       => Dist.pointToMBR(p.coord, this)
    case b: MBR         => Dist.mbrToMBR(this, b)
    case c: Circle      => math.max(0.0, Dist.pointToMBR(c.center.coord, this) - c.radius)
    case s: LineSegment => Dist.segmentToMBR(s, this)
    case g: Polygon     => g.minDist(this)
    case m: ShapeCollection => m.minDist(this)
  }

  /** Max distance from a point to any corner of this box
    * (reference: spatial/MBR.scala, used for kNN pruning bounds). */
  def maxDist(p: Point): Double = {
    require(p.dimensions == dimensions)
    var acc = 0.0
    var i = 0
    while (i < dimensions) {
      val d = math.max(math.abs(p.coord(i) - low.coord(i)),
                       math.abs(p.coord(i) - high.coord(i)))
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def area: Double = {
    var a = 1.0
    var i = 0
    while (i < dimensions) { a *= high.coord(i) - low.coord(i); i += 1 }
    a
  }

  /** Fraction of this box's volume covered by `query` ∩ this — the
    * selectivity estimate used by index scans
    * (reference: spatial/MBR.scala:110-116). */
  def calcRatio(query: MBR): Double = {
    if (!intersects(query)) return 0.0
    var ratio = 1.0
    var i = 0
    while (i < dimensions) {
      val lo = math.max(low.coord(i), query.low.coord(i))
      val hi = math.min(high.coord(i), query.high.coord(i))
      val span = high.coord(i) - low.coord(i)
      ratio *= (if (span == 0.0) 1.0 else (hi - lo) / span)
      i += 1
    }
    ratio
  }

  /** Smallest box containing both. */
  def union(b: MBR): MBR = {
    require(b.dimensions == dimensions)
    val lo = Array.tabulate(dimensions)(i => math.min(low.coord(i), b.low.coord(i)))
    val hi = Array.tabulate(dimensions)(i => math.max(high.coord(i), b.high.coord(i)))
    MBR(Point(lo), Point(hi))
  }

  def centroid: Point =
    Point(Array.tabulate(dimensions)(i => (low.coord(i) + high.coord(i)) / 2.0))
}

object MBR {
  /** Bounding box of a non-empty collection of points. */
  def ofPoints(pts: Iterable[Point]): MBR = {
    val it = pts.iterator
    val first = it.next()
    val lo = first.coord.clone()
    val hi = first.coord.clone()
    while (it.hasNext) {
      val c = it.next().coord
      var i = 0
      while (i < lo.length) {
        if (c(i) < lo(i)) lo(i) = c(i)
        if (c(i) > hi(i)) hi(i) = c(i)
        i += 1
      }
    }
    MBR(Point(lo), Point(hi))
  }
}

/** An n-dimensional ball (reference: spatial/Circle.scala:28). */
final case class Circle(center: Point, radius: Double) extends Shape {
  require(radius >= 0.0, "radius must be non-negative")

  override def dimensions: Int = center.dimensions

  override def mbr: MBR =
    MBR(center.shift(-radius), center.shift(radius))

  override def minDist(other: Shape): Double = other match {
    case p: Point       => Dist.pointToCircle(p.coord, this)
    case b: MBR         => math.max(0.0, Dist.pointToMBR(center.coord, b) - radius)
    case c: Circle      =>
      math.max(0.0, Dist.pointToPoint(center.coord, c.center.coord) - radius - c.radius)
    case s: LineSegment => math.max(0.0, Dist.pointToSegment(center, s) - radius)
    case g: Polygon     => math.max(0.0, g.minDist(center) - radius)
    case m: ShapeCollection => m.minDist(this)
  }

  override def intersects(other: Shape): Boolean = minDist(other) <= 0.0
}

/** A 2-D line segment (reference: spatial/LineSegment.scala:29-31). */
final case class LineSegment(start: Point, end: Point) extends Shape {
  require(start.dimensions == 2 && end.dimensions == 2, "LineSegment is 2-D only")

  override def dimensions: Int = 2

  override def mbr: MBR = MBR(
    Point(math.min(start.coord(0), end.coord(0)), math.min(start.coord(1), end.coord(1))),
    Point(math.max(start.coord(0), end.coord(0)), math.max(start.coord(1), end.coord(1))))

  /** Orientation-test segment intersection
    * (reference: spatial/LineSegment.scala:60-97). */
  def intersects(s: LineSegment): Boolean = {
    val d1 = Dist.orientation(s.start, s.end, start)
    val d2 = Dist.orientation(s.start, s.end, end)
    val d3 = Dist.orientation(start, end, s.start)
    val d4 = Dist.orientation(start, end, s.end)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && Dist.onSegment(s.start, s.end, start)) true
    else if (d2 == 0 && Dist.onSegment(s.start, s.end, end)) true
    else if (d3 == 0 && Dist.onSegment(start, end, s.start)) true
    else if (d4 == 0 && Dist.onSegment(start, end, s.end)) true
    else false
  }

  def intersects(b: MBR): Boolean = {
    if (b.contains(start) || b.contains(end)) return true
    // Otherwise the segment must cross one of the box's four edges.
    val corners = Array(
      Point(b.low.coord(0), b.low.coord(1)),
      Point(b.high.coord(0), b.low.coord(1)),
      Point(b.high.coord(0), b.high.coord(1)),
      Point(b.low.coord(0), b.high.coord(1)))
    var i = 0
    while (i < 4) {
      if (intersects(LineSegment(corners(i), corners((i + 1) % 4)))) return true
      i += 1
    }
    false
  }

  override def intersects(other: Shape): Boolean = other match {
    case p: Point       => Dist.pointToSegment(p, this) == 0.0
    case b: MBR         => intersects(b)
    case c: Circle      => Dist.pointToSegment(c.center, this) <= c.radius
    case s: LineSegment => intersects(s)
    case g: Polygon     => g.intersects(this)
    case m: ShapeCollection => m.intersects(this)
  }

  override def minDist(other: Shape): Double = other match {
    case p: Point       => Dist.pointToSegment(p, this)
    case b: MBR         => Dist.segmentToMBR(this, b)
    case c: Circle      => math.max(0.0, Dist.pointToSegment(c.center, this) - c.radius)
    case s: LineSegment => Dist.segmentToSegment(this, s)
    case g: Polygon     => g.minDist(this)
    case m: ShapeCollection => m.minDist(this)
  }
}

/** A 2-D polygon given as its outer vertex ring (closing edge implied)
  * plus optional interior rings — holes (lakes in parcels, courtyards
  * in footprints). The reference wraps JTS for this (reference:
  * spatial/Polygon.scala:32-38, JTS 1.14 via build.sbt:31), which
  * carries interior rings through WKT/WKB (reference:
  * spatial/Polygon.scala:106-124); JTS isn't available offline, so the
  * 2-D kernels are implemented directly: boundary-inclusive even-odd
  * ray casting per ring (every ring's boundary BELONGS to the polygon,
  * the JTS/OGC convention), edge sweeps over ALL rings for
  * distance/intersection. Flat-array kernel variants in
  * [[Dist.pointInPolygon]] / [[Dist.pointInPolygonRings]] back the
  * codegen'd Catalyst expression. Rings are trusted as given (outer
  * contains holes, holes disjoint) — the OGC validity contract;
  * validation is an ingest-time concern, not a per-row one. */
final case class Polygon(vertices: Array[Point],
                         holes: Array[Array[Point]] = Array.empty) extends Shape {
  require(vertices.length >= 3, "polygon needs >= 3 vertices")
  require(vertices.forall(_.dimensions == 2), "Polygon is 2-D only")
  require(holes.forall(h => h.length >= 3 && h.forall(_.dimensions == 2)),
    "each hole needs >= 3 2-D vertices")

  override def dimensions: Int = 2
  override lazy val mbr: MBR = MBR.ofPoints(vertices) // holes are interior

  /** Outer vertex ring flattened to [x0,y0,x1,y1,...] for the column
    * kernel (hole-free polygons only — holed ones use [[flatRings]]). */
  def flat: Array[Double] = vertices.flatMap(_.coord)

  /** All rings in the multi-ring flat encoding
    * `[nRings, n0, x,y...(outer), n1, x,y...(hole), ...]` — the layout
    * [[Dist.pointInPolygonRings]] walks and `ShapeCodec` tag 5 stores. */
  lazy val flatRings: Array[Double] = {
    val b = Array.newBuilder[Double]
    b += (1 + holes.length).toDouble
    (vertices +: holes.toSeq).foreach { ring =>
      b += ring.length.toDouble
      ring.foreach(v => { b += v.coord(0); b += v.coord(1) })
    }
    b.result()
  }

  private def ringEdges(ring: Array[Point]): IndexedSeq[LineSegment] =
    ring.indices.map(i => LineSegment(ring(i), ring((i + 1) % ring.length)))

  lazy val edges: IndexedSeq[LineSegment] = ringEdges(vertices)

  /** Outer + hole edges: the polygon's full boundary. */
  lazy val allEdges: IndexedSeq[LineSegment] =
    if (holes.isEmpty) edges else edges ++ holes.toIndexedSeq.flatMap(ringEdges)

  /** Boundary-inclusive containment: inside the shell, not strictly
    * inside any hole (a point ON a hole's ring is still the polygon). */
  def contains(p: Point): Boolean =
    if (holes.isEmpty) Dist.pointInPolygon(p.coord(0), p.coord(1), flat)
    else Dist.pointInPolygonRings(p.coord(0), p.coord(1), flatRings)

  def minDist(p: Point): Double =
    if (contains(p)) 0.0 else allEdges.map(e => Dist.pointToSegment(p, e)).min

  override def minDist(other: Shape): Double = other match {
    case p: Point       => minDist(p)
    case b: MBR         =>
      if (intersects(b)) 0.0 else allEdges.map(e => Dist.segmentToMBR(e, b)).min
    case c: Circle      => math.max(0.0, minDist(c.center) - c.radius)
    case s: LineSegment =>
      if (intersects(s)) 0.0 else allEdges.map(e => Dist.segmentToSegment(e, s)).min
    case g: Polygon     =>
      if (intersects(g)) 0.0
      else allEdges.iterator.map(a =>
        g.allEdges.iterator.map(b => Dist.segmentToSegment(a, b)).min).min
    case m: ShapeCollection => m.minDist(this)
  }

  // Interior-overlap logic below leans on one fact: if no ring of A
  // crosses a ring of B, then each of A's rings lies entirely within a
  // single face of B's arrangement — so testing ONE vertex settles
  // containment, and a shape fully inside a hole tests false.
  override def intersects(other: Shape): Boolean = other match {
    case p: Point       => contains(p)
    case b: MBR         =>
      mbr.intersects(b) && (vertices.exists(b.contains) ||
        contains(b.low) || allEdges.exists(_.intersects(b)))
    case c: Circle      => minDist(c.center) <= c.radius
    case s: LineSegment => contains(s.start) || allEdges.exists(_.intersects(s))
    case g: Polygon     =>
      contains(g.vertices(0)) || g.contains(vertices(0)) ||
        allEdges.exists(a => g.allEdges.exists(a.intersects))
    case m: ShapeCollection => m.intersects(this)
  }

  // Array fields break case-class equality (same fix as Point).
  override def equals(o: Any): Boolean = o match {
    case p: Polygon => vertices.length == p.vertices.length &&
      vertices.indices.forall(i => vertices(i) == p.vertices(i)) &&
      holes.length == p.holes.length &&
      holes.indices.forall(i => holes(i).length == p.holes(i).length &&
        holes(i).indices.forall(j => holes(i)(j) == p.holes(i)(j)))
    case _ => false
  }
  override def hashCode(): Int = {
    val outer = vertices.foldLeft(17)((h, v) => h * 31 + v.hashCode())
    holes.foldLeft(outer)((h, ring) =>
      ring.foldLeft(h * 31 + 7)((a, v) => a * 31 + v.hashCode()))
  }
  override def toString: String = {
    val o = vertices.mkString("Polygon(", ",", "")
    if (holes.isEmpty) o + ")"
    else o + holes.map(_.mkString("[", ",", "]")).mkString(", holes=", ";", ")")
  }
}

object Polygon {
  def apply(xy: (Double, Double)*): Polygon =
    Polygon(xy.map { case (x, y) => Point(x, y) }.toArray)
}

/** A finite union of member shapes — the ADT home of OGC's Multi*
  * types (MultiPolygon archipelagos and admin boundaries, MultiPoint,
  * MultiLineString-as-segments) and GeometryCollection, which the
  * reference accepts through JTS's readers (reference:
  * spatial/Polygon.scala:106-124 — WKB/WKT parse Multi* even though
  * Simba's own `Polygon` wrapper holds a single JTS polygon). Union
  * semantics throughout: a point is IN the collection iff it is in any
  * part, `minDist` is the min over parts (0 inside any part),
  * `intersects` is any-part — exactly the OGC point-set union. Parts
  * may themselves be collections (GEOMETRYCOLLECTION nests); recursion
  * bottoms out at the leaf kinds. Parts must agree on dimensionality
  * (the per-pair kernels `require` it row-wise). */
final case class ShapeCollection(parts: Array[Shape]) extends Shape {
  require(parts.nonEmpty, "shape collection needs at least one part")
  require(parts.forall(_.dimensions == parts.head.dimensions),
    "collection parts must share dimensionality")

  override def dimensions: Int = parts.head.dimensions
  override lazy val mbr: MBR = parts.map(_.mbr).reduce(_ union _)

  override def minDist(other: Shape): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < parts.length && best > 0.0) {
      val d = parts(i).minDist(other)
      if (d < best) best = d
      i += 1
    }
    best
  }

  override def intersects(other: Shape): Boolean = parts.exists(_.intersects(other))

  def contains(p: Point): Boolean = parts.exists(_.intersects(p))

  // Array fields break case-class equality (same fix as Point).
  override def equals(o: Any): Boolean = o match {
    case c: ShapeCollection => parts.length == c.parts.length &&
      parts.indices.forall(i => parts(i) == c.parts(i))
    case _ => false
  }
  override def hashCode(): Int =
    parts.foldLeft(23)((h, p) => h * 31 + p.hashCode())
  override def toString: String =
    parts.mkString("ShapeCollection(", "; ", ")")
}

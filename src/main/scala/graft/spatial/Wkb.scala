package graft.spatial

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** WKB binary I/O for the Shape ADT — the byte-level sibling of
  * [[Wkt]] and the interoperability surface a PostGIS / GeoParquet
  * exchange actually uses (the reference routes geometry through JTS,
  * whose `WKBWriter`/`WKBReader` implement the same OGC layout;
  * reference: spatial/Polygon.scala:106-124). Hand-rolled here, zero
  * dependencies, codegen-callable kernels.
  *
  * Byte layout (OGC WKB): 1 byte order marker (0 = big-endian,
  * 1 = little-endian), uint32 geometry type, then coordinates as IEEE
  * doubles in the declared order. Output is ALWAYS little-endian (the
  * PostGIS default); input accepts either marker, like JTS.
  *
  * Mappings:
  *  - `Point` (2-D)     <-> type 1, `(x, y)` — standard
  *  - `LineSegment`     <-> type 2 (LineString) with exactly two
  *    vertices — standard bytes; longer linestrings (polylines: roads,
  *    coastlines) parse into the [[ShapeCollection]] of their
  *    consecutive segments — identical point-set union, so distance/
  *    intersection semantics are exact (as in [[Wkt]])
  *  - `ShapeCollection` <-> types 4/5/6 (MULTIPOINT / MULTILINESTRING /
  *    MULTIPOLYGON — homogeneity enforced on parse) and type 7
  *    (GEOMETRYCOLLECTION, arbitrary mix incl. nesting); each element
  *    is a complete WKB geometry with its own byte-order marker, per
  *    OGC. The reference reaches these through JTS's readers
  *    (reference: spatial/Polygon.scala:106-124)
  *  - `Polygon`         <-> type 3, closed shell ring then interior
  *    rings (holes) — standard OGC multi-ring layout, the same bytes
  *    JTS's WKBWriter emits (closing vertices emitted on output,
  *    tolerated either way on input)
  *  - `MBR` (2-D)       --> its closed-ring type-3 Polygon (WKB has no
  *    box type; the formatted box PARSES BACK as the
  *    geometrically-equal Polygon — the [[Wkt]] precedent, chosen over
  *    a lossless extension tag because box-as-polygon is what PostGIS
  *    and GeoParquet consumers can actually read)
  *  - `Circle` (2-D)    <-> type 0xF002, `(cx, cy, r)` — NON-STANDARD
  *    extension: WKB has no circle type, and 0xF002 sits far outside
  *    the OGC/ISO numbering (1-17 plus the +1000/+2000/+3000 Z/M/ZM
  *    bands), so a standard reader fails fast on the unknown type
  *    instead of mis-parsing. Flagged exactly like Wkt's `CIRCLE (...)`
  *  - n-D points/boxes/circles have no standard WKB form -> error
  *    (use the struct codec or WKT, which carry any dimension)
  *
  * Doubles are written bit-exactly (`doubleToRawLongBits` through the
  * buffer), so `parse(format(s))` is numerically exact — stronger than
  * WKT's shortest-decimal round-trip, which is exact too but via
  * string parsing. Parse failures throw `IllegalArgumentException`
  * naming the offending bytes' hex prefix — strict like JTS, no silent
  * nulls; pre-filter malformed rows upstream if a 100-TB ingest must
  * survive them.
  */
object Wkb {

  private val TypePoint = 1
  private val TypeLineString = 2
  private val TypePolygon = 3
  private val TypeMultiPoint = 4
  private val TypeMultiLineString = 5
  private val TypeMultiPolygon = 6
  private val TypeGeomCollection = 7
  /** Extension type for circles — outside every OGC/ISO band. */
  val TypeCircleExt = 0xF002

  /** Crafted bytes could nest collections arbitrarily deep and blow the
    * parse stack; real GIS data nests 1-2 levels. Fail loud past this. */
  private val MaxNesting = 32

  def format(s: Shape): Array[Byte] = s match {
    case Point(c) =>
      require(c.length == 2,
        s"only 2-D points have a WKB form, got ${c.length}-D")
      val b = le(1 + 4 + 16)
      b.put(1: Byte).putInt(TypePoint).putDouble(c(0)).putDouble(c(1))
      b.array()
    case LineSegment(a, bPt) =>
      val b = le(1 + 4 + 4 + 32)
      b.put(1: Byte).putInt(TypeLineString).putInt(2)
        .putDouble(a.coord(0)).putDouble(a.coord(1))
        .putDouble(bPt.coord(0)).putDouble(bPt.coord(1))
      b.array()
    case p: Polygon =>
      // OGC layout: numRings, then each closed ring (shell first, then
      // interior rings — the byte form JTS's WKBWriter emits; reference:
      // spatial/Polygon.scala:106-124 round-trips holes through it)
      val rings = (p.vertices +: p.holes.toSeq)
        .map(r => closedRing(r.flatMap(_.coord)))
      val b = le(1 + 4 + 4 + rings.map(r => 4 + 8 * r.length).sum)
      b.put(1: Byte).putInt(TypePolygon).putInt(rings.length)
      rings.foreach { r => b.putInt(r.length / 2); r.foreach(b.putDouble) }
      b.array()
    case MBR(lo, hi) =>
      require(lo.coord.length == 2,
        s"only 2-D boxes have a WKB (polygon) form, got ${lo.coord.length}-D")
      val (x1, y1, x2, y2) = (lo.coord(0), lo.coord(1), hi.coord(0), hi.coord(1))
      ringBytes(Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1))
    case Circle(c, r) =>
      require(c.coord.length == 2,
        s"only 2-D circles have a WKB (extension) form, got ${c.coord.length}-D")
      val b = le(1 + 4 + 24)
      b.put(1: Byte).putInt(TypeCircleExt)
        .putDouble(c.coord(0)).putDouble(c.coord(1)).putDouble(r)
      b.array()
    case ShapeCollection(parts) =>
      // OGC Multi*: each element is a COMPLETE WKB geometry (its own
      // byte-order marker + type), so the element bytes are exactly
      // `format(part)`. The homogeneous kinds take their specific
      // Multi type (boxes ride as their polygon rings, the MBR rule
      // above); anything mixed — or carrying the circle extension or a
      // nested collection — emits GEOMETRYCOLLECTION.
      val bodies = parts.map(format)
      def kind(p: Shape): Int = p match {
        case _: Point => TypeMultiPoint
        case _: LineSegment => TypeMultiLineString
        case _: Polygon | _: MBR => TypeMultiPolygon
        case _ => TypeGeomCollection
      }
      val kinds = parts.map(kind).distinct
      val tpe =
        if (kinds.length == 1 && kinds.head != TypeGeomCollection) kinds.head
        else TypeGeomCollection
      val b = le(1 + 4 + 4 + bodies.map(_.length).sum)
      b.put(1: Byte).putInt(tpe).putInt(parts.length)
      bodies.foreach(b.put)
      b.array()
  }

  def parse(bytes: Array[Byte]): Shape = {
    def fail(why: String): Nothing = {
      val hex = bytes.take(16).map(x => f"$x%02x").mkString
      throw new IllegalArgumentException(
        s"malformed WKB ($why): 0x$hex${if (bytes.length > 16) "..." else ""}")
    }
    val b = ByteBuffer.wrap(bytes)
    def need(n: Int, what: String): Unit =
      if (b.remaining() < n) fail(s"truncated $what")
    // One complete geometry from the buffer's position: each geometry
    // (including every Multi* element) carries its own byte-order
    // marker and type, per OGC — the recursion mirrors the bytes.
    def readShape(depth: Int): Shape = {
      if (depth > MaxNesting) fail(s"collection nesting deeper than $MaxNesting")
      need(5, "header")
      b.get() match {
        case 0 => b.order(ByteOrder.BIG_ENDIAN)
        case 1 => b.order(ByteOrder.LITTLE_ENDIAN)
        case other => fail(s"bad byte-order marker $other")
      }
      val tpe = b.getInt
      tpe match {
        case TypePoint =>
          need(16, "point")
          Point(b.getDouble, b.getDouble)
        case TypeLineString =>
          need(4, "linestring length")
          val n = b.getInt
          if (n < 2) fail(s"linestrings need >= 2 vertices, got $n")
          need(16 * n, "linestring vertices")
          val vs = Array.fill(n)(Point(b.getDouble, b.getDouble))
          if (n == 2) LineSegment(vs(0), vs(1))
          // polylines (roads, coastlines) decompose into their
          // consecutive segments — the point-set union is identical,
          // so minDist/intersects semantics are exact; only the vertex
          // grouping is normalized (format emits MULTILINESTRING of
          // 2-vertex segments)
          else ShapeCollection(Array.tabulate[Shape](n - 1)(i =>
            LineSegment(vs(i), vs(i + 1))))
        case TypePolygon =>
          need(4, "ring count")
          val nRings = b.getInt
          if (nRings < 1) fail(s"polygon needs at least the shell ring, got $nRings")
          def readRing(): Array[Point] = {
            need(4, "ring length")
            val n = b.getInt
            if (n < 3) fail(s"rings need >= 3 vertices, got $n")
            need(16 * n, "ring vertices")
            val vs = Array.fill(n)(Point(b.getDouble, b.getDouble))
            val ring =
              if (n > 1 && vs.head.coord.sameElements(vs.last.coord)) vs.dropRight(1)
              else vs
            if (ring.length < 3)
              fail(s"rings need >= 3 distinct vertices, got ${ring.length}")
            ring
          }
          val shell = readRing()
          val holes = Array.fill(nRings - 1)(readRing())
          Polygon(shell, holes)
        case TypeCircleExt =>
          need(24, "circle")
          Circle(Point(b.getDouble, b.getDouble), b.getDouble)
        case TypeMultiPoint | TypeMultiLineString | TypeMultiPolygon |
             TypeGeomCollection =>
          need(4, "element count")
          val n = b.getInt
          if (n < 1) fail(s"collections need >= 1 element, got $n")
          val parts = Array.fill[Shape](n)(readShape(depth + 1))
          // Multi* homogeneity is part of the bytes' meaning — enforce
          // it (GEOMETRYCOLLECTION accepts anything). A decomposed
          // polyline (segment run) is a legal MULTILINESTRING element
          // and flattens into the union.
          def bad(p: Shape): Boolean = tpe match {
            case TypeMultiPoint => !p.isInstanceOf[Point]
            case TypeMultiLineString => p match {
              case _: LineSegment => false
              case ShapeCollection(ps) => !ps.forall(_.isInstanceOf[LineSegment])
              case _ => true
            }
            case TypeMultiPolygon => !p.isInstanceOf[Polygon]
            case _ => false
          }
          parts.find(bad).foreach(p =>
            fail(s"element ${p.getClass.getSimpleName} illegal in WKB type $tpe"))
          val flat =
            if (tpe == TypeMultiLineString)
              parts.flatMap {
                case ShapeCollection(ps) => ps
                case s => Array(s)
              }
            else parts
          ShapeCollection(flat)
        case other => fail(s"unsupported geometry type $other")
      }
    }
    val shape = readShape(0)
    // Strict consumption: trailing bytes mean concatenated geometries
    // or a corrupt length field that left residue — both are malformed
    // input under the documented no-silent-acceptance posture.
    if (b.remaining() != 0) fail(s"${b.remaining()} trailing bytes")
    shape
  }

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  private def closedRing(flat: Array[Double]): Array[Double] =
    if (flat.length >= 4 &&
        flat(0) == flat(flat.length - 2) && flat(1) == flat(flat.length - 1))
      flat
    else flat ++ Array(flat(0), flat(1))

  private def ringBytes(closed: Array[Double]): Array[Byte] = {
    val n = closed.length / 2
    val b = le(1 + 4 + 4 + 4 + 16 * n)
    b.put(1: Byte).putInt(TypePolygon).putInt(1).putInt(n)
    closed.foreach(b.putDouble)
    b.array()
  }

  // Static kernels called from generated code.
  def formatRow(r: InternalRow): Array[Byte] =
    format(ShapeCodec.fromRow(r))

  def parseToRow(bytes: Array[Byte]): InternalRow = {
    val (tag, coords) = ShapeCodec.encode(parse(bytes))
    new GenericInternalRow(Array[Any](tag, new GenericArrayData(coords)))
  }

  /** Lowercase hex of the WKB bytes — the text form PostGIS prints and
    * an engine-replayable oracle can string-compare. */
  def formatRowHex(r: InternalRow): UTF8String =
    UTF8String.fromString(formatRow(r).map(x => f"$x%02x").mkString)
}

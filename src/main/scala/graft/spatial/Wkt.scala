package graft.spatial

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** WKT text I/O for the Shape ADT — the reference's interoperability
  * surface (reference: spatial/Polygon.scala:106-124 routes polygons
  * through JTS's WKTWriter/WKTReader); this rebuild hand-rolls the
  * subset the ADT needs, zero dependencies, codegen-callable kernels.
  *
  * Mappings:
  *  - `Point` (any dim)    <-> `POINT (x y[ z ...])`
  *  - `LineSegment`        <-> `LINESTRING (ax ay, bx by)`; longer
  *    polylines parse into the [[ShapeCollection]] of their
  *    consecutive segments (identical point-set union — exact
  *    distance/intersection semantics, vertex grouping normalized)
  *  - `ShapeCollection`    <-> `MULTIPOINT` / `MULTILINESTRING` /
  *    `MULTIPOLYGON` (homogeneous) and `GEOMETRYCOLLECTION` (mixed or
  *    nested) — the OGC Multi* forms the reference accepts via JTS's
  *    WKTReader (reference: spatial/Polygon.scala:106-124)
  *  - `Polygon`            <-> `POLYGON ((shell...)[, (hole...), ...])`
  *    (outer shell first, then interior rings — the OGC/JTS layout the
  *    reference emits via WKTWriter; closing vertex emitted on output,
  *    tolerated either way on input)
  *  - `MBR` (2-D)          --> its `POLYGON` ring (WKT has no box type,
  *    so a formatted box PARSES BACK as the geometrically-equal
  *    Polygon); n-D boxes have no WKT form -> error
  *  - `Circle`             <-> `CIRCLE (cx cy r)` — NON-STANDARD: WKT
  *    has no circle; emitted so every ADT kind has a text form, clearly
  *    flagged as an extension (PostGIS has the same problem and uses
  *    CURVEPOLYGON approximations instead)
  *
  * Numbers print via `Double.toString` (shortest round-trip
  * representation), so `parse(format(s))` is numerically exact. Parse
  * failures throw `IllegalArgumentException` with the offending text —
  * strict like JTS, no silent nulls; pre-filter malformed rows upstream
  * if a 100-TB ingest must survive them.
  */
object Wkt {

  def format(s: Shape): String = s match {
    case Point(c) => s"POINT (${c.mkString(" ")})"
    case LineSegment(a, b) =>
      s"LINESTRING (${a.coord.mkString(" ")}, ${b.coord.mkString(" ")})"
    case p: Polygon =>
      def ringText(ring: Array[Point]): String = {
        val vs = ring.map(v => s"${v.coord(0)} ${v.coord(1)}").toSeq
        val closed = if (vs.head == vs.last) vs else vs :+ vs.head
        s"(${closed.mkString(", ")})"
      }
      s"POLYGON (${(p.vertices +: p.holes.toSeq).map(ringText).mkString(", ")})"
    case MBR(lo, hi) =>
      require(lo.coord.length == 2,
        s"only 2-D boxes have a WKT (polygon) form, got ${lo.coord.length}-D")
      val (x1, y1, x2, y2) = (lo.coord(0), lo.coord(1), hi.coord(0), hi.coord(1))
      s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"
    case Circle(c, r) => s"CIRCLE (${c.coord.mkString(" ")} $r)"
    case ShapeCollection(parts) =>
      // homogeneous parts take their OGC Multi* form (boxes ride as
      // their polygon rings); any mix — or a circle extension / nested
      // collection — emits GEOMETRYCOLLECTION of full texts
      def kindOf(p: Shape): Int = p match {
        case _: Point => 1
        case _: LineSegment => 2
        case _: Polygon | _: MBR => 3
        case _ => 0
      }
      val ks = parts.map(kindOf).toSet
      if (ks == Set(1))
        s"MULTIPOINT (${parts.map(p =>
          s"(${p.asInstanceOf[Point].coord.mkString(" ")})").mkString(", ")})"
      else if (ks == Set(2))
        s"MULTILINESTRING (${parts.map { p =>
          val sgm = p.asInstanceOf[LineSegment]
          s"(${sgm.start.coord.mkString(" ")}, ${sgm.end.coord.mkString(" ")})"
        }.mkString(", ")})"
      else if (ks == Set(3))
        s"MULTIPOLYGON (${parts.map(p => format(p).stripPrefix("POLYGON "))
          .mkString(", ")})"
      else s"GEOMETRYCOLLECTION (${parts.map(format).mkString(", ")})"
  }

  def parse(text: String): Shape = {
    val t = text.trim
    val open = t.indexOf('(')
    require(open > 0, s"malformed WKT (no coordinate list): '$text'")
    val kind = t.substring(0, open).trim.toUpperCase
    val body = t.substring(open).trim
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"malformed WKT ($why): '$text'")
    // strip one balanced outer paren pair
    def unwrap(s: String): String = {
      if (!(s.startsWith("(") && s.endsWith(")"))) fail("unbalanced parens")
      s.substring(1, s.length - 1).trim
    }
    def nums(s: String): Array[Double] =
      s.trim.split("\\s+").map { tok =>
        try tok.toDouble catch { case _: NumberFormatException => fail(s"bad number '$tok'") }
      }
    def vertices(s: String): Array[Array[Double]] = s.split(",").map(nums)

    // split at top-level commas (paren depth 0) — element lists of the
    // Multi*/collection kinds
    def splitTop(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      var start = 0
      var k = 0
      while (k < s.length) {
        s.charAt(k) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth < 0) fail("unbalanced parens")
          case ',' if depth == 0 =>
            out += s.substring(start, k); start = k + 1
          case _ =>
        }
        k += 1
      }
      if (depth != 0) fail("unbalanced parens")
      out += s.substring(start)
      out.toSeq.map(_.trim)
    }
    // a polygon's `(ring[, ring...])` body — shared by POLYGON and each
    // MULTIPOLYGON element
    def parsePolygonBody(polyBody: String): Polygon = {
      // rings carry no nested parens, so a linear scan splits them exactly
      val inner = unwrap(polyBody)
      val ringTexts = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      var start = -1
      var k = 0
      while (k < inner.length) {
        inner.charAt(k) match {
          case '(' =>
            depth += 1
            if (depth == 1) start = k + 1 else fail("nested ring parens")
          case ')' =>
            if (depth != 1) fail("unbalanced ring parens")
            depth = 0
            ringTexts += inner.substring(start, k)
          case c if depth == 0 && c != ',' && !c.isWhitespace =>
            fail(s"unexpected '$c' between rings")
          case _ =>
        }
        k += 1
      }
      if (depth != 0) fail("unbalanced ring parens")
      if (ringTexts.isEmpty) fail("polygon needs at least the shell ring")
      def parseRing(s: String): Array[Point] = {
        val vs = vertices(s)
        if (vs.exists(_.length != 2)) fail("polygons are 2-D")
        val ring =
          if (vs.length > 1 && vs.head.sameElements(vs.last)) vs.dropRight(1)
          else vs
        if (ring.length < 3)
          fail(s"rings need >= 3 distinct vertices, got ${ring.length}")
        ring.map(v => Point(v))
      }
      val rings = ringTexts.map(parseRing)
      Polygon(rings.head, rings.tail.toArray)
    }
    // a linestring's vertex list: 2 vertices is the ADT segment; longer
    // polylines (roads, coastlines) decompose into their consecutive
    // segments — identical point-set union, exact distance/intersection
    // semantics, vertex grouping normalized on output
    def parseLineString(listText: String): Seq[Shape] = {
      val vs = vertices(listText)
      if (vs.length < 2) fail(s"linestrings need >= 2 vertices, got ${vs.length}")
      if (vs.exists(_.length != 2)) fail("linestrings are 2-D")
      (0 until vs.length - 1).map(i => LineSegment(Point(vs(i)), Point(vs(i + 1))))
    }

    kind match {
      case "POINT" =>
        val c = nums(unwrap(body))
        if (c.isEmpty) fail("empty point") else Point(c)
      case "LINESTRING" =>
        val segs = parseLineString(unwrap(body))
        if (segs.length == 1) segs.head else ShapeCollection(segs.toArray)
      case "POLYGON" => parsePolygonBody(body)
      case "CIRCLE" =>
        val c = nums(unwrap(body))
        if (c.length < 3) fail("circles are 'CIRCLE (cx cy r)'")
        Circle(Point(c.init), c.last)
      case "MULTIPOINT" =>
        // both OGC spellings: `((1 2), (3 4))` and the bare `(1 2, 3 4)`
        val elems = splitTop(unwrap(body))
        val pts = elems.map { e =>
          val c = nums(if (e.startsWith("(")) unwrap(e) else e)
          if (c.isEmpty) fail("empty point") else Point(c): Shape
        }
        ShapeCollection(pts.toArray)
      case "MULTILINESTRING" =>
        val elems = splitTop(unwrap(body))
        if (elems.exists(e => !e.startsWith("(")))
          fail("multilinestring elements need their own parens")
        ShapeCollection(elems.flatMap(e => parseLineString(unwrap(e))).toArray)
      case "MULTIPOLYGON" =>
        val elems = splitTop(unwrap(body))
        if (elems.exists(e => !e.startsWith("(")))
          fail("multipolygon elements need their own parens")
        ShapeCollection(elems.map(parsePolygonBody(_): Shape).toArray)
      case "GEOMETRYCOLLECTION" =>
        // full geometry texts, recursively parsed (collections nest)
        ShapeCollection(splitTop(unwrap(body)).map(parse).toArray)
      case other => fail(s"unsupported geometry '$other'")
    }
  }

  // Static kernels called from generated code.
  def formatRow(r: InternalRow): UTF8String =
    UTF8String.fromString(format(ShapeCodec.fromRow(r)))

  def parseToRow(s: UTF8String): InternalRow = {
    val (tag, coords) = ShapeCodec.encode(parse(s.toString))
    new GenericInternalRow(Array[Any](tag, new GenericArrayData(coords)))
  }
}

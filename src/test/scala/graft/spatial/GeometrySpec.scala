package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

/** Geometry kernel tests — mirrors the reference's unit coverage
  * (reference tests: spatial/PointSuite.scala, MBRSuite, CircleSuite,
  * LineSegmentSuite, DistSuite, ZValueSuite) plus seeded property-style
  * symmetry/triangle checks the reference lacks. */
class GeometrySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(42)
  private def randPoint(r: scala.util.Random): Point =
    Point(r.nextDouble() * 2000 - 1000, r.nextDouble() * 2000 - 1000)
  private def randMBR(r: scala.util.Random): MBR = {
    val a = randPoint(r); val b = randPoint(r)
    MBR(Point(math.min(a.coord(0), b.coord(0)), math.min(a.coord(1), b.coord(1))),
        Point(math.max(a.coord(0), b.coord(0)), math.max(a.coord(1), b.coord(1))))
  }

  test("point-point distance basics") {
    assert(Point(0, 0).minDist(Point(3, 4)) === 5.0)
    assert(Point(1, 2, 3).minDist(Point(1, 2, 3)) === 0.0)
    assert(Point(0, 0).intersects(Point(0, 0)))
    assert(!Point(0, 0).intersects(Point(0, 1)))
  }

  test("point dominance, shift, equality") {
    assert(Point(1, 2) <= Point(1, 3))
    assert(!(Point(2, 2) <= Point(1, 3)))
    assert(Point(1, 1).shift(2.5) === Point(3.5, 3.5))
    assert(Point(1, 2) === Point(1, 2))
    assert(Point(1, 2).hashCode === Point(1, 2).hashCode)
  }

  test("MBR contains / intersects, boundaries inclusive") {
    val box = MBR(Point(0, 0), Point(10, 10))
    assert(box.contains(Point(0, 0)))
    assert(box.contains(Point(10, 10)))
    assert(box.contains(Point(5, 5)))
    assert(!box.contains(Point(10.0001, 5)))
    assert(box.intersects(MBR(Point(10, 10), Point(20, 20)))) // corner touch
    assert(!box.intersects(MBR(Point(10.1, 10.1), Point(20, 20))))
  }

  test("point-MBR minDist: zero inside, face distance outside") {
    val box = MBR(Point(0, 0), Point(10, 10))
    assert(box.minDist(Point(5, 5)) === 0.0)
    assert(box.minDist(Point(13, 14)) === 5.0) // dx=3, dy=4
    assert(box.minDist(Point(-3, 5)) === 3.0)
  }

  test("MBR maxDist reaches the far corner") {
    val box = MBR(Point(0, 0), Point(10, 10))
    assert(box.maxDist(Point(0, 0)) === math.sqrt(200))
  }

  test("circle intersects point/MBR/circle, boundary inclusive") {
    val c = Circle(Point(0, 0), 5)
    assert(c.intersects(Point(3, 4)))
    assert(c.intersects(Point(5, 0)))
    assert(!c.intersects(Point(5.0001, 0)))
    assert(c.intersects(MBR(Point(3, 3), Point(9, 9)))) // corner at sqrt(18) < 5
    assert(!c.intersects(MBR(Point(4, 4), Point(9, 9)))) // corner at sqrt(32) > 5
    assert(c.intersects(Circle(Point(8, 0), 3)))
    assert(!c.intersects(Circle(Point(8.01, 0), 3)))
  }

  test("MBR calcRatio selectivity") {
    val box = MBR(Point(0, 0), Point(10, 10))
    assert(box.calcRatio(MBR(Point(0, 0), Point(5, 10))) === 0.5)
    assert(box.calcRatio(MBR(Point(20, 20), Point(30, 30))) === 0.0)
    assert(box.calcRatio(MBR(Point(-5, -5), Point(15, 15))) === 1.0)
  }

  test("segment intersection: crossing, touching, parallel, collinear") {
    val a = LineSegment(Point(0, 0), Point(10, 10))
    assert(a.intersects(LineSegment(Point(0, 10), Point(10, 0))))
    assert(a.intersects(LineSegment(Point(5, 5), Point(20, 5)))) // endpoint on a
    assert(!a.intersects(LineSegment(Point(0, 1), Point(10, 11)))) // parallel
    assert(a.intersects(LineSegment(Point(2, 2), Point(8, 8)))) // collinear overlap
  }

  test("point-segment distance") {
    val s = LineSegment(Point(0, 0), Point(10, 0))
    assert(Dist.pointToSegment(Point(5, 3), s) === 3.0)
    assert(Dist.pointToSegment(Point(-3, 4), s) === 5.0) // beyond start
    assert(Dist.pointToSegment(Point(5, 0), s) === 0.0)
  }

  test("segment-MBR intersection") {
    val box = MBR(Point(0, 0), Point(10, 10))
    assert(LineSegment(Point(-5, 5), Point(15, 5)).intersects(box)) // through
    assert(LineSegment(Point(2, 2), Point(3, 3)).intersects(box))   // inside
    assert(!LineSegment(Point(-5, -5), Point(-1, -1)).intersects(box))
  }

  test("z-value round trip (seeded sweep)") {
    val r = rng
    (1 to 500).foreach { _ =>
      val x = r.nextInt(1 << 21); val y = r.nextInt(1 << 21)
      val z = ZValue(x, y)
      val Array(x2, y2) = ZValue.deinterleave(z, 2, 21)
      assert(x2 === x && y2 === y)
    }
    val c3 = Array(7, 11, 13)
    assert(ZValue.deinterleave(ZValue.interleave(c3, 20), 3, 20).toSeq === c3.toSeq)
  }

  test("z-value axis monotonicity") {
    assert(ZValue(0, 0) < ZValue(1, 0))
    assert(ZValue(0, 0) < ZValue(0, 1))
    assert(ZValue(3, 5) < ZValue(3, 6))
  }

  test("quantize clamps and is monotone") {
    assert(ZValue.quantize(-5.0, 0.0, 10.0, 8) === 0)
    assert(ZValue.quantize(15.0, 0.0, 10.0, 8) === 255)
    val r = rng
    (1 to 200).foreach { _ =>
      val a = r.nextDouble() * 10; val b = r.nextDouble() * 10
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(ZValue.quantize(lo, 0.0, 10.0, 8) <= ZValue.quantize(hi, 0.0, 10.0, 8))
    }
  }

  test("property: minDist symmetry across shape kinds") {
    val r = rng
    (1 to 300).foreach { _ =>
      val a = randPoint(r); val b = randPoint(r); val m = randMBR(r)
      assert(math.abs(a.minDist(b) - b.minDist(a)) < 1e-9)
      assert(math.abs(a.minDist(m) - m.minDist(a)) < 1e-9)
      val c = Circle(randPoint(r), r.nextDouble() * 100)
      assert(math.abs(c.minDist(a) - a.minDist(c)) < 1e-9)
    }
  }

  test("property: intersects symmetry for MBRs") {
    val r = rng
    (1 to 300).foreach { _ =>
      val a = randMBR(r); val b = randMBR(r)
      assert(a.intersects(b) === b.intersects(a))
    }
  }

  test("property: triangle inequality for points") {
    val r = rng
    (1 to 300).foreach { _ =>
      val a = randPoint(r); val b = randPoint(r); val c = randPoint(r)
      assert(a.minDist(c) <= a.minDist(b) + b.minDist(c) + 1e-9)
    }
  }

  test("property: MBR union contains both inputs' corners") {
    val r = rng
    (1 to 300).foreach { _ =>
      val a = randMBR(r); val b = randMBR(r)
      val u = a.union(b)
      assert(u.contains(a.low) && u.contains(a.high))
      assert(u.contains(b.low) && u.contains(b.high))
    }
  }

  test("property: point-MBR minDist <= point-corner distance, maxDist >= corners") {
    val r = rng
    (1 to 300).foreach { _ =>
      val p = randPoint(r); val m = randMBR(r)
      assert(m.minDist(p) <= p.minDist(m.low) + 1e-9)
      assert(m.maxDist(p) >= p.minDist(m.high) - 1e-9)
      assert(Dist.furthest(p, m) === m.maxDist(p))
    }
  }

  test("polygon contains: convex, concave, boundary inclusive") {
    val square = Polygon((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    assert(square.contains(Point(5, 5)))
    assert(square.contains(Point(0, 0)))     // vertex
    assert(square.contains(Point(5, 0)))     // edge
    assert(square.contains(Point(10, 10)))
    assert(!square.contains(Point(10.0001, 5)))
    assert(!square.contains(Point(-0.0001, 5)))

    // concave "L": the notch (6..10)x(6..10) is outside
    val ell = Polygon((0.0, 0.0), (10.0, 0.0), (10.0, 6.0), (6.0, 6.0),
      (6.0, 10.0), (0.0, 10.0))
    assert(ell.contains(Point(3, 3)))
    assert(ell.contains(Point(3, 9)))
    assert(ell.contains(Point(9, 3)))
    assert(!ell.contains(Point(9, 9)))       // the notch
    assert(ell.contains(Point(6, 6)))        // reflex vertex
  }

  test("polygon minDist and intersects across shape kinds") {
    val square = Polygon((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    assert(square.minDist(Point(5, 5)) === 0.0)
    assert(square.minDist(Point(13, 5)) === 3.0)
    assert(square.minDist(Point(13, 14)) === 5.0) // corner distance
    // symmetric dispatch through the Shape ADT
    assert(Point(13, 5).minDist(square) === 3.0)
    assert(square.intersects(MBR(Point(9, 9), Point(12, 12))))
    assert(!square.intersects(MBR(Point(10.5, 0), Point(12, 12))))
    assert(MBR(Point(4, 4), Point(6, 6)).intersects(square)) // box inside polygon
    assert(square.intersects(Circle(Point(12, 5), 2.5)))
    assert(!square.intersects(Circle(Point(12, 5), 1.5)))
    assert(square.intersects(LineSegment(Point(-1, -1), Point(11, 11))))
    assert(!square.intersects(LineSegment(Point(11, 0), Point(11, 11))))
    val far = Polygon((20.0, 0.0), (30.0, 0.0), (25.0, 10.0))
    assert(square.minDist(far) === 10.0)
    assert(!square.intersects(far))
    assert(square.intersects(Polygon((5.0, 5.0), (15.0, 5.0), (15.0, 15.0))))
  }

  test("property: WKT <-> WKB <-> struct round-trip on random shapes") {
    val r = rng
    def randRing(c: Point, scale: Double): Array[Point] = {
      val n = 3 + r.nextInt(4)
      Array.tabulate(n) { i =>
        val ang = 2 * math.Pi * i / n + r.nextDouble() * 0.3
        val rad = (r.nextDouble() * 50 + 1.0) * scale
        Point(c.coord(0) + rad * math.cos(ang), c.coord(1) + rad * math.sin(ang))
      }
    }
    def randShape(): Shape = r.nextInt(5) match {
      case 0 => randPoint(r)
      case 1 => LineSegment(randPoint(r), randPoint(r))
      case 2 => Circle(randPoint(r), r.nextDouble() * 100 + 1e-6)
      case 3 =>
        // random non-degenerate triangle-to-hexagon ring around a center
        Polygon(randRing(randPoint(r), 1.0))
      case _ =>
        // polygon with 1-2 interior rings (codecs carry rings verbatim)
        val c = randPoint(r)
        Polygon(randRing(c, 1.0),
          Array.fill(1 + r.nextInt(2))(randRing(c, 0.01)))
    }
    (1 to 2000).foreach { _ =>
      val s = randShape()
      // each codec is individually lossless...
      assert(Wkt.parse(Wkt.format(s)) === s, s"WKT round trip of $s")
      assert(Wkb.parse(Wkb.format(s)) === s, s"WKB round trip of $s")
      val (tag, coords) = ShapeCodec.encode(s)
      assert(ShapeCodec.decode(tag, coords) === s, s"struct round trip of $s")
      // ...and they compose in any order
      assert(Wkb.parse(Wkb.format(Wkt.parse(Wkt.format(s)))) === s)
      assert(Wkt.parse(Wkt.format(Wkb.parse(Wkb.format(s)))) === s)
    }
    // random boxes: both text and bytes emit the polygon ring, and the
    // two parses agree with each other exactly
    (1 to 500).foreach { _ =>
      val b = randMBR(r)
      (Wkt.parse(Wkt.format(b)), Wkb.parse(Wkb.format(b))) match {
        case (pt: Polygon, pb: Polygon) =>
          assert(pt === pb, s"WKT and WKB disagree on box $b")
          assert(pt.intersects(b))
        case other => fail(s"box must parse as its ring from both codecs: $other")
      }
    }
  }

  test("polygon holes: containment is shell-inclusive minus strict hole " +
    "interiors; hole boundaries belong to the polygon") {
    // outer (0,0)-(10,10) square, hole (3,3)-(7,7) square — axis-aligned
    // so the ring algebra has an exact closed form to compare against
    val holed = Polygon(
      Array(Point(0.0, 0.0), Point(10.0, 0.0), Point(10.0, 10.0), Point(0.0, 10.0)),
      Array(Array(Point(3.0, 3.0), Point(7.0, 3.0), Point(7.0, 7.0), Point(3.0, 7.0))))
    // solid region
    assert(holed.contains(Point(1.0, 1.0)))
    assert(holed.contains(Point(8.5, 5.0)))
    // strictly inside the hole: OUT
    assert(!holed.contains(Point(5.0, 5.0)))
    assert(!holed.contains(Point(3.0001, 3.0001)))
    // ON the hole ring: IN (JTS/OGC — every ring boundary belongs)
    assert(holed.contains(Point(3.0, 3.0)))
    assert(holed.contains(Point(7.0, 5.0)))
    assert(holed.contains(Point(5.0, 3.0)))
    // ON the shell: IN; outside the shell: OUT
    assert(holed.contains(Point(0.0, 0.0)) && holed.contains(Point(10.0, 5.0)))
    assert(!holed.contains(Point(10.5, 5.0)))

    // distances: from the hole interior, the nearest boundary is the
    // hole RING, not the shell
    assert(holed.minDist(Point(5.0, 5.0)) === 2.0)
    assert(holed.minDist(Point(12.0, 5.0)) === 2.0)
    assert(holed.minDist(Point(4.0, 5.0)) === 1.0)
    assert(holed.minDist(Point(1.0, 1.0)) === 0.0)

    // shapes fully inside the hole do NOT intersect; minDist reaches
    // the hole ring
    assert(!holed.intersects(Circle(Point(5.0, 5.0), 1.0)))
    assert(holed.minDist(Circle(Point(5.0, 5.0), 1.0)) === 1.0)
    assert(!holed.intersects(MBR(Point(4.0, 4.0), Point(6.0, 6.0))))
    assert(holed.minDist(MBR(Point(4.0, 4.0), Point(6.0, 6.0))) === 1.0)
    assert(!holed.intersects(LineSegment(Point(4.0, 5.0), Point(6.0, 5.0))))
    assert(!holed.intersects(
      Polygon((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))))
    // straddling the hole ring DOES intersect
    assert(holed.intersects(MBR(Point(2.0, 4.0), Point(4.0, 6.0))))
    assert(holed.intersects(LineSegment(Point(5.0, 5.0), Point(9.0, 5.0))))
    // a polygon COVERING the hole intersects (its corners are solid)
    assert(holed.intersects(
      Polygon((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))))
    // a box exactly equal to the hole touches its ring: intersects
    assert(holed.intersects(MBR(Point(3.0, 3.0), Point(7.0, 7.0))))
    // circle centered in the hole but reaching past its ring intersects
    assert(holed.intersects(Circle(Point(5.0, 5.0), 2.5)))

    // hole-aware polygon-polygon symmetry both ways
    val inner = Polygon((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))
    assert(!inner.intersects(holed) && !holed.intersects(inner))
    assert(inner.minDist(holed) === holed.minDist(inner))

    // equality/hashCode include the rings
    val sameRings = Polygon(holed.vertices.clone(), holed.holes.map(_.clone()))
    assert(holed === sameRings && holed.hashCode === sameRings.hashCode)
    assert(holed !== Polygon(holed.vertices.clone()))

    // property: random points agree with the closed-form ring algebra,
    // through both the object API and the flat rings kernel
    val r = rng
    (1 to 5000).foreach { _ =>
      val x = r.nextDouble() * 14 - 2
      val y = r.nextDouble() * 14 - 2
      val inShell = 0.0 <= x && x <= 10.0 && 0.0 <= y && y <= 10.0
      val strictlyInHole = 3.0 < x && x < 7.0 && 3.0 < y && y < 7.0
      val want = inShell && !strictlyInHole
      assert(holed.contains(Point(x, y)) === want, s"contains($x,$y)")
      assert(Dist.pointInPolygonRings(x, y, holed.flatRings) === want,
        s"rings kernel ($x,$y)")
    }
  }

  test("polygon holes: WKT and WKB carry interior rings; WKB rejects " +
    "trailing bytes") {
    val holed = Polygon(
      Array(Point(0.0, 0.0), Point(4.0, 0.0), Point(4.0, 4.0), Point(0.0, 4.0)),
      Array(Array(Point(1.0, 1.0), Point(2.0, 1.0), Point(2.0, 2.0), Point(1.0, 2.0))))
    // WKT multi-ring text form (OGC: shell first, holes after)
    val txt = Wkt.format(holed)
    assert(txt ===
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), " +
        "(1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))")
    assert(Wkt.parse(txt) === holed)
    // unclosed rings tolerated on input, like the single-ring form
    assert(Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4), (1 1, 2 1, 2 2, 1 2))")
      === holed)
    // degenerate hole still fails loudly
    intercept[IllegalArgumentException](
      Wkt.parse("POLYGON ((0 0, 4 0, 4 4), (1 1, 2 1))"))

    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden PostGIS hex: ST_AsBinary('POLYGON((0 0,4 0,4 4,0 4,0 0),
    // (1 1,2 1,2 2,1 2,1 1))') — IEEE doubles hand-derived
    val d0 = "0000000000000000"; val d1 = "000000000000f03f"
    val d2 = "0000000000000040"; val d4 = "0000000000001040"
    val golden = "010300000002000000" +
      "05000000" + (d0 + d0) + (d4 + d0) + (d4 + d4) + (d0 + d4) + (d0 + d0) +
      "05000000" + (d1 + d1) + (d2 + d1) + (d2 + d2) + (d1 + d2) + (d1 + d1)
    assert(hex(Wkb.format(holed)) === golden)
    assert(Wkb.parse(unhex(golden)) === holed)
    // struct codec: hole-free stays tag 3 (at-rest back-compat), holed
    // is the self-describing tag 5
    val (tagPlain, _) = ShapeCodec.encode(Polygon(holed.vertices))
    assert(tagPlain === ShapeCodec.TagPolygon)
    val (tagHoled, coords) = ShapeCodec.encode(holed)
    assert(tagHoled === ShapeCodec.TagPolygonHoles)
    assert(ShapeCodec.decode(tagHoled, coords) === holed)
    // strict consumption: ANY trailing bytes after a full geometry fail
    val pt = Wkb.format(Point(1.0, 2.0))
    intercept[IllegalArgumentException](Wkb.parse(pt :+ 0.toByte))
    intercept[IllegalArgumentException](Wkb.parse(pt ++ pt))
    // truncated hole ring fails, never a silent 1-ring parse
    intercept[IllegalArgumentException](
      Wkb.parse(unhex(golden.dropRight(16))))
  }

  test("property: flat-array kernel agrees with the diamond half-plane form") {
    val r = rng
    val diamond = Polygon((-2.0, 0.0), (0.0, -1.0), (2.0, 0.0), (0.0, 1.0))
    (1 to 1000).foreach { _ =>
      val x = r.nextDouble() * 6 - 3
      val y = r.nextDouble() * 4 - 2
      val want = math.abs(x / 2.0) + math.abs(y) <= 1.0
      assert(Dist.pointInPolygon(x, y, diamond.flat) === want, s"($x,$y)")
    }
  }

  test("ShapeCollection: union semantics — minDist is min over parts, contains is any-part") {
    val a = Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val b = Polygon((10.0, 0.0), (14.0, 0.0), (14.0, 4.0), (0.0 + 10.0, 4.0))
    val mp = ShapeCollection(Array[Shape](a, b))
    assert(mp.dimensions === 2)
    assert(mp.mbr === MBR(Point(0.0, 0.0), Point(14.0, 4.0)))
    // inside either part -> contained, dist 0 (both dispatch directions)
    assert(mp.contains(Point(2.0, 2.0)) && mp.contains(Point(12.0, 2.0)))
    assert(Point(12.0, 2.0).intersects(mp) && mp.intersects(Point(12.0, 2.0)))
    assert(mp.minDist(Point(12.0, 2.0)) === 0.0)
    assert(Point(12.0, 2.0).minDist(mp) === 0.0)
    // in the gap: min over parts (x=7 -> 3 from both sides... 7-4=3, 10-7=3)
    assert(mp.minDist(Point(7.0, 2.0)) === 3.0)
    assert(!mp.contains(Point(7.0, 2.0)))
    // vs other shape kinds, symmetric
    val box = MBR(Point(5.0, 1.0), Point(6.0, 3.0))
    assert(mp.minDist(box) === 1.0 && box.minDist(mp) === 1.0)
    assert(!mp.intersects(box) && !box.intersects(mp))
    val touching = MBR(Point(3.0, 1.0), Point(6.0, 3.0))
    assert(mp.intersects(touching) && touching.intersects(mp))
    // a part with a hole keeps its ring algebra inside the collection
    val holed = Polygon(
      Array(Point(20.0, 0.0), Point(28.0, 0.0), Point(28.0, 8.0), Point(20.0, 8.0)),
      Array(Array(Point(23.0, 3.0), Point(25.0, 3.0), Point(25.0, 5.0), Point(23.0, 5.0))))
    val mixed = ShapeCollection(Array[Shape](a, holed))
    assert(mixed.contains(Point(21.0, 1.0)))
    assert(!mixed.contains(Point(24.0, 4.0)), "strict hole interior excluded")
    assert(mixed.contains(Point(23.0, 4.0)), "hole boundary belongs to the polygon")
  }

  test("Multi* WKT: round-trips, polyline decomposition, geometry collections") {
    val mp = ShapeCollection(Array[Shape](
      Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0)),
      Polygon(
        Array(Point(10.0, 0.0), Point(18.0, 0.0), Point(18.0, 8.0), Point(10.0, 8.0)),
        Array(Array(Point(13.0, 3.0), Point(15.0, 3.0), Point(15.0, 5.0), Point(13.0, 5.0))))))
    val mpText = Wkt.format(mp)
    assert(mpText.startsWith("MULTIPOLYGON ((("), mpText)
    assert(Wkt.parse(mpText) === mp)
    // multipoint, both OGC spellings
    val pts = ShapeCollection(Array[Shape](Point(1.0, 2.0), Point(3.0, 4.0)))
    assert(Wkt.format(pts) === "MULTIPOINT ((1.0 2.0), (3.0 4.0))")
    assert(Wkt.parse("MULTIPOINT ((1 2), (3 4))") === pts)
    assert(Wkt.parse("MULTIPOINT (1 2, 3 4)") === pts)
    // multilinestring; a 3-vertex element decomposes into 2 segments
    val mls = Wkt.parse("MULTILINESTRING ((0 0, 1 1, 2 0), (5 5, 6 6))")
    assert(mls === ShapeCollection(Array[Shape](
      LineSegment(Point(0.0, 0.0), Point(1.0, 1.0)),
      LineSegment(Point(1.0, 1.0), Point(2.0, 0.0)),
      LineSegment(Point(5.0, 5.0), Point(6.0, 6.0)))))
    assert(Wkt.parse(Wkt.format(mls.asInstanceOf[ShapeCollection])) === mls)
    // bare LINESTRING polylines decompose the same way
    assert(Wkt.parse("LINESTRING (0 0, 1 1, 2 0)") ===
      ShapeCollection(Array[Shape](
        LineSegment(Point(0.0, 0.0), Point(1.0, 1.0)),
        LineSegment(Point(1.0, 1.0), Point(2.0, 0.0)))))
    // mixed kinds -> GEOMETRYCOLLECTION, recursively parsed (nesting ok)
    val mix = ShapeCollection(Array[Shape](Point(1.0, 1.0), Circle(Point(0.0, 0.0), 2.0), pts))
    val mixText = Wkt.format(mix)
    assert(mixText.startsWith("GEOMETRYCOLLECTION (POINT"), mixText)
    assert(Wkt.parse(mixText) === mix)
    // strict failures still cite the text
    Seq("MULTIPOLYGON (1 2)", "MULTILINESTRING (0 0, 1 1)",
      "MULTIPOINT ()").foreach { bad =>
      val e = intercept[IllegalArgumentException](Wkt.parse(bad))
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }

  test("Multi* WKB: golden MULTIPOLYGON bytes, homogeneity enforced, nesting bounded") {
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val p1 = Polygon((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))
    val p2 = Polygon((2.0, 2.0), (3.0, 2.0), (3.0, 3.0))
    // element bytes ARE each part's own full WKB (own marker + type),
    // per OGC — golden: header 0106000000 + count + the two pinned
    // polygon encodings (the first is the PostGIS-pinned golden from
    // the single-polygon test)
    val p1Hex = "010300000001000000040000000000000000000000000000000000000" +
      "0000000000000f03f0000000000000000000000000000f03f000000000000f03f" +
      "00000000000000000000000000000000"
    val p2Hex = "0103000000010000000400000000000000000000400000000000000040" +
      "000000000000084000000000000000400000000000000840000000000000084" +
      "000000000000000400000000000000040"
    val mp = ShapeCollection(Array[Shape](p1, p2))
    assert(hex(Wkb.format(mp)) === "010600000002000000" + p1Hex + p2Hex)
    assert(Wkb.parse(unhex("010600000002000000" + p1Hex + p2Hex)) === mp)
    // all four collection types round-trip bit-lossless
    val samples = Seq(
      ShapeCollection(Array[Shape](Point(1.5, -2.25), Point(0.0, 7.0))),
      ShapeCollection(Array[Shape](
        LineSegment(Point(0.0, 0.0), Point(1.0, 1.0)),
        LineSegment(Point(2.0, 0.0), Point(3.0, 1.0)))),
      mp,
      ShapeCollection(Array[Shape](Point(1.0, 2.0), Circle(Point(0.0, 0.0), 2.5))),
      ShapeCollection(Array[Shape](Point(1.0, 2.0), mp))) // nested
    samples.foreach(s => assert(Wkb.parse(Wkb.format(s)) === s, s.toString))
    // a 3-vertex linestring inside MULTILINESTRING decomposes and flattens
    val polyline = unhex("010500000001000000" + // MULTILINESTRING, 1 elem
      "010200000003000000" + // linestring, 3 vertices
      "0000000000000000" * 2 + "000000000000f03f" * 2 +
      "0000000000000040" + "0000000000000000")
    assert(Wkb.parse(polyline) === ShapeCollection(Array[Shape](
      LineSegment(Point(0.0, 0.0), Point(1.0, 1.0)),
      LineSegment(Point(1.0, 1.0), Point(2.0, 0.0)))))
    // homogeneity: a point inside MULTIPOLYGON is malformed
    val badMp = unhex("010600000001000000" +
      "0101000000000000000000f03f0000000000000040")
    val e = intercept[IllegalArgumentException](Wkb.parse(badMp))
    assert(e.getMessage.contains("0x"), e.getMessage)
    // struct codec tag 6 round-trips every sample, nesting included
    samples.foreach { s =>
      val (tag, coords) = ShapeCodec.encode(s)
      assert(tag === ShapeCodec.TagCollection)
      assert(ShapeCodec.decode(tag, coords) === s, s.toString)
    }
  }
}

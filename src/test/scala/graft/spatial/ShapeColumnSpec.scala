package graft.spatial

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions._
import graft.operators.SpatialOps._

/** Mixed-geometry Shape columns: codec round-trip, the struct-encoded
  * range/kNN verbs against brute-force ADT oracles, codegen integration,
  * and the SQL-function surface. */
class ShapeColumnSpec extends SparkSpec {

  private val allShapes: Seq[Shape] = Seq(
    Point(1.0, 2.0),
    Point(1.0, 2.0, 3.0),
    MBR(Point(0.0, 0.0), Point(2.0, 3.0)),
    MBR(Point(0.0, 0.0, 0.0), Point(1.0, 1.0, 1.0)),
    Circle(Point(5.0, 5.0), 2.5),
    LineSegment(Point(0.0, 0.0), Point(4.0, 3.0)),
    Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))

  test("codec round-trips every geometry kind") {
    allShapes.foreach { s =>
      val (tag, coords) = ShapeCodec.encode(s)
      val back = ShapeCodec.decode(tag, coords)
      assert(back === s, s"round-trip failed for $s")
      // intersects/minDist semantics survive the round trip (pairwise
      // kernels require matching dimensionality)
      allShapes.filter(_.dimensions == s.dimensions).foreach { o =>
        assert(back.intersects(o) === s.intersects(o))
        assert(back.minDist(o) === s.minDist(o))
      }
    }
  }

  test("codec rejects unknown tags") {
    val e = intercept[IllegalArgumentException] {
      ShapeCodec.decode(9, Array(1.0, 2.0))
    }
    assert(e.getMessage.contains("unknown shape tag"))
  }

  // A deterministic mixed-shape table: i % 3 picks the geometry kind.
  private def mixedDf = {
    import spark.implicits._
    (1 to 300).map { i =>
      (i.toLong, (i % 17) * 3.0, (i % 13) * 4.0, 1.0 + (i % 5))
    }.toDF("id", "x", "y", "r")
      .withColumn("shape",
        when(col("id") % 3 === 0, stPoint(col("x"), col("y")))
          .when(col("id") % 3 === 1,
            stBox(Seq(col("x") - col("r"), col("y") - col("r")),
                  Seq(col("x") + col("r"), col("y") + col("r"))))
          .otherwise(stCircle(Seq(col("x"), col("y")), col("r"))))
  }

  private def shapeOf(id: Long, x: Double, y: Double, r: Double): Shape =
    (id % 3) match {
      case 0 => Point(x, y)
      case 1 => MBR(Point(x - r, y - r), Point(x + r, y + r))
      case _ => Circle(Point(x, y), r)
    }

  test("shapeRange over a mixed column equals the ADT brute force") {
    val query = MBR(Point(10.0, 8.0), Point(30.0, 28.0))
    val got = mixedDf.shapeRange("shape", query)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = mixedDf.select("id", "x", "y", "r").collect().filter { row =>
      shapeOf(row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
        .intersects(query)
    }.map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 300, s"degenerate selection: ${got.size}")
  }

  test("shapeRange works with segment and polygon query shapes too") {
    Seq[Shape](
      LineSegment(Point(0.0, 0.0), Point(48.0, 48.0)),
      Polygon((5.0, 5.0), (40.0, 5.0), (40.0, 40.0))).foreach { query =>
      val got = mixedDf.shapeRange("shape", query)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = mixedDf.select("id", "x", "y", "r").collect().filter { row =>
        shapeOf(row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
          .intersects(query)
      }.map(_.getLong(0)).toSet
      assert(got === want, s"query=$query")
      assert(got.nonEmpty, s"degenerate selection for $query")
    }
  }

  test("stDistance equals ADT minDist row by row") {
    val query = Circle(Point(20.0, 20.0), 3.0)
    val got = mixedDf
      .select(col("id"), stDistance(col("shape"), stShape(query)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    mixedDf.select("id", "x", "y", "r").collect().foreach { row =>
      val want = shapeOf(row.getLong(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3)).minDist(query)
      assert(got(row.getLong(0)) === want, s"id=${row.getLong(0)}")
    }
  }

  test("shapeKnn equals brute-force minDist ordering") {
    val query = Point(22.0, 18.0)
    val got = mixedDf.shapeKnn("shape", query, 7, tieBreak = Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val want = mixedDf.select("id", "x", "y", "r").collect().map { row =>
      (row.getLong(0),
        shapeOf(row.getLong(0), row.getDouble(1), row.getDouble(2),
          row.getDouble(3)).minDist(query))
    }.sortBy { case (id, d) => (d, id) }.take(7).map(_._1).toSeq
    assert(got === want)
  }

  test("shape structs persist to parquet; predicate runs inside codegen") {
    // parquet round-trip both proves the struct encoding is storable and
    // gives the filter a real scan to sit on (local relations are folded
    // at plan time, so no physical filter would exist to inspect)
    val dir = java.nio.file.Files.createTempDirectory("graft_shape_pq").toString
    mixedDf.write.mode("overwrite").parquet(dir)
    val query = MBR(Point(10.0, 8.0), Point(30.0, 28.0))
    val q = spark.read.parquet(dir).shapeRange("shape", query)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("shape_intersects"), plan)
    // "*(n) Filter" = the filter runs inside whole-stage codegen stage n
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined, plan)
    val want = mixedDf.shapeRange("shape", query)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(q.select("id").collect().map(_.getLong(0)).toSet === want)
  }

  test("shape expressions reject wrong field types at analysis, not runtime") {
    import spark.implicits._
    // struct with the right ARITY but wrong field types: must be a clean
    // analysis error, not a ClassCastException inside generated code
    val bad = Seq(("a", "b")).toDF("x", "y")
      .select(struct(col("x"), col("y")).as("s1"),
        struct(col("x"), col("y")).as("s2"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(stIntersects(col("s1"), col("s2"))).collect()
    }
    assert(e.getMessage.contains("struct<tag:int, coords:array<double>>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(stDistance(col("s1"), col("s2"))).collect()
    }
    assert(e2.getMessage.contains("struct<tag:int, coords:array<double>>"))
  }

  test("WKT: every ADT kind formats and parses back losslessly") {
    // Point / LineSegment / Polygon / Circle round-trip identically;
    // MBR formats to its polygon ring and parses back geometrically equal
    val roundTrippable = Seq(
      Point(1.5, -2.25),
      Point(1.0, 2.0, 3.5),
      LineSegment(Point(0.0, 0.0), Point(4.0, 3.0)),
      Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Circle(Point(5.0, 5.0), 2.5))
    roundTrippable.foreach { s =>
      assert(Wkt.parse(Wkt.format(s)) === s, s"round trip of $s via '${Wkt.format(s)}'")
    }
    val box = MBR(Point(1.0, 2.0), Point(3.0, 4.0))
    Wkt.parse(Wkt.format(box)) match {
      case p: Polygon =>
        assert(p.intersects(box) && box.contains(Point(2.0, 3.0)) === p.contains(Point(2.0, 3.0)))
        assert(p.vertices.length === 4)
      case other => fail(s"box should parse as its polygon ring, got $other")
    }
    // ring closure tolerated on input, emitted on output
    assert(Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4))") ===
      Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(Wkt.format(Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0))).endsWith("0.0 0.0))"))

    // strict failures with the offending text
    Seq("POINT ()", "LINESTRING (0 0)", "POLYGON ((0 0, 1 1))",
      "TRIANGLE (0 0, 1 1, 2 0)", "POINT (a b)").foreach { bad =>
      val e = intercept[IllegalArgumentException](Wkt.parse(bad))
      assert(e.getMessage.contains(bad), s"message must cite input: ${e.getMessage}")
    }
  }

  test("WKB: golden PostGIS hex, both endiannesses, lossless round-trip") {
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden little-endian vectors (PostGIS `SELECT ST_AsBinary(...)`)
    assert(hex(Wkb.format(Point(1.0, 2.0))) ===
      "0101000000000000000000f03f0000000000000040")
    assert(hex(Wkb.format(LineSegment(Point(0.0, 0.0), Point(1.0, 1.0)))) ===
      "0102000000020000000000000000000000000000000000000" +
        "0000000000000f03f000000000000f03f")
    // POLYGON((0 0,1 0,1 1,0 0)): 1 ring, closed on output (4 vertices)
    assert(hex(Wkb.format(Polygon((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)))) ===
      "010300000001000000040000000000000000000000000000000000000" +
        "0000000000000f03f0000000000000000000000000000f03f000000000000f03f" +
        "00000000000000000000000000000000")
    // round-trip is bit-lossless for every 2-D kind
    val roundTrippable = Seq(
      Point(1.5, -2.25),
      LineSegment(Point(0.0, 0.0), Point(4.0, 3.0)),
      Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Circle(Point(5.0, 5.0), 2.5))
    roundTrippable.foreach { s =>
      assert(Wkb.parse(Wkb.format(s)) === s,
        s"round trip of $s via ${hex(Wkb.format(s))}")
    }
    // a box emits its polygon ring and parses back geometrically equal
    // (the Wkt precedent — standard bytes PostGIS can read)
    val box = MBR(Point(1.0, 2.0), Point(3.0, 4.0))
    Wkb.parse(Wkb.format(box)) match {
      case p: Polygon =>
        assert(p.intersects(box) &&
          box.contains(Point(2.0, 3.0)) === p.contains(Point(2.0, 3.0)))
        assert(p.vertices.length === 4)
      case other => fail(s"box should parse as its polygon ring, got $other")
    }
    // big-endian input accepted (JTS-style): POINT(1 2) BE
    assert(Wkb.parse(unhex(
      "00000000013ff00000000000004000000000000000")) === Point(1.0, 2.0))
    // the circle extension survives a round trip but is flagged NON-OGC
    assert(Wkb.TypeCircleExt > 0x3000,
      "extension type must sit outside the OGC/ISO Z/M/ZM bands")
    // strict failures citing the bytes
    Seq(
      "01",                            // truncated header
      "0107000000",                    // unsupported type (multipoint)
      "020100000000",                  // bad byte-order marker
      "010200000003000000"             // 3-vertex linestring (not a segment)
    ).foreach { bad =>
      val e = intercept[IllegalArgumentException](Wkb.parse(unhex(bad)))
      assert(e.getMessage.contains("0x"),
        s"message must cite the bytes: ${e.getMessage}")
    }
    // n-D shapes have no standard WKB form: loud error, like Wkt's n-D box
    intercept[IllegalArgumentException](Wkb.format(Point(1.0, 2.0, 3.0)))
  }

  test("WKT <-> WKB <-> struct agree on every expressible shape") {
    // the three codecs are views of one ADT: for every 2-D shape the
    // WKT text, the WKB bytes, and the struct encoding all decode to
    // the same geometry
    val shapes = Seq(
      Point(1.5, -2.25),
      LineSegment(Point(0.0, 0.0), Point(4.0, 3.0)),
      Polygon((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Circle(Point(5.0, 5.0), 2.5))
    shapes.foreach { s =>
      val viaWkt = Wkt.parse(Wkt.format(s))
      val viaWkb = Wkb.parse(Wkb.format(s))
      val (tag, coords) = ShapeCodec.encode(s)
      val viaStruct = ShapeCodec.decode(tag, coords)
      assert(viaWkt === viaWkb && viaWkb === viaStruct && viaStruct === s,
        s"codec disagreement on $s")
      // and crossing codecs composes: struct -> wkb -> wkt -> shape
      assert(Wkt.parse(Wkt.format(Wkb.parse(Wkb.format(viaStruct)))) === s)
    }
  }

  test("stAsWkb / stFromWkb round-trip as columns, SQL-callable") {
    import spark.implicits._
    val df = Seq((1L, 2.5, 3.5), (2L, -1.0, 0.0)).toDF("id", "x", "y")
    val back = df.select(col("id"),
      stFromWkb(stAsWkb(stPoint(col("x"), col("y")))).as("s"))
      .select(col("id"), col("s.coords").as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(back(1L) === Seq(2.5, 3.5) && back(2L) === Seq(-1.0, 0.0))

    graft.plans.GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      "SELECT hex(graft_st_aswkb(graft_st_fromwkt('POINT (1 2)'))) AS w").head()
    assert(row.getString(0).toLowerCase ===
      "0101000000000000000000f03f0000000000000040")
    val back2 = spark.sql(
      "SELECT graft_st_aswkt(graft_st_fromwkb(graft_st_aswkb(" +
        "graft_st_fromwkt('POINT (1.5 2.5)')))) AS w").head()
    assert(back2.getString(0) === "POINT (1.5 2.5)")
  }

  test("stAsWkt / stFromWkt round-trip as columns, SQL-callable") {
    import spark.implicits._
    val df = Seq((1L, 2.5, 3.5), (2L, -1.0, 0.0)).toDF("id", "x", "y")
    val back = df.select(col("id"),
      stFromWkt(stAsWkt(stPoint(col("x"), col("y")))).as("s"))
      .select(col("id"), col("s.coords").as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(back(1L) === Seq(2.5, 3.5) && back(2L) === Seq(-1.0, 0.0))

    graft.plans.GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      "SELECT graft_st_aswkt(graft_st_fromwkt('POINT (1.5 2.5)')) AS w").head()
    assert(row.getString(0) === "POINT (1.5 2.5)")
  }

  test("graft_st_intersects / graft_st_distance are SQL-callable") {
    graft.plans.GraftExtensions.registerFunctions(spark)
    mixedDf.createOrReplaceTempView("shapes_t")
    val n = spark.sql(
      """SELECT count(*) FROM shapes_t
        |WHERE graft_st_intersects(shape,
        |  named_struct('tag', 1, 'coords', array(10.0D, 8.0D, 30.0D, 28.0D)))""".stripMargin)
      .head().getLong(0)
    val want = mixedDf.shapeRange("shape",
      MBR(Point(10.0, 8.0), Point(30.0, 28.0))).count()
    assert(n === want)
    val d = spark.sql(
      """SELECT graft_st_distance(
        |  named_struct('tag', 0, 'coords', array(0.0D, 0.0D)),
        |  named_struct('tag', 2, 'coords', array(3.0D, 4.0D, 1.0D)))""".stripMargin)
      .head().getDouble(0)
    assert(d === 4.0) // |(0,0)-(3,4)| - r = 5 - 1
  }
}

package graft.spatial

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SpatialOps._

/** Typed-Dataset class inference over a Point UDT — the reference's
  * SpatialClassInference example (examples/SpatialClassInference.scala:
  * 29-40), previously a documented gap (SURVEY §1.4 assumed UDT was
  * private API on Spark 4; UDTRegistration + UserDefinedType are usable). */
class PointUdtSpec extends SparkSpec {

  SpatialUDT.register() // before the first Encoder derivation

  import spark.implicits._

  private lazy val pts =
    (0 until 1000).map(x => PointData(Point(Array(x.toDouble % 50, x.toDouble % 31)), x + 1)).toDS()

  test("case-class Dataset with a Point field round-trips and stays typed") {
    val ds = pts
    assert(ds.schema("p").dataType.isInstanceOf[PointUDT])
    // typed access survives query verbs (Dataset[T], not DataFrame)
    val got: Array[PointData] = ds.range("p", Array(1.0, 1.0), Array(4.0, 5.0)).collect()
    assert(got.nonEmpty && got.forall(r =>
      r.p.coord(0) >= 1 && r.p.coord(0) <= 4 && r.p.coord(1) >= 1 && r.p.coord(1) <= 5))
  }

  test("point-column verbs equal the coordinate-column twins") {
    val coords = pts.select(col("payload"),
      graft.functions.pointCoord(col("p"), 0).as("x"),
      graft.functions.pointCoord(col("p"), 1).as("y"))

    val gotRange = pts.range("p", Array(10.0, 5.0), Array(20.0, 15.0))
      .select("payload").as[Int].collect().sorted
    val wantRange = coords.boxRange(Seq("x", "y"), Seq(10.0, 5.0), Seq(20.0, 15.0))
      .select("payload").as[Int].collect().sorted
    assert(gotRange.toSeq === wantRange.toSeq && gotRange.nonEmpty)

    val gotCircle = pts.circleRange("p", Array(25.0, 15.0), 6.0)
      .select("payload").as[Int].collect().sorted
    val wantCircle = coords.circleRange(Seq("x", "y"), Seq(25.0, 15.0), 6.0)
      .select("payload").as[Int].collect().sorted
    assert(gotCircle.toSeq === wantCircle.toSeq && gotCircle.nonEmpty)

    // knn: compare distance MULTISETS (ties unordered by contract)
    def d(r: PointData) = math.sqrt(
      math.pow(r.p.coord(0) - 25.0, 2) + math.pow(r.p.coord(1) - 15.0, 2))
    val gotKnn = pts.knn("p", Array(25.0, 15.0), 10).collect().map(d).sorted
    val wantKnn = coords
      .knn(Seq("x", "y"), Seq(25.0, 15.0), 10, tieBreak = Seq("payload"))
      .withColumn("d", graft.functions.pointDistance(
        Seq(col("x"), col("y")), Seq(lit(25.0), lit(15.0))))
      .select("d").as[Double].collect().sorted
    assert(gotKnn.toSeq === wantKnn.toSeq)
  }

  test("UDT column survives a parquet round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_udt").toString
    pts.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet carries the UDT through schema metadata — the column reads
    // back as a Point UDT, addressable by the same accessor
    assert(back.schema("p").dataType.isInstanceOf[PointUDT])
    val got = back.select(col("payload"), graft.functions.pointCoord(col("p"), 0).as("x"))
      .where(col("payload") <= 5).collect().map(r => (r.getInt(0), r.getDouble(1))).sorted
    val want = pts.filter(_.payload <= 5).collect()
      .map(r => (r.payload, r.p.coord(0))).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("point-column joins equal their coordinate-column twins") {
    val left = pts.limit(200)
    val right = (0 until 200).map(x =>
      RPointData(Point(Array((x * 7 % 50).toDouble, (x * 3 % 31).toDouble)), x)).toDS()
    val lc = left.select(col("payload"),
      graft.functions.pointCoord(col("p"), 0).as("x"),
      graft.functions.pointCoord(col("p"), 1).as("y"))
    val rc = right.select(col("rpayload"),
      graft.functions.pointCoord(col("rp"), 0).as("rx"),
      graft.functions.pointCoord(col("rp"), 1).as("ry"))

    val gotD = left.distanceJoin(right, "p", "rp", 2.0)
      .select(col("payload"), col("rpayload"))
      .as[(Int, Int)].collect().sorted
    val wantD = lc.distanceJoin(rc, Seq("x", "y"), Seq("rx", "ry"), 2.0)
      .select(col("payload"), col("rpayload"))
      .as[(Int, Int)].collect().sorted
    assert(gotD.toSeq === wantD.toSeq && gotD.nonEmpty)

    // kNN join: compare per-left neighbor-distance multisets
    val gotK = left.knnJoin(right, "p", "rp", 3)
    assert(gotK.count() === left.count() * 3)
    assert(gotK.columns.toSeq === Seq("p", "payload", "rp", "rpayload"))
  }

  test("point-column joins reject mismatched dimensionality") {
    val left = pts.limit(20)
    val right3d = (0 until 20).map(x =>
      RPointData(Point(Array(x.toDouble, x.toDouble, x.toDouble)), x)).toDS()
    val e = intercept[IllegalArgumentException] {
      left.distanceJoin(right3d, "p", "rp", 2.0).count()
    }
    assert(e.getMessage.contains("dimensionality mismatch"))
  }

  test("null point rows are excluded from knn, kept filterable in range") {
    val withNull = pts.limit(3).collect().toSeq :+ PointData(null, 9999)
    val ds = withNull.toDS()
    assert(ds.knn("p", Array(0.0, 0.0), 4).collect().forall(_.p != null))
    assert(ds.range("p", Array(-1e9, -1e9), Array(1e9, 1e9)).count() === 3)
  }
}

case class PointData(p: Point, payload: Int)
case class RPointData(rp: Point, rpayload: Int)

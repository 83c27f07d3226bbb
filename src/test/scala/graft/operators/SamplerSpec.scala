package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the estimator plumbing every kNN join builds on: uniform
  * bounded sampling (no partition-order bias), exact distributed
  * kth-NN radii, and the per-cell-theta sample floor that differs by
  * cell geometry. Each assertion here is the spec form of a measured
  * 100-TB-class failure (see BASELINE.md round-15 addenda): biased
  * pivots once drained 72% of a 10x slice's lefts into one Voronoi
  * cell, and an extrapolated density correction misestimated theta in
  * BOTH directions at a 0.0013 sampling fraction.
  */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  test("samplePoints: uniform cap on partition-clustered data reaches every cluster") {
    // 10 partitions, each a distinct x-band — the ingest-ordered shape.
    // A head-biased cap (sample(f).limit(cap) or bare limit(cap)) sees
    // only the first band(s); the uniform cap must span nearly all.
    val df = spark.range(0, 30000, 1, 10)
      .select((col("id") / lit(3000)).cast("long").as("band"),
        (col("id") % 3000).cast("double").as("off"))
      .select((col("band") * 1000.0 + col("off") / 3.0).as("x"),
        col("off").as("y"))
    val pts = SpatialOps.samplePoints(df, Seq("x", "y"), cap = 2000)
    assert(pts.length == 2000)
    val bands = pts.map(p => math.floor(p(0) / 1000.0).toLong).distinct
    assert(bands.length >= 9,
      s"uniform sample must reach ~all 10 x-bands, saw ${bands.length}")
  }

  test("exactKthRadii equals the brute-force kth distance") {
    val rng = new scala.util.Random(7)
    val rights = Array.fill(500)(Array(rng.nextDouble() * 100, rng.nextDouble() * 100))
    val probes = Array.fill(40)(Array(rng.nextDouble() * 100, rng.nextDouble() * 100))
    val rDf = rights.toSeq.map(a => (a(0), a(1))).toDF("rx", "ry")
      .repartition(7) // multiple partitions: exercises the treeAggregate merge
    val got = SpatialOps.exactKthRadii(rDf, Seq("rx", "ry"), probes, k = 3)
    val want = probes.map { p =>
      rights.map(r => math.sqrt(math.pow(p(0) - r(0), 2) + math.pow(p(1) - r(1), 2)))
        .sorted.apply(2)
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-9, s"probe $i: $g vs $w")
    }
  }

  test("sampleKnnRadii theta is sampling-fraction-stable (no extrapolated correction)") {
    // Same data, two right-side sizes (cap << n so the exact pass runs):
    // theta should track the TRUE kth-NN distance of each density, not
    // the sampling fraction. Doubling density with everything else
    // fixed must SHRINK theta (more neighbors closer), never inflate it
    // — the failure mode of the old rFrac^(1/d) correction at tiny
    // fractions was theta INFLATION on effectively-low-dim data.
    // n points scattered over the SAME ~[0,1000)^2 domain (multiplicative
    // lattice mod two distinct primes: the (x, y) sequence's period is
    // lcm(1009, 997) ≈ 1M, so all n points are distinct — deterministic,
    // no RNG), so growing n genuinely densifies
    def scatter(n: Int, a: Long, b: Long, px: String, py: String) =
      spark.range(0, n, 1, 8).select(
        ((col("id") * a) % 1009).cast("double").as(px),
        ((col("id") * b) % 997).cast("double").as(py))
    val l = scatter(2000, 53, 17, "lx", "ly")
    val (_, _, thetaSparse, _) = SpatialOps.sampleKnnRadii(
      l, scatter(8000, 37, 91, "rx", "ry"),
      Seq("lx", "ly"), Seq("rx", "ry"), k = 3, cap = 500, quantile = 0.95, safety = 2.0)
    val (_, _, thetaDense, _) = SpatialOps.sampleKnnRadii(
      l, scatter(64000, 37, 91, "rx", "ry"),
      Seq("lx", "ly"), Seq("rx", "ry"), k = 3, cap = 500, quantile = 0.95, safety = 2.0)
    assert(thetaDense < thetaSparse,
      s"8x denser right side must shrink theta: sparse $thetaSparse dense $thetaDense")
  }

  test("exactKthShapeRadii equals the brute-force kth shape distance") {
    import graft.spatial.{Shape, Point, MBR, ShapeCodec}
    val rng = new scala.util.Random(11)
    def pt() = Point(Array(rng.nextDouble() * 100, rng.nextDouble() * 100))
    def box() = {
      val x = rng.nextDouble() * 100; val y = rng.nextDouble() * 100
      MBR(Point(Array(x, y)),
        Point(Array(x + rng.nextDouble() * 5, y + rng.nextDouble() * 5)))
    }
    val rights: Array[Shape] = Array.fill(300)(if (rng.nextBoolean()) pt() else box())
    val probes: Array[Shape] = Array.fill(25)(if (rng.nextBoolean()) pt() else box())
    val rDf = rights.toSeq.map { s =>
      val (tag, coords) = ShapeCodec.encode(s); (tag, coords.toSeq)
    }.toDF("tag", "coords")
      .select(struct(col("tag"), col("coords")).as("shp"))
      .repartition(5)
    val got = SpatialOps.exactKthShapeRadii(rDf, "shp", probes, k = 3)
    val want = probes.map(p => rights.map(p.minDist).sorted.apply(2))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-9, s"probe $i: $g vs $w")
    }
  }

  test("perCellQuantile: minSamples gates sparse-sampled cells, default keeps all") {
    val cells = Array.fill(10)("dense") ++ Array("sparse", "sparse")
    val radii = Array.tabulate(10)(i => 1.0 + i * 0.1) ++ Array(0.2, 0.3)
    val all = SpatialOps.perCellQuantile(cells, radii, 0.95, cap = 10.0)
    assert(all.keySet == Set("dense", "sparse"))
    assert(all("sparse") == 0.3) // 2-sample "quantile" is the max sample
    val floored = SpatialOps.perCellQuantile(cells, radii, 0.95, cap = 10.0, minSamples = 8)
    assert(floored.keySet == Set("dense"),
      "a 2-sample cell must fall back to the global theta under the pivot floor")
  }
}

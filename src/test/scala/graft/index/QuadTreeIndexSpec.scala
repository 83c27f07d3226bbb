package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.SpatialOps._
import graft.spatial.{MBR, Point, ZValue}

/** The quadtree index (COVERAGE.md §2.4, reference
  * QuadTreeIndexedRelation.scala:28-85 / QuadTreePartitioner.scala:34-128):
  * exact-tree global level, capacity splits, multi-interval pruning, and
  * result parity with the unindexed operators and the z index. */
class QuadTreeIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val cust = Tables.customerPts(spark, sf())

  private def withQuad(name: String, capacity: Long = 0L)
                      (body: QuadTreeIndexedTable => Unit): Unit = {
    val idx = IndexManager.quadTreeIndexTable(spark, cust, name,
      Seq("cx", "cy"), numPartitions = 8, capacity = capacity)
    try body(idx) finally IndexManager.dropIndex(spark, name)
  }

  test("quadtree boxRange / circleRange / knn equal the unindexed operators") {
    withQuad("qt_parity") { idx =>
      val gotBox = idx.boxRange(Array(0.0, 100.0), Array(5000.0, 600.0))
      val wantBox = cust.boxRange(Seq("cx", "cy"), Seq(0.0, 100.0), Seq(5000.0, 600.0))
      assert(gotBox.count() > 0)
      assert(gotBox.exceptAll(wantBox).isEmpty && wantBox.exceptAll(gotBox).isEmpty)

      val gotC = idx.circleRange(Array(5000.0, 500.0), 800.0)
      val wantC = cust.circleRange(Seq("cx", "cy"), Seq(5000.0, 500.0), 800.0)
      assert(gotC.exceptAll(wantC).isEmpty && wantC.exceptAll(gotC).isEmpty)

      Seq(1, 5, 25).foreach { k =>
        val got = idx.knn(Array(5000.0, 500.0), k, Seq("c_custkey"))
          .select("c_custkey").collect().map(_.getLong(0)).sorted
        val want = cust.knn(Seq("cx", "cy"), Seq(5000.0, 500.0), k, Seq("c_custkey"))
          .select("c_custkey").collect().map(_.getLong(0)).sorted
        assert(got.toSeq === want.toSeq, s"k=$k")
      }
    }
  }

  test("leaves: disjoint sorted z-intervals, counts cover the table, capacity holds") {
    withQuad("qt_leaves", capacity = 64L) { idx =>
      val ls = idx.leaves
      assert(ls.length > 1)
      ls.sliding(2).foreach { case Array(a, b) =>
        assert(a.zHi < b.zLo, "leaf intervals must be disjoint and sorted")
      case _ =>
      }
      assert(ls.map(_.count).sum === cust.count())
      // every leaf respects capacity unless it bottomed out at max depth
      // (max depth for 2-D/15-bit is 8 -> cell bits 2*(15-8)=14)
      val minCellBits = 2 * (15 - 8)
      ls.foreach { l =>
        val atMaxDepth = (l.zHi - l.zLo + 1) == (1L << minCellBits)
        assert(l.count <= 64L || atMaxDepth,
          s"leaf [${l.zLo},${l.zHi}] holds ${l.count} > capacity without max depth")
      }
    }
  }

  test("multi-interval pruning beats the single covering z-interval at quadrant seams") {
    // points in all four quadrants around the origin: the single
    // z-interval [z(lo), z(hi)] of a centered box covers nearly the whole
    // curve, while quadtree leaves decompose it into tight pieces
    val pts = (for { i <- -50 to 50; j <- -50 to 50 if (i + j) % 7 == 0 }
      yield (i.toLong * 1000 + j, i.toDouble, j.toDouble))
      .toDF("id", "x", "y")
    val idx = IndexManager.quadTreeIndexTable(spark, pts, "qt_seam",
      Seq("x", "y"), numPartitions = 8, capacity = 32L)
    try {
      val lo = Array(-3.0, -3.0)
      val hi = Array(3.0, 3.0)
      val got = idx.boxRange(lo, hi)
      val want = pts.filter(col("x").between(-3, 3) && col("y").between(-3, 3))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

      // rows admitted by the quadtree's interval union...
      val ivs = idx.intervalsFor(_.mbr.intersects(MBR(Point(lo), Point(hi))))
      assert(ivs.length > 1, "a seam box should decompose into several intervals")
      val quadAdmitted = ivs.map { case (l, h) =>
        idx.leaves.filter(lf => lf.zLo >= l && lf.zHi <= h).map(_.count).sum
      }.sum
      // ...vs the single covering interval of the plain z index
      def zOf(p: Array[Double]): Long = ZValue.interleave(
        Array(ZValue.quantize(p(0), -50.0, 50.0, 15),
              ZValue.quantize(p(1), -50.0, 50.0, 15)), 15)
      val (zlo, zhi) = (zOf(lo), zOf(hi))
      val singleAdmitted = idx.leaves
        .filter(lf => lf.zHi >= zlo && lf.zLo <= zhi).map(_.count).sum
      assert(quadAdmitted < singleAdmitted / 2,
        s"interval union should admit <half the single-interval rows " +
          s"(got $quadAdmitted vs $singleAdmitted)")
    } finally IndexManager.dropIndex(spark, "qt_seam")
  }

  test("null-keyed rows: build succeeds, results match the z-index parity contract") {
    val withNulls = cust.withColumn("cx",
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("cx")))
    val idx = IndexManager.quadTreeIndexTable(spark, withNulls, "qt_nulls",
      Seq("cx", "cy"), numPartitions = 8)
    try {
      val got = idx.boxRange(Array(0.0, 100.0), Array(5000.0, 600.0))
      val want = withNulls.boxRange(Seq("cx", "cy"), Seq(0.0, 100.0), Seq(5000.0, 600.0))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() > 0)
      // the tree covers exactly the non-null rows
      assert(idx.leaves.map(_.count).sum ===
        withNulls.filter(col("cx").isNotNull).count())
    } finally IndexManager.dropIndex(spark, "qt_nulls")
  }

  test("persist/load round trip: same results, same tree") {
    withQuad("qt_persist") { idx =>
      val dir = java.nio.file.Files.createTempDirectory("graft_qt").toString
      IndexManager.persistQuadIndex(idx, dir)
      IndexManager.dropIndex(spark, "qt_persist_loaded")
      val loaded = IndexManager.loadQuadIndex(spark, "qt_persist_loaded", dir)
      try {
        val got = loaded.boxRange(Array(2000.0, 100.0), Array(4000.0, 300.0))
        val want = cust.boxRange(Seq("cx", "cy"), Seq(2000.0, 100.0), Seq(4000.0, 300.0))
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
        assert(loaded.leaves.map(l => (l.zLo, l.zHi, l.count)).toSeq ===
          idx.leaves.map(l => (l.zLo, l.zHi, l.count)).toSeq,
          "recomputed tree must match (deterministic function of data+params)")
      } finally IndexManager.dropIndex(spark, "qt_persist_loaded")
    }
  }

  test("IndexType vocabulary and facade accept quadtree") {
    assert(IndexType("quadtree") === QuadTreeType)
    import graft.index.IndexOps._
    cust.index(QuadTreeType, "qt_ddl", Array("cx", "cy"))
    try {
      assert(IndexManager.showIndexes(spark).contains("qt_ddl"))
    } finally IndexManager.dropIndex(spark, "qt_ddl")
  }

  test("interval cap folds cheapest gaps, never loses rows") {
    withQuad("qt_cap", capacity = 8L) { idx =>
      // a keep-every-other-leaf predicate manufactures > maxIntervals runs
      val every = idx.leaves.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSet
      val ivs = idx.intervalsFor(every.contains)
      assert(ivs.length <= 64)
      // every kept leaf is inside some interval
      every.foreach { l =>
        assert(ivs.exists { case (lo, hi) => l.zLo >= lo && l.zHi <= hi },
          s"leaf [${l.zLo},${l.zHi}] lost by interval folding")
      }
    }
  }
}

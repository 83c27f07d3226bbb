package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.SpatialOps._

class KdTreePartitionerSpec extends SparkSpec {

  import KdTreePartitioner._

  private lazy val cust = Tables.customerPts(spark, sf())

  test("build: exact leaf count, balanced regions, assignment matches leaf boxes") {
    val (kd, tree) = partition(cust, Seq("cx", "cy"), parts = 8)
    assert(numLeaves(tree) === 8)
    val counts = kd.groupBy(col(RegionCol)).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 8).toSet, "every region holds rows")
    val n = cust.count()
    assert(counts.values.sum === n, "regions cover every row")
    // whole-table sample -> exact proportional medians -> near-balance
    assert(counts.values.max <= 2 * ((n + 7) / 8),
      s"unbalanced regions: $counts")
    // every row sits inside its region's half-open box
    val boxes = leafBoxes(tree, 2)
    val bad = kd.select(col(RegionCol), col("cx"), col("cy")).collect().filterNot { r =>
      val (lo, hi) = boxes(r.getInt(0))
      val p = Array(r.getDouble(1), r.getDouble(2))
      (0 until 2).forall(i => p(i) >= lo(i) && p(i) < hi(i))
    }
    assert(bad.isEmpty, s"rows outside their region box: ${bad.take(3).mkString}")
  }

  test("non-power-of-two parts split proportionally") {
    val (kd, tree) = partition(cust, Seq("cx", "cy"), parts = 5)
    assert(numLeaves(tree) === 5)
    val counts = kd.groupBy(col(RegionCol)).count()
      .collect().map(_.getLong(1))
    assert(counts.length === 5 && counts.max <= 2 * counts.min + 8,
      s"proportional split violated: ${counts.mkString(",")}")
  }

  test("degenerate input (identical points) collapses to one region") {
    import spark.implicits._
    val same = Seq.fill(100)((1.0, 2.0)).toDF("x", "y")
    val (kd, tree) = partition(same, Seq("x", "y"), parts = 8)
    assert(numLeaves(tree) === 1)
    assert(kd.select(col(RegionCol)).distinct().count() === 1)
  }

  test("region pruning: a selective box admits few regions, results stay exact") {
    val (kd, tree) = partition(cust, Seq("cx", "cy"), parts = 8)
    val (qlo, qhi) = (Array(2000.0, 100.0), Array(4000.0, 300.0))
    val admitted = admittedRegions(tree, 2, qlo, qhi)
    assert(admitted.nonEmpty && admitted.length < 8,
      s"selective box should prune regions, admitted: $admitted")
    // scanning ONLY the admitted regions loses nothing
    val got = kd.filter(col(RegionCol).isin(admitted: _*))
      .boxRange(Seq("cx", "cy"), qlo.toSeq, qhi.toSeq)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = cust.boxRange(Seq("cx", "cy"), qlo.toSeq, qhi.toSeq)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want && got.nonEmpty)
  }

  test("null keys land in the rightmost region and stay countable") {
    import spark.implicits._
    val withNull = Seq((1.0, 1.0), (2.0, 5.0), (3.0, 9.0), (8.0, 2.0))
      .toDF("x", "y")
      .unionByName(Seq((Option.empty[Double], Option(1.0))).toDF("x", "y"))
    val (kd, tree) = partition(withNull, Seq("x", "y"), parts = 2)
    assert(kd.count() === 5)
    val nullRegion = kd.filter(col("x").isNull).select(col(RegionCol)).head().getInt(0)
    assert(nullRegion === numLeaves(tree) - 1)
  }
}

package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.SpatialOps._

class SpatialDiskSpec extends SparkSpec {

  private lazy val cust = Tables.customerPts(spark, sf())

  private def freshLayout(tag: String): String = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_spatial_disk_spec_$tag").toString
    SpatialDisk.write(cust, path, Seq("cx", "cy"))
    path
  }

  test("disk box/circle range equal the in-memory verbs exactly") {
    val path = freshLayout("eq")
    val lo = Array(2000.0, 100.0); val hi = Array(4000.0, 300.0)
    val gotBox = SpatialDisk.boxRange(spark, path, lo, hi)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val wantBox = cust.boxRange(Seq("cx", "cy"), lo.toSeq, hi.toSeq)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotBox === wantBox && gotBox.nonEmpty)
    // output schema is the written table — no layout columns leak
    assert(SpatialDisk.boxRange(spark, path, lo, hi).columns.toSeq ===
      cust.columns.toSeq)

    val c = Array(5000.0, 500.0)
    val gotCirc = SpatialDisk.circleRange(spark, path, c, 500.0)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val wantCirc = cust.circleRange(Seq("cx", "cy"), c.toSeq, 500.0)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotCirc === wantCirc && gotCirc.nonEmpty)
  }

  test("the scan prunes cell directories via PartitionFilters") {
    val path = freshLayout("prune")
    val q = SpatialDisk.boxRange(spark, path,
      Array(2000.0, 100.0), Array(4000.0, 300.0))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__graft_cell"),
      s"no directory pruning in the scan:\n$plan")
    // the partition filter must actually carry the enumerated cell set
    assert(plan.contains("INSET"),
      s"cell IN-set missing from PartitionFilters:\n$plan")
    // the fine-z covering interval reaches the scan for row-group stats
    assert(plan.contains("__graft_z"),
      s"fine-z interval missing from the scan:\n$plan")
  }

  test("a selective box reads a sliver of the directories") {
    val path = freshLayout("sliver")
    // the box spans ~1/5 x ~1/5 of each axis, so the pruned read must
    // touch well under half the populated directories — measured from
    // the scan's own numPartitions metric, not the (elided) plan text
    val total = spark.read.parquet(s"$path/data")
      .select(count_distinct(col("__graft_cell"))).head().getLong(0)
    val q = SpatialDisk.boxRange(spark, path,
      Array(2000.0, 100.0), Array(4000.0, 300.0))
    val qe = q.queryExecution
    q.collect()
    val scans = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no file scan in:\n${qe.executedPlan}")
    val read = scans.head.metrics("numPartitions").value
    assert(read * 2 < total,
      s"query read $read of $total populated cells — no pruning win")
  }

  test("disk kNN equals the in-memory kNN; the walk prunes directories") {
    val path = freshLayout("knn")
    val c = Array(5000.0, 500.0)
    val got = SpatialDisk.knn(spark, path, c, 10, Seq("c_custkey"))
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = cust.knn(Seq("cx", "cy"), c.toSeq, 10, Seq("c_custkey"))
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want && got.size === 10)
    // the guaranteed-radius circle must not read the whole layout
    val total = spark.read.parquet(s"$path/data")
      .select(count_distinct(col("__graft_cell"))).head().getLong(0)
    val q = SpatialDisk.knn(spark, path, c, 10, Seq("c_custkey"))
    val qe = q.queryExecution
    q.collect()
    val scans = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val read = scans.head.metrics("numPartitions").value
    assert(read * 2 < total,
      s"kNN read $read of $total populated cells — no pruning win")
    // k past the table size degrades to the ordered full scan, still exact
    val all = SpatialDisk.knn(spark, path, c, cust.count().toInt + 5,
      Seq("c_custkey")).count()
    assert(all === cust.count())
  }

  test("a torn meta/data pair is refused, not silently mis-routed") {
    val path = freshLayout("torn")
    import spark.implicits._
    val tampered = spark.read.textFile(s"$path/meta").collect().toSeq
      .map(l => if (l.startsWith("token=")) "token=some-other-write" else l)
    spark.createDataset(tampered).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      SpatialDisk.boxRange(spark, path,
        Array(2000.0, 100.0), Array(4000.0, 300.0)).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")),
      s"torn layout not refused: $msgs")
  }

  test("queries clamp outside the written bounds instead of failing") {
    val path = freshLayout("clamp")
    // a box reaching far outside the data domain returns exactly the
    // in-bounds matches (quantization clamps; exact filter decides)
    val got = SpatialDisk.boxRange(spark, path,
      Array(-1e7, -1e7), Array(1e7, 1e7)).count()
    assert(got === cust.count(), "the all-covering box must return every row")
    val none = SpatialDisk.boxRange(spark, path,
      Array(1e7, 1e7), Array(2e7, 2e7)).count()
    assert(none === 0L, "a fully-outside box must return nothing")
  }
}

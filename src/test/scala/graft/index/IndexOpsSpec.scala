package graft.index

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.Tables
import graft.index.IndexOps._

/** Reference-parity Dataset index verbs: the call shapes of the
  * reference's DataSet.scala:178-226 must work verbatim against this
  * library (modulo the SparkSession argument the facade otherwise
  * takes). */
class IndexOpsSpec extends SparkSpec {

  private lazy val cust = Tables.customerPts(spark, sf())

  test("index() builds each reference index type; dropIndexByName removes") {
    cust.index(RTreeType, "v_rtree", Array("cx", "cy"))
    cust.index(TreeMapType, "v_range", Array("cx"))
    cust.index(HashMapType, "v_hash", Array("c_custkey"))
    try {
      assert(IndexManager.showIndexes(spark)
        .count(Set("v_rtree", "v_range", "v_hash")) === 3)
      // treap is the same clustering as treemap (rank queries unused)
      cust.index(IndexType("treap"), "v_treap", Array("cy"))
      assert(IndexManager.showIndexes(spark).contains("v_treap"))
      cust.index(IndexType("quadtree"), "v_quad", Array("cx", "cy"))
      assert(IndexManager.showIndexes(spark).contains("v_quad"))
      intercept[IllegalArgumentException](IndexType("octree"))
      intercept[IllegalArgumentException](
        cust.index(HashMapType, "v_bad", Array("cx", "cy")))
    } finally Seq("v_rtree", "v_range", "v_hash", "v_treap", "v_quad", "v_bad")
      .foreach(cust.dropIndexByName)
    assert(IndexManager.showIndexes(spark)
      .count(Set("v_rtree", "v_range", "v_hash", "v_treap", "v_quad")) === 0)
  }

  test("session-level DDL by table name (Graft facade)") {
    cust.createOrReplaceTempView("v_cust_pts")
    graft.Graft.indexTable(spark, "v_cust_pts", RTreeType, "v_tbl_idx",
      Array("cx", "cy"))
    try {
      assert(IndexManager.hasIndex(spark, "v_tbl_idx"))
      val dir = java.nio.file.Files.createTempDirectory("graft_tbl_idx").toString
      graft.Graft.persistIndex(spark, "v_tbl_idx", dir)
      IndexManager.dropIndex(spark, "v_tbl_idx")
      graft.Graft.loadAnyIndex(spark, "v_tbl_idx2", dir)
      assert(IndexManager.hasIndex(spark, "v_tbl_idx2"))
    } finally Seq("v_tbl_idx", "v_tbl_idx2")
      .foreach(IndexManager.dropIndex(spark, _))
  }

  test("table-scoped DDL: hasIndex/showIndex/drop by (table, index) plan match") {
    val other = Tables.supplierPts(spark, sf())
    cust.createOrReplaceTempView("v_scoped_cust")
    other.createOrReplaceTempView("v_scoped_supp")
    graft.Graft.indexTable(spark, "v_scoped_cust", RTreeType, "v_sc_idx", Array("cx", "cy"))
    graft.Graft.indexTable(spark, "v_scoped_supp", QuadTreeType, "v_ss_idx", Array("sx", "sy"))
    try {
      assert(graft.Graft.hasIndex(spark, "v_scoped_cust", "v_sc_idx"))
      assert(!graft.Graft.hasIndex(spark, "v_scoped_cust", "v_ss_idx"),
        "another table's index must not match")
      assert(graft.Graft.showIndex(spark, "v_scoped_cust") === Seq("v_sc_idx"))
      assert(graft.Graft.showIndex(spark, "v_scoped_supp") === Seq("v_ss_idx"))
      // wrong table: drop is a no-op; right table: drops
      graft.Graft.dropIndexTableByName(spark, "v_scoped_cust", "v_ss_idx")
      assert(IndexManager.hasIndex(spark, "v_ss_idx"))
      graft.Graft.dropIndexTableByName(spark, "v_scoped_supp", "v_ss_idx")
      assert(!IndexManager.hasIndex(spark, "v_ss_idx"))
    } finally Seq("v_sc_idx", "v_ss_idx").foreach(IndexManager.dropIndex(spark, _))
  }

  test("dropIndex() drops by plan match, not by name") {
    val other = Tables.supplierPts(spark, sf())
    cust.index(RTreeType, "v_mine", Array("cx", "cy"))
    other.index(RTreeType, "v_other", Array("sx", "sy"))
    try {
      cust.dropIndex()
      assert(!IndexManager.hasIndex(spark, "v_mine"), "same-plan index must drop")
      assert(IndexManager.hasIndex(spark, "v_other"), "unrelated index must survive")
    } finally Seq("v_mine", "v_other").foreach(IndexManager.dropIndex(spark, _))
  }

  test("setStorageLevel re-caches the named index at the new level") {
    cust.index(RTreeType, "v_level", Array("cx", "cy"))
    try {
      cust.setStorageLevel("v_level", StorageLevel.DISK_ONLY)
      val idx = IndexManager.indexTable(spark, cust, "v_level", Seq("cx", "cy"))
      assert(idx.data.storageLevel === StorageLevel.DISK_ONLY)
      assert(idx.boxRange(Array(0.0, 100.0), Array(5000.0, 600.0)).count() > 0)
      intercept[IllegalArgumentException](
        cust.setStorageLevel("v_nope", StorageLevel.DISK_ONLY))
    } finally IndexManager.dropIndex(spark, "v_level")
  }

  test("persistIndex/loadIndex verbs round-trip every kind via metadata dispatch") {
    val dirs = (1 to 3).map(_ => java.nio.file.Files.createTempDirectory("graft_vrb").toString)
    cust.index(RTreeType, "v_pz", Array("cx", "cy"))
      .index(TreeMapType, "v_pr", Array("cx"))
      .index(HashMapType, "v_ph", Array("c_custkey"))
    try {
      cust.persistIndex("v_pz", dirs(0))
        .persistIndex("v_pr", dirs(1))
        .persistIndex("v_ph", dirs(2))
      Seq("v_pz", "v_pr", "v_ph").foreach(cust.dropIndexByName)
      cust.loadIndex("v_pz2", dirs(0))
        .loadIndex("v_pr2", dirs(1))
        .loadIndex("v_ph2", dirs(2))
      assert(IndexManager.showIndexes(spark)
        .count(Set("v_pz2", "v_pr2", "v_ph2")) === 3)
      // the loaded z-index answers through the registry
      val z = IndexManager.indexTable(spark, cust, "v_pz2", Seq("cx", "cy"))
      val got = z.boxRange(Array(0.0, 100.0), Array(5000.0, 600.0))
      val want = cust.filter(col("cx") >= 0 && col("cx") <= 5000 &&
        col("cy") >= 100 && col("cy") <= 600)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally Seq("v_pz", "v_pr", "v_ph", "v_pz2", "v_pr2", "v_ph2")
      .foreach(IndexManager.dropIndex(spark, _))
  }
}

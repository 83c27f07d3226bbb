package graft.index

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** The reference's index-type vocabulary (reference: index/Index.scala:
  * 26-41), mapped onto this library's four clusterings: RTree -> the
  * z-order spatial index, TreeMap/Treap -> the 1-D range index (the
  * treap's extra rank queries are unused by the reference's own scans),
  * HashMap -> the hash index, QuadTree -> the quadtree index (driver-held
  * exact tree over Morton-prefix cells, multi-interval pruning). */
sealed abstract class IndexType
case object RTreeType extends IndexType
case object TreeMapType extends IndexType
case object TreapType extends IndexType
case object HashMapType extends IndexType
case object QuadTreeType extends IndexType

object IndexType {
  /** Parse the reference's names (reference: index/Index.scala:26-33). */
  def apply(typ: String): IndexType = typ.toLowerCase match {
    case "rtree"    => RTreeType
    case "treemap"  => TreeMapType
    case "treap"    => TreapType
    case "hashmap"  => HashMapType
    case "quadtree" => QuadTreeType
    case other => throw new IllegalArgumentException(
      s"unknown index type: $other (expected rtree|quadtree|treemap|treap|hashmap)")
  }
}

/** Reference-parity index verbs attached to any Dataset — the surface of
  * the reference's `DataSet` index block (reference: DataSet.scala:
  * 178-226: `index`, `setStorageLevel`, `dropIndex`, `dropIndexByName`,
  * `persistIndex`, `loadIndex`), delegating to [[IndexManager]]. Verbs
  * return the dataset for chaining like the reference's `this.type`;
  * the built index itself is retrievable through the `Graft` facade or
  * `IndexManager`. */
object IndexOps {

  implicit class DatasetIndexOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Build an index of the given type over `column`s of this dataset
      * (reference: DataSet.scala:178-182). */
    def index(indexType: IndexType, indexName: String, column: Array[String]): Dataset[T] = {
      val spark = ds.sparkSession
      val parts = graft.GraftConf.indexPartitions(spark)
      indexType match {
        case RTreeType =>
          IndexManager.indexTable(spark, ds.toDF, indexName, column.toSeq,
            parts, graft.GraftConf.indexBits(spark))
        case QuadTreeType =>
          IndexManager.quadTreeIndexTable(spark, ds.toDF, indexName, column.toSeq,
            parts, graft.GraftConf.indexBits(spark))
        case TreeMapType | TreapType =>
          require(column.length == 1, s"$indexType indexes one column, got ${column.length}")
          IndexManager.rangeIndexTable(spark, ds.toDF, indexName, column.head, parts)
        case HashMapType =>
          require(column.length == 1, s"$indexType indexes one column, got ${column.length}")
          IndexManager.hashIndexTable(spark, ds.toDF, indexName, column.head, parts)
      }
      ds
    }

    /** Re-cache the named index at a different storage level
      * (reference: DataSet.scala:186-189 / IndexManager.scala:179-187). */
    def setStorageLevel(indexName: String, level: StorageLevel): Dataset[T] = {
      IndexManager.setStorageLevel(ds.sparkSession, indexName, level)
      ds
    }

    /** Drop every index built FROM THIS dataset's plan — the
      * reference's plan-matched drop (reference: DataSet.scala:194-197,
      * IndexManager dedups and drops by `plan.sameResult` the same way).
      * All four kinds register a plan substitution, so all four match. */
    def dropIndex(): Dataset[T] = {
      IndexManager.dropIndexesOfPlan(ds.sparkSession, ds.toDF)
      ds
    }

    /** Reference signature parity (reference: DataSet.scala:194-202).
      * `blocking` is accepted for source compatibility; unpersist here is
      * always non-blocking (Spark's own default), which is also what the
      * reference passes for the no-arg form. */
    def dropIndex(blocking: Boolean): Dataset[T] = dropIndex()

    def dropIndexByName(indexName: String): Dataset[T] = {
      IndexManager.dropIndex(ds.sparkSession, indexName)
      ds
    }

    /** Persist the named index (any kind) to `fileName`
      * (reference: DataSet.scala:214-217). */
    def persistIndex(indexName: String, fileName: String): Dataset[T] = {
      IndexManager.persistIndexByName(ds.sparkSession, indexName, fileName)
      ds
    }

    /** Load an index persisted at `fileName` under `indexName`, whatever
      * its kind — dispatched on the persisted metadata
      * (reference: DataSet.scala:222-225). */
    def loadIndex(indexName: String, fileName: String): Dataset[T] = {
      IndexManager.loadIndexAuto(ds.sparkSession, indexName, fileName)
      ds
    }
  }
}

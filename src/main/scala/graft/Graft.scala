package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.{HashIndexedTable, IndexManager, IndexedTable, QuadTreeIndexedTable, RangeIndexedTable, SpatialDisk}

/** Session facade — the migration surface for users of the reference
  * engine's `SimbaSession` index DDL (reference: SimbaSession.scala:40-89:
  * `indexTable`, `showIndex`, `persistIndex`, `loadIndex`,
  * `dropIndexTableByName`, `clearIndex`, `hasIndex`). The reference
  * subclasses SparkSession to attach these; on Spark 4 they live on a
  * facade keyed by the session (SURVEY.md §1.4, §7.2 hard-part #3).
  *
  * Spatial/vector/text verbs come from the implicit ops imports:
  * {{{
  *   import graft.operators.SpatialOps._
  *   Graft.install(spark)                  // optimizer rule + SQL functions
  *   val idx = Graft.indexTable(spark, df, "pts", Seq("x", "y"))
  *   df.range(Array("x","y"), Array(0,0), Array(10,10))
  * }}}
  */
object Graft {

  /** Install the index-substitution optimizer rule, `graft_*` SQL
    * functions, and the Point UDT (typed-Dataset surface) on a live
    * session. Idempotent. */
  def install(spark: SparkSession): Unit = {
    spatial.SpatialUDT.register()
    plans.GraftExtensions.install(spark)
  }

  def indexTable(spark: SparkSession, df: DataFrame, name: String,
                 keyCols: Seq[String]): IndexedTable =
    IndexManager.indexTable(spark, df, name, keyCols,
      GraftConf.indexPartitions(spark), GraftConf.indexBits(spark))

  def rangeIndexTable(spark: SparkSession, df: DataFrame, name: String,
                      keyCol: String): RangeIndexedTable =
    IndexManager.rangeIndexTable(spark, df, name, keyCol, GraftConf.indexPartitions(spark))

  def hashIndexTable(spark: SparkSession, df: DataFrame, name: String,
                     keyCol: String): HashIndexedTable =
    IndexManager.hashIndexTable(spark, df, name, keyCol, GraftConf.indexPartitions(spark))

  def quadTreeIndexTable(spark: SparkSession, df: DataFrame, name: String,
                         keyCols: Seq[String]): QuadTreeIndexedTable =
    IndexManager.quadTreeIndexTable(spark, df, name, keyCols,
      GraftConf.indexPartitions(spark), GraftConf.indexBits(spark))

  def showIndex(spark: SparkSession): Seq[String] = IndexManager.showIndexes(spark)
  def hasIndex(spark: SparkSession, name: String): Boolean = IndexManager.hasIndex(spark, name)
  def dropIndexTableByName(spark: SparkSession, name: String): Unit =
    IndexManager.dropIndex(spark, name)

  /** Table-scoped session DDL — the reference's `hasIndex(table, index)`,
    * `showIndex(table)`, `dropIndexTableByName(table, index)` (reference:
    * SimbaSession.scala:47-79), matched by `sameResult` on the table's
    * plan like its IndexManager. Covers all four index kinds (each
    * registers a plan substitution). */
  def hasIndex(spark: SparkSession, tableName: String, indexName: String): Boolean =
    IndexManager.indexesOfPlan(spark, spark.table(tableName)).contains(indexName)
  def showIndex(spark: SparkSession, tableName: String): Seq[String] =
    IndexManager.indexesOfPlan(spark, spark.table(tableName)).sorted
  def dropIndexTableByName(spark: SparkSession, tableName: String, indexName: String): Unit =
    if (hasIndex(spark, tableName, indexName)) IndexManager.dropIndex(spark, indexName)
  def clearIndex(spark: SparkSession): Unit = IndexManager.clearIndex(spark)
  def persistIndex(idx: IndexedTable, path: String): Unit = IndexManager.persistIndex(idx, path)
  def loadIndex(spark: SparkSession, name: String, path: String): IndexedTable =
    IndexManager.loadIndex(spark, name, path)
  def persistIndex(idx: RangeIndexedTable, path: String): Unit =
    IndexManager.persistRangeIndex(idx, path)
  def loadRangeIndex(spark: SparkSession, name: String, path: String): RangeIndexedTable =
    IndexManager.loadRangeIndex(spark, name, path)
  def persistIndex(idx: HashIndexedTable, path: String): Unit =
    IndexManager.persistHashIndex(idx, path)
  def loadHashIndex(spark: SparkSession, name: String, path: String): HashIndexedTable =
    IndexManager.loadHashIndex(spark, name, path)
  def persistIndex(idx: QuadTreeIndexedTable, path: String): Unit =
    IndexManager.persistQuadIndex(idx, path)
  def loadQuadIndex(spark: SparkSession, name: String, path: String): QuadTreeIndexedTable =
    IndexManager.loadQuadIndex(spark, name, path)

  /** Index cache storage level for subsequently built/loaded indexes —
    * the reference's `setStorageLevel` (reference: IndexManager.scala:179-187). */
  def setIndexStorageLevel(spark: SparkSession, level: String): Unit = {
    // validate eagerly so a typo fails here, not at the next index build
    org.apache.spark.storage.StorageLevel.fromString(level)
    spark.conf.set(GraftConf.IndexStorageLevel, level)
  }

  /** Index a registered table / temp view by NAME — the reference's
    * session-level `indexTable` (reference: SimbaSession.scala:51-65). */
  def indexTable(spark: SparkSession, tableName: String,
                 indexType: graft.index.IndexType, indexName: String,
                 column: Array[String]): Unit = {
    import graft.index.IndexOps._
    spark.table(tableName).index(indexType, indexName, column)
  }

  /** Persist the named index of whatever kind is registered under it —
    * the reference's session-level `persistIndex`
    * (reference: SimbaSession.scala:69-70). */
  def persistIndex(spark: SparkSession, indexName: String, fileName: String): Unit =
    IndexManager.persistIndexByName(spark, indexName, fileName)

  /** Load a persisted index of any kind, dispatching on its metadata —
    * the reference's session-level `loadIndex`
    * (reference: SimbaSession.scala:72-73; `loadIndex` here returns the
    * z-order table specifically, hence the distinct name). */
  def loadAnyIndex(spark: SparkSession, indexName: String, fileName: String): Unit =
    IndexManager.loadIndexAuto(spark, indexName, fileName)

  // ---- at-rest spatial layout (no session registry, no cache fill —
  // box/circle/kNN answered DIRECTLY from cell-partitioned z-sorted
  // parquet with directory + row-group pruning; graft.index.SpatialDisk)

  def writeSpatialLayout(df: DataFrame, path: String, keyCols: Seq[String],
                         cellBits: Int = 5, bits: Int = 18): Unit =
    SpatialDisk.write(df, path, keyCols, cellBits, bits)

  def diskBoxRange(spark: SparkSession, path: String,
                   lo: Array[Double], hi: Array[Double]): DataFrame =
    SpatialDisk.boxRange(spark, path, lo, hi)

  def diskCircleRange(spark: SparkSession, path: String,
                      center: Array[Double], radius: Double): DataFrame =
    SpatialDisk.circleRange(spark, path, center, radius)

  def diskKnn(spark: SparkSession, path: String, center: Array[Double],
              k: Int, tieBreak: Seq[String]): DataFrame =
    SpatialDisk.knn(spark, path, center, k, tieBreak)

  def appendSpatialLayout(df: DataFrame, path: String): Unit =
    SpatialDisk.append(df, path)

  def diskDistanceJoin(left: DataFrame, leftKeys: Seq[String], path: String,
                       radius: Double): DataFrame =
    SpatialDisk.distanceJoin(left, leftKeys, path, radius)

  def diskKnnJoin(left: DataFrame, leftKeys: Seq[String], path: String,
                  k: Int, leftId: String, tieBreak: Seq[String]): DataFrame =
    SpatialDisk.knnJoin(left, leftKeys, path, k, leftId, tieBreak)

  def compactSpatialLayout(spark: SparkSession, path: String): Unit =
    SpatialDisk.compact(path, spark)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY stage profiler for the d=4 pivot kNN join (b5hd) — times
  * each internal stage of the pivot route in isolation. Not part of the
  * driver contract; delete after the investigation.
  */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SpatialOps._

    val replicas = args.headOption.map(_.toInt).getOrElse(1)
    def pts4d(p: String): DataFrame = {
      val base = spark.read.parquet(s"$sfDir/customer.parquet")
      (0 until replicas).map { r =>
        base.select(
          (col("c_custkey") + lit(r * 4000000L)).as(s"${p}id"),
          (col("c_acctbal").cast("double") + lit(r * 60000.0)).as(s"${p}x"),
          (col("c_custkey") % 1000).cast("double").as(s"${p}y"),
          (col("c_custkey") % 773).cast("double").as(s"${p}z"),
          (col("c_custkey") % 337).cast("double").as(s"${p}w"))
      }.reduce(_ unionByName _)
    }

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm the JVM/codegen once
    val lW = pts4d("l"); val rW = pts4d("r")
    lW.count(); rW.count()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val l = pts4d("l"); val rt = pts4d("r")
      val lKeys = Seq("lx", "ly", "lz", "lw"); val rKeys = Seq("rx", "ry", "rz", "rw")
      val k = 3
      val (lPts, radii, theta, nRight) = t("sampleKnnRadii") {
        sampleKnnRadii(l, rt, lKeys, rKeys, k, 2000, 0.95, 2.0)
      }
      val pTarget = math.min(4096, math.max(32, math.ceil(math.sqrt(nRight.toDouble)).toInt))
      val rPool = t("rPool sample") {
        samplePoints(rt, rKeys, math.max(2000, 2 * pTarget)).toIndexedSeq
      }
      val pivots0 = t("farthestPointPivots") {
        farthestPointPivots[Array[Double]](rPool, graft.spatial.Dist.pointToPoint, pTarget)
      }
      val pivots = t("refinePivots") {
        refinePivots[Array[Double]](lPts.toIndexedSeq, radii, rPool,
          graft.spatial.Dist.pointToPoint, pivots0,
          maxPivots = pivots0.length + 32, 0.95, theta).toArray
      }
      println(s"[prof] pivots=${pivots.length} theta=$theta nRight=$nRight")
      val nearestPivot = (p: Array[Double]) =>
        pivots.indices.minBy(i => graft.spatial.Dist.pointToPoint(p, pivots(i))) + 1
      val cellThetas = t("perCellQuantile") {
        perCellQuantile(lPts.map(nearestPivot), radii, 0.95, theta)
      }

      def thetaOf(c: Int): Double = cellThetas.getOrElse(c, theta)
      val pivotsFlat = pivots.flatten
      def keyVec(keys: Seq[String]) =
        when(keys.map(col(_).isNotNull).reduce(_ && _),
          array(keys.map(col(_).cast("double")): _*))
      val lVec = keyVec(lKeys); val rVec = keyVec(rKeys)
      val np = pivots.length
      val thetaArr = lit((1 to np).map(thetaOf).toArray)
      val lAug = l
        .withColumn("__graft_asgn",
          graft.functions.pivotArgmin(lVec, pivotsFlat, 4, isFloat = false))
        .withColumn("__graft_cell", col("__graft_asgn.cell"))
        .filter(col("__graft_cell").isNotNull)
        .withColumn("__graft_dl", col("__graft_asgn.dist"))
        .withColumn("__graft_ctheta", element_at(thetaArr, col("__graft_cell")))
        .drop("__graft_asgn")
      val maxDl = t("maxDl collect") {
        lAug.groupBy(col("__graft_cell")).agg(max(col("__graft_dl")).as("__m"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      }
      val bands = Array.tabulate(np)(i =>
        maxDl.get(i + 1).map(_ + thetaOf(i + 1)).getOrElse(Double.NegativeInfinity))
      val admitted = rt.withColumn("__graft_rcell",
        explode(graft.functions.pivotAdmitted(rVec, pivotsFlat, bands, 4, isFloat = false)))
      val nAdm = t("admitted count")(admitted.count())
      // per-cell product distribution: where do the pairs come from?
      val lCnt = lAug.groupBy(col("__graft_cell")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val rCnt = admitted.groupBy(col("__graft_rcell")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val prods = lCnt.map { case (c, nl) => (c, nl * rCnt.getOrElse(c, 0L)) }
        .toSeq.sortBy(-_._2)
      println(s"[prof] total pair product=${prods.map(_._2).sum} " +
        s"top5 cells=${prods.take(5).map { case (c, p) =>
          s"c$c: ${lCnt(c)}l x ${rCnt.getOrElse(c, 0L)}r = $p" }.mkString("; ")}")
      val joined = lAug.join(admitted, col("__graft_cell") === col("__graft_rcell"))
      val nPre = t("pre-filter pair count")(joined.count())
      val exactDist = sqrt(lKeys.zip(rKeys).map { case (a, b) =>
        (col(a) - col(b)) * (col(a) - col(b)) }.reduce(_ + _))
      val cand = joined.withColumn("__graft_d", exactDist)
        .filter(col("__graft_d") <= col("__graft_ctheta"))
      val nCand = t("cand count")(cand.count())
      println(s"[prof] admitted=$nAdm preFilterPairs=$nPre candPairs=$nCand")
      val ckpt = t("cand localCheckpoint") {
        val c = cand.localCheckpoint(); c.count(); c
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("aidX")).orderBy(col("__graft_d"))
      t("window top-k over ckpt") {
        ckpt.withColumn("aidX", col("lid"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("lid"))
              .orderBy(col("__graft_d").asc, col("rid").asc)))
          .filter(col("__rn") <= k).count()
      }
      val full = t("full knnJoinPivot (public verb)") {
        new graft.operators.SpatialOps.DatasetSpatialOps(pts4d("a"))
          .knnJoinPivot(pts4d("b"), Seq("ax", "ay", "az", "aw"),
            Seq("bx", "by", "bz", "bw"), 3, "aid", Seq("bid")).count()
      }
      println(s"[prof] full result rows=$full")
    }
    spark.stop()
  }
}

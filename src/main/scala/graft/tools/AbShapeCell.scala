package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.SpatialOps._
import graft.spatial.ShapeCodec

/** In-process A/B of the shape joins' PBSM cell sizing
  * (`spark.graft.shape.cellCostModel` on vs off — r16 verdict #5):
  * alternates the two modes within one JVM, noop-sink timed. Entries
  * are the bench's b4p/b4x/b4sh/b5sh fixtures. Not part of the driver
  * contract; a measurement tool. */
object AbShapeCell {

  private def entries(spark: SparkSession, d: String): Seq[(String, () => DataFrame)] = Seq(
    "b4p_polygon_join" -> (() => {
      val polys = supplierPts(spark, d).select(col("s_suppkey"),
        struct(lit(ShapeCodec.TagPolygon).as("tag"),
          array(col("sx") - 150.0, col("sy"), col("sx"), col("sy") - 30.0,
            col("sx") + 150.0, col("sy"), col("sx"), col("sy") + 30.0)
            .as("coords")).as("poly"))
      polys.polygonDistanceJoin(customerPts(spark, d), "poly",
        Seq("cx", "cy"), 50.0)
    }),
    "b4x_intersects_join" -> (() => {
      val lb = supplierPts(spark, d).select(col("s_suppkey"),
        struct(lit(ShapeCodec.TagMBR).as("tag"),
          array(col("sx") - 500.0, col("sy") - 80.0,
            col("sx") + 500.0, col("sy") + 80.0).as("coords")).as("lbox"))
      val rb = customerPts(spark, d).select(col("c_custkey"),
        struct(lit(ShapeCodec.TagMBR).as("tag"),
          array(col("cx") - 50.0, col("cy") - 8.0,
            col("cx") + 50.0, col("cy") + 8.0).as("coords")).as("rbox"))
      lb.shapeIntersectsJoin(rb, "lbox", "rbox")
    }),
    "b4sh_shape_distance_join" -> (() => {
      val lb = supplierPts(spark, d).select(col("s_suppkey"),
        struct(lit(ShapeCodec.TagMBR).as("tag"),
          array(col("sx") - 100.0, col("sy") - 15.0,
            col("sx") + 100.0, col("sy") + 15.0).as("coords")).as("lbox"))
      val rp = customerPts(spark, d).select(col("c_custkey"),
        struct(lit(ShapeCodec.TagPoint).as("tag"),
          array(col("cx"), col("cy")).as("coords")).as("rpt"))
      lb.shapeDistanceJoin(rp, "lbox", "rpt", 50.0)
    }),
    "b5sh_shape_knn_join" -> (() => {
      val lb = supplierPts(spark, d).select(col("s_suppkey"),
        struct(lit(ShapeCodec.TagMBR).as("tag"),
          array(col("sx") - 100.0, col("sy") - 15.0,
            col("sx") + 100.0, col("sy") + 15.0).as("coords")).as("lbox"))
      val rp = customerPts(spark, d).select(col("c_custkey"),
        struct(lit(ShapeCodec.TagPoint).as("tag"),
          array(col("cx"), col("cy")).as("coords")).as("rpt"))
      lb.shapeKnnJoin(rp, "lbox", "rpt", 3, "s_suppkey", Seq("c_custkey"))
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val es = entries(spark, sfDir)
    // parity first: the two modes must emit identical pair sets
    es.foreach { case (nm, fn) =>
      def rows(mode: String): Long = {
        spark.conf.set(graft.GraftConf.ShapeCellCostModel, mode)
        try fn().count() finally spark.conf.unset(graft.GraftConf.ShapeCellCostModel)
      }
      val (on, off) = (rows("true"), rows("false"))
      require(on == off, s"$nm row count diverges: on=$on off=$off")
    }
    System.err.println("[ab-shape] parity OK (row counts)")
    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (nm, fn) <- es; mode <- Seq("true", "false")) {
      spark.conf.set(graft.GraftConf.ShapeCellCostModel, mode)
      val t0 = System.nanoTime()
      try fn().write.format("noop").mode("overwrite").save()
      finally spark.conf.unset(graft.GraftConf.ShapeCellCostModel)
      val t = (System.nanoTime() - t0) / 1e9
      times((nm, mode)) ::= t
      System.err.println(f"[ab-shape] rep$r $nm model=$mode $t%.2f s")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    es.foreach { case (nm, _) =>
      println(f"$nm model_on ${med(times((nm, "true")))}%.3f s  " +
        f"model_off ${med(times((nm, "false")))}%.3f s  " +
        times((nm, "true")).reverse.map(x => f"$x%.2f").mkString("on[", " ", "]") + " " +
        times((nm, "false")).reverse.map(x => f"$x%.2f").mkString("off[", " ", "]"))
    }
    spark.stop()
  }
}

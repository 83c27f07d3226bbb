package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.l2Distance

/** In-process A/B of the vector kNN naive-fallback hydrate (r16 verdict
  * #6): the shipped shape narrows pairs to (lId, rrow, dist) before the
  * window exchange and hydrates BOTH payloads back via two pinned
  * shuffle-hash joins; the proposed consolidation rides the LEFT payload
  * through the window (lId is unique), dropping one SHJ + its exchanges
  * at the price of the left embedding riding every candidate pair.
  * Alternated in one JVM, noop-sink timed. Not part of the driver
  * contract; a measurement tool. */
object AbVecNaive {
  private val k = 3

  private def shapeCurrent(l: DataFrame, rt: DataFrame): DataFrame = {
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      .orderBy(col("__graft_d").asc, col("vec_id2").asc)
    val lf = l.filter(col("embedding").isNotNull)
      .repartition(l.sparkSession.sparkContext.defaultParallelism)
    val rf = rt.filter(col("embedding2").isNotNull)
      .repartition(l.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__graft_rrow", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    val narrow = lf.select(col("vec_id"), col("embedding"))
      .crossJoin(rf.select(col("__graft_rrow"), col("embedding2"), col("vec_id2")))
      .withColumn("__graft_d", l2Distance(col("embedding"), col("embedding2")))
      .select(col("vec_id"), col("__graft_rrow"), col("__graft_d"), col("vec_id2"))
      .withColumn("__graft_rn", row_number().over(w0))
      .filter(col("__graft_rn") <= k)
      .select(col("vec_id"), col("__graft_rrow"), col("__graft_d"))
    narrow
      .join(lf.hint("shuffle_hash"), Seq("vec_id"))
      .join(rf.hint("shuffle_hash"), Seq("__graft_rrow"))
      .select(col("vec_id"), col("embedding"), col("vec_id2"),
        col("embedding2"), col("__graft_d").as("l2"))
  }

  private def shapeLeftRides(l: DataFrame, rt: DataFrame): DataFrame = {
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      .orderBy(col("__graft_d").asc, col("vec_id2").asc)
    val lf = l.filter(col("embedding").isNotNull)
      .repartition(l.sparkSession.sparkContext.defaultParallelism)
    val rf = rt.filter(col("embedding2").isNotNull)
      .repartition(l.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__graft_rrow", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    lf.crossJoin(rf.select(col("__graft_rrow"), col("embedding2"), col("vec_id2")))
      .withColumn("__graft_d", l2Distance(col("embedding"), col("embedding2")))
      .select(col("vec_id"), col("embedding"), col("__graft_rrow"),
        col("__graft_d"), col("vec_id2"))
      .withColumn("__graft_rn", row_number().over(w0))
      .filter(col("__graft_rn") <= k)
      .select(col("vec_id"), col("embedding"), col("__graft_rrow"), col("__graft_d"))
      .join(rf.hint("shuffle_hash"), Seq("__graft_rrow"))
      .select(col("vec_id"), col("embedding"), col("vec_id2"),
        col("embedding2"), col("__graft_d").as("l2"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def left = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    def right = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("vec_id2"), col("embedding").as("embedding2"))
    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "hydrate_both" -> (() => shapeCurrent(left, right)),
      "left_rides" -> (() => shapeLeftRides(left, right)))
    def key(df: DataFrame) = df.orderBy("vec_id", "vec_id2")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSeq
    require(key(shapes(0)._2()) == key(shapes(1)._2()), "shapes diverge")
    System.err.println("[ab-vn] parity OK")
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (nm, fn) <- shapes) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(nm) ::= t
      System.err.println(f"[ab-vn] rep$r $nm $t%.2f s")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    shapes.foreach { case (nm, _) =>
      println(f"$nm median ${med(times(nm))}%.3f s  all " +
        times(nm).reverse.map(x => f"$x%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}

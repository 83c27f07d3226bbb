package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.wordGrams

/** In-process A/B of boilerplateScore shapes (r16 verdict #1: prove or
  * revert the gram-exchange rework). Alternates the candidate shapes in
  * one JVM so JIT/cache/load hit all sides equally; noop-sink timed
  * (guide §1.4). Not part of the driver contract; a measurement tool.
  *
  * Shapes:
  *  - r15:    explode + global (bid, gram) distinct, distinct subtree
  *            shared via exchange reuse, separate df agg + left join
  *  - r16:    in-row array_distinct + explicit gram repartition + SHJ
  *            (the shipped shape — tokenizes twice on the final tree)
  *  - window: in-row array_distinct + ONE gram exchange, document
  *            frequency as count().over(gram window), membership by
  *            comparison — one tokenize pass, no join
  */
object AbBoilerplate {
  private val n = 8
  private val minDocs = 2L

  private def gramsDistinct(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("__graft_bid"),
      explode(array_distinct(wordGrams(col(textCol), n))).as("__graft_gram"))

  private def shapeR15(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = df.select(col(idCol).as("__graft_bid"),
      explode(wordGrams(col(textCol), n)).as("__graft_gram")).distinct()
    val frequent = grams.groupBy(col("__graft_gram"))
      .agg(count(lit(1)).as("__graft_df")).filter(col("__graft_df") >= minDocs)
    grams.join(frequent, Seq("__graft_gram"), "left")
      .groupBy(col("__graft_bid"))
      .agg(count(lit(1)).as("total_grams"),
        count(col("__graft_df")).as("boilerplate_grams"))
      .select(col("__graft_bid").as(idCol), col("total_grams"),
        col("boilerplate_grams"),
        (col("boilerplate_grams").cast("double") /
          col("total_grams").cast("double")).as("boilerplate_frac"))
  }

  private def shapeR16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = gramsDistinct(df, idCol, textCol).repartition(col("__graft_gram"))
    val frequent = grams.groupBy(col("__graft_gram"))
      .agg(count(lit(1)).as("__graft_df")).filter(col("__graft_df") >= minDocs)
    grams.join(frequent.hint("shuffle_hash"), Seq("__graft_gram"), "left")
      .groupBy(col("__graft_bid"))
      .agg(count(lit(1)).as("total_grams"),
        count(col("__graft_df")).as("boilerplate_grams"))
      .select(col("__graft_bid").as(idCol), col("total_grams"),
        col("boilerplate_grams"),
        (col("boilerplate_grams").cast("double") /
          col("total_grams").cast("double")).as("boilerplate_frac"))
  }

  private def shapeWindow(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__graft_gram"))
    gramsDistinct(df, idCol, textCol)
      .withColumn("__graft_df", count(lit(1)).over(w))
      .groupBy(col("__graft_bid"))
      .agg(count(lit(1)).as("total_grams"),
        count(when(col("__graft_df") >= minDocs, lit(1))).as("boilerplate_grams"))
      .select(col("__graft_bid").as(idCol), col("total_grams"),
        col("boilerplate_grams"),
        (col("boilerplate_grams").cast("double") /
          col("total_grams").cast("double")).as("boilerplate_frac"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "r15_distinct" -> (d => shapeR15(d, "doc_id", "text")),
      "r16_repart" -> (d => shapeR16(d, "doc_id", "text")),
      "window_df" -> (d => shapeWindow(d, "doc_id", "text")))
    // result parity first — a faster wrong shape is worthless
    def key(df: DataFrame) = df.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq
    val ref = key(shapes.head._2(docs))
    shapes.tail.foreach { case (nm, fn) =>
      require(key(fn(docs)) == ref, s"shape $nm diverges from r15")
    }
    System.err.println(s"[ab-bp] parity OK over ${ref.length} docs")
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (nm, fn) <- shapes) {
      val t0 = System.nanoTime()
      fn(docs).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(nm) ::= t
      System.err.println(f"[ab-bp] rep$r $nm $t%.2f s")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    shapes.foreach { case (nm, _) =>
      println(f"$nm median ${med(times(nm))}%.3f s  all " +
        times(nm).reverse.map(x => f"$x%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}

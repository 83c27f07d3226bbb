package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway local experiment runner (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qs = graft.queries.Pipeline.queries
    import org.apache.spark.sql.functions._
    import graft.Tables._
    import graft.functions.cosineSimilarity
    // exact global rank of every vector vs query vec 0
    val q = embeddings(spark, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val ranked = embeddings(spark, d)
      .withColumn("xcos", cosineSimilarity(col("embedding"), lit(q)))
      .withColumn("xrank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("xcos").desc, col("vec_id").asc)))
      .select(col("vec_id"), col("xrank"), col("xcos"))
    for (name <- Seq("ann_lsh_topk", "ann_ivf_topk", "ann_ivf_disk_topk")) {
      val res = qs(name)(spark, d).join(ranked, Seq("vec_id"))
        .select(col("vec_id"), col("xrank"), col("cos"), col("xcos"))
        .collect().sortBy(_.getInt(1))
      val maxRank = res.map(_.getInt(1)).max
      val cosExact = res.forall(r => r.getDouble(2) == r.getDouble(3))
      println(s"$name: maxExactRank=$maxRank cosAllExact=$cosExact ranks=${res.map(_.getInt(1)).mkString(",")}")
    }
    spark.stop()
  }
}

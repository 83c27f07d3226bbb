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
    import org.apache.spark.sql.functions._
    import graft.Tables._
    val docs = documents(spark, d)
    val mism = docs.filter(graft.functions.langId(col("text")) =!= col("lang"))
    println(s"langId mismatches: ${mism.count()} / ${docs.count()}")
    mism.select(col("doc_id"), col("lang"),
      graft.functions.langId(col("text")).as("guess")).show(10, false)
    // distinct langs present
    docs.groupBy(col("lang")).count().show()
    spark.stop()
  }
}

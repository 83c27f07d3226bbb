package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.DedupOps._

/** In-process A/B of the capped minHashPairs plan rewrite (r10): the
  * former shape re-evaluated the banded-signature pipeline four times
  * (count agg + semi-join + both self-join sides) and tokenized the
  * whole corpus twice for the verify; the landed shape aggregates
  * bucket membership once (collect_list bounded by the cap) and
  * restricts the verify to candidate docs. Alternates both plans in
  * one JVM so JIT/cache/ambient load hit them equally (the AbBench
  * discipline). Not part of the driver contract; a measurement tool.
  *
  * Usage: AbMinhash [sfDir] [reps]
  */
object AbMinhash {

  private def bandedOf(docs0: DataFrame): DataFrame = {
    val rows = 64 / 16
    val doc = docs0.select(col("doc_id"), col("text"))
      .withColumn("__sig", graft.functions.minhashSignature(col("text"), 3, 64, 42L))
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("__sig"), b * rows + 1, rows)).as("bucket"))
    }
    doc.select(col("doc_id"), explode(array(bandStructs: _*)).as("__b"))
      .select(col("doc_id"),
        col("__b.band").as("__band"), col("__b.bucket").as("__bucket"))
  }

  /** The pre-r10 plan, kept verbatim for measurement only. */
  private def oldPlan(s: SparkSession, d: String): DataFrame = {
    val docs0 = documents(s, d)
    val banded = bandedOf(docs0)
    val maxBucket = 1000
    val kept = banded.join(
      banded.groupBy(col("__band"), col("__bucket"))
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= maxBucket)
        .select(col("__band"), col("__bucket")),
      Seq("__band", "__bucket"), "left_semi")
    val l = kept.select(col("doc_id").as("id1"), col("__band"), col("__bucket"))
    val r = kept.select(col("doc_id").as("id2"), col("__band"), col("__bucket"))
    val pairs = l.join(r, Seq("__band", "__bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    val t1 = docs0.select(col("doc_id").as("id1"),
      graft.functions.shingleSet(col("text"), 3).as("__sh1"))
    val t2 = docs0.select(col("doc_id").as("id2"),
      graft.functions.shingleSet(col("text"), 3).as("__sh2"))
    pairs.join(t1, Seq("id1")).join(t2, Seq("id2"))
      .withColumn("jaccard",
        graft.functions.sortedJaccard(col("__sh1"), col("__sh2")))
      .filter(col("jaccard") >= 0.8)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  private def newPlan(s: SparkSession, d: String): DataFrame =
    documents(s, d).minHashPairs("doc_id", "text", 3, 64, 16, 0.8,
      maxBucket = 1000)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ab-minhash")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup both
      oldPlan(spark, sfDir).count(); newPlan(spark, sfDir).count()
      val times = collection.mutable.Map("old" -> List.empty[Double],
        "new" -> List.empty[Double])
      for (_ <- 1 to reps; (tag, fn) <- Seq(
          "old" -> (oldPlan _), "new" -> (newPlan _))) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(tag) = times(tag) :+ dt
        println(f"$tag: $dt%.3f s ($n rows)")
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"median old=${med(times("old"))}%.3f new=${med(times("new"))}%.3f")
    } finally spark.stop()
  }
}

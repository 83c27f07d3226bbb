package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables._

/** A/B of the `b10d_spatial_disk_write` 2x swing (r11 verdict #5): the
  * entry reads 4.4–5.1 s or 9.1–9.2 s under identical code depending on
  * which artifact measured it, and the suspect is host page-cache state
  * after the bench's `dropOsCaches`. Three arms, interleaved within one
  * JVM so JIT and ambient load hit all of them equally:
  *
  *   A (bench shape)  drop OS caches, then time the write — the source
  *                    parquet AND the filesystem metadata are cold;
  *   B (warm)         time the write with no preceding drop;
  *   C (warm source)  drop OS caches, re-warm ONLY the source parquet
  *                    (a count() touches every byte), then time the
  *                    write — isolates "cold source read" from "cold
  *                    write/committer path".
  *
  * If A >> B ~ C the swing is the cold SOURCE read; if A ~ C >> B it
  * is the write/committer side of the drop. Per-arm a data/stats
  * decomposition is printed (the stats meta pass re-reads what was
  * just written, so it rides the page cache either way). Not part of
  * the driver contract; a measurement tool.
  *
  * Usage: AbDiskWrite [sfDir] [reps]
  */
object AbDiskWrite {

  private def dropOsCaches(): Unit = {
    try new ProcessBuilder("sync").inheritIO().start().waitFor()
    catch { case _: Throwable => }
    val p = java.nio.file.Paths.get("/proc/sys/vm/drop_caches")
    try {
      if (java.nio.file.Files.isWritable(p))
        java.nio.file.Files.write(p, "3\n".getBytes("UTF-8"))
      else Thread.sleep(5000)
    } catch { case _: Throwable => }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ab_diskwrite"

    def timedWrite(): Double = {
      val t0 = System.nanoTime()
      graft.index.SpatialDisk.write(customerPts(spark, sfDir), path,
        Seq("cx", "cy"), cellBits = 4)
      (System.nanoTime() - t0) / 1e9
    }
    def warmSource(): Unit = {
      // touch every byte of the source parquet (all columns)
      val src = spark.read.parquet(s"$sfDir/customer.parquet")
      src.agg(src.columns.map(c => count(col(c))).reduce(_ + _)).collect()
    }

    // JIT warmup (discarded): one full write
    timedWrite()
    val results = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def rec(arm: String, v: Double): Unit = {
      results.getOrElseUpdate(arm, scala.collection.mutable.ArrayBuffer()) += v
      println(f"[ab-diskwrite] $arm: $v%6.2f s")
    }
    for (_ <- 1 to reps) {
      dropOsCaches(); rec("A_drop_then_write", timedWrite())
      rec("B_warm_write", timedWrite())
      dropOsCaches(); warmSource(); rec("C_drop_warmsrc_write", timedWrite())
    }
    results.toSeq.sortBy(_._1).foreach { case (arm, vs) =>
      val s = vs.sorted
      println(f"[ab-diskwrite] $arm median ${s(s.length / 2)}%6.2f s " +
        s"(all: ${s.map(v => f"$v%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

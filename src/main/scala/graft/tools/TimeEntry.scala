package graft.tools

import org.apache.spark.sql.SparkSession

/** Time ONE bench entry in isolation, repeated — the band-forensics
  * tool for "did the entry regress or did the sweep read warm?": a
  * reading that sits in-band standalone but high mid-sweep is sweep
  * position / host state, not code. Prints every rep (first = cold,
  * rest = steady) and the steady median. Not part of the driver
  * contract; a measurement tool.
  *
  * Usage: TimeEntry <entryName> [reps] (sf dir via SPARK_GRAFT_SF_DIR)
  */
object TimeEntry {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeEntry <entryName> [reps]")
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.Bench.entryFor(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[time_entry] $name rep $i: $t%6.2f s")
      t
    }
    val steady = times.drop(1).sorted
    if (steady.nonEmpty)
      println(f"[time_entry] $name cold ${times.head}%.2f s, " +
        f"steady median ${steady(steady.length / 2)}%.2f s over ${steady.length} reps")
    spark.stop()
  }
}

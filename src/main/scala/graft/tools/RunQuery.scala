package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run one named query from [[graft.SparkEntry.queries]] and print its
  * rows — the single-query slice of what the driver's Verify does, for
  * iterating on a new entry without the full 80-query sweep. Not part
  * of the driver contract; a development tool.
  *
  * Usage: RunQuery <name> [sfDir] [explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName(s"graft-run-$name")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (args.length > 2 && args(2) == "explain") df.explain("formatted")
      df.show(50, truncate = false)
      println(s"rows=${df.count()}")
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided parquet tables (TESTDATA.md) and the
  * deterministic spatial projections of them (FIXTURES.md "Spatial
  * projections"): the star schema has no native coordinates, so tests and
  * queries derive 2-D points from stable numeric columns.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.parquet`'s `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 only reads as a raw
    * long under nanosAsLong), plain TIMESTAMP(MICROS) without the UTC
    * flag (read as TIMESTAMP_NTZ), or an adjusted-to-UTC timestamp.
    * Normalize all three to session-zone TimestampType so every
    * downstream query sees one shape. The long path divides integrally
    * (a double division would lose precision above 2^53 ns); the NTZ
    * cast is value-preserving because every session here pins
    * spark.sql.session.timeZone=UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** See [[events]] — shared with the streaming readers, which must apply
    * the same normalization on top of the batch schema. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** customer as 2-D points: cx = c_acctbal, cy = c_custkey % 1000. */
  def customerPts(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      col("c_acctbal").as("cx"),
      (col("c_custkey") % 1000).cast("double").as("cy"))

  /** supplier as 2-D points: sx = s_acctbal, sy = s_suppkey % 1000. */
  def supplierPts(s: SparkSession, d: String): DataFrame =
    supplier(s, d).select(
      col("s_suppkey"),
      col("s_acctbal").as("sx"),
      (col("s_suppkey") % 1000).cast("double").as("sy"))

  /** events as 2-D points with time retained. */
  def eventsPts(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"), col("ts"),
      col("value").as("ex"),
      (col("user_id") % 1000).cast("double").as("ey"))

  /** Order-independent exact double aggregation: cast each value to an
    * exact decimal, sum exactly, cast the total back to double. Both our
    * plans and the DuckDB oracle use this same shape, so hashes match
    * regardless of partitioning / accumulation order — a plain SUM(double)
    * is order-dependent in its last bits and would flake at scale. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Deterministic double average built on [[dsum]]. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator computing the 2-D bounding box (MBR) of a group of
  * points — the library's UDAF extension-surface demonstration
  * (SURVEY.md §2.5: "aggregates as Aggregator[IN,BUF,OUT] where
  * needed"). Registered for SQL/DataFrame use via
  * `spark.udf.register("graft_bounds", udaf(BoundsAggregator))`.
  *
  * Merge is associative/commutative (min/max per dimension), so Spark
  * runs it with map-side partial aggregation — one 4-double buffer per
  * group per mapper crosses the shuffle.
  */
final case class Pt(x: Double, y: Double)
final case class Box(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

object BoundsAggregator extends Aggregator[Pt, Box, Box] {

  override def zero: Box =
    Box(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)

  override def reduce(b: Box, p: Pt): Box =
    Box(math.min(b.xmin, p.x), math.min(b.ymin, p.y),
      math.max(b.xmax, p.x), math.max(b.ymax, p.y))

  override def merge(a: Box, b: Box): Box =
    Box(math.min(a.xmin, b.xmin), math.min(a.ymin, b.ymin),
      math.max(a.xmax, b.xmax), math.max(a.ymax, b.ymax))

  override def finish(b: Box): Box = b

  override def bufferEncoder: Encoder[Box] = Encoders.product[Box]
  override def outputEncoder: Encoder[Box] = Encoders.product[Box]
}

package graft.spatial

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** UDT storing [[Point]] as `array<double>` — the typed-Dataset surface
  * of the reference (reference: spatial/Point.scala:28 is annotated
  * `@SQLUserDefinedType`; examples/SpatialClassInference.scala:29-40
  * builds a `Dataset[PointData]` straight from case classes and queries
  * it). Registration goes through `UDTRegistration` (the class-name
  * based registry, so `Point` itself carries no Spark annotation), done
  * idempotently by [[SpatialUDT.register]] — `Graft.install` calls it,
  * and so do the point-column verbs, so either entry point suffices
  * before the first Encoder is derived.
  *
  * The physical value is exactly the coordinate array, so the
  * point-column query verbs read coordinates through `UnwrapUDT` +
  * `element_at` with no per-row deserialization to [[Point]] objects. */
class PointUDT extends UserDefinedType[Point] {
  override def sqlType: DataType = ArrayType(DoubleType, containsNull = false)
  override def serialize(p: Point): Any = new GenericArrayData(p.coord)
  override def deserialize(datum: Any): Point = datum match {
    case a: ArrayData => Point(a.toDoubleArray)
    case other => throw new IllegalArgumentException(
      s"cannot deserialize ${other.getClass} into a Point")
  }
  override def userClass: Class[Point] = classOf[Point]
  override def typeName: String = "point"
}

object SpatialUDT {
  /** Register the Point UDT for case-class Encoder derivation.
    * Idempotent; must run before the first `Dataset[T]` with a Point
    * field is created in the JVM. */
  def register(): Unit = synchronized {
    val cls = classOf[Point].getName
    if (!UDTRegistration.exists(cls))
      UDTRegistration.register(cls, classOf[PointUDT].getName)
  }
}
